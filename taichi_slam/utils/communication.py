"""taichi_slam.utils.communication — reference-compatible import path
(cf. /root/reference/taichi_slam/utils/communication.py)."""
from taichislam_tpu.utils.comm import (  # noqa: F401
    CHANNEL_SUBMAP,
    CHANNEL_TRAJ,
    TIMEOUT_MS,
    SLAMComm,
)
