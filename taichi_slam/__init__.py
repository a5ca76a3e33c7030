"""Drop-in compatibility shim: ``import taichi_slam`` -> taichislam_tpu.

Lets code written against the reference package (xuhao1/TaichiSLAM's
``taichi_slam``) run on the TPU-native framework unchanged, e.g.::

    from taichi_slam.mapping import DenseTSDF, Octomap, SubmapMapping
    from taichi_slam.utils.communication import SLAMComm
"""

from taichi_slam import mapping, utils  # noqa: F401
