"""Device-mesh helpers for multi-chip SPMD mapping.

The reference's only distribution axis is multi-drone map exchange over UDP
(SURVEY.md §2.10/§2.13). On a TPU pod the natural equivalents are:

- a ``drone`` (data-parallel) mesh axis: each device integrates one drone's
  sensor stream into its own submap collection, and the global map is the
  psum of per-drone fusion contributions over ICI (replacing zlib/UDP with
  collectives when the fleet is simulated on one pod);
- a ``block`` axis for sharding a single map's block-slot dimension when a
  map exceeds one chip's HBM.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int = None, axis: str = "drone") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert len(devs) >= n_devices, (len(devs), n_devices)
    return Mesh(np.asarray(devs[:n_devices]), (axis,))
