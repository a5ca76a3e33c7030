"""Jet colormap lookup table.

The reference builds a 1024-entry jet LUT from matplotlib at init
(/root/reference/taichi_slam/mapping/mapping_common.py:158-163) and indexes it
with a clamped normalized value (mapping_common.py:216-219). We precompute the
same LUT once (matplotlib is available in this image) and expose a vectorized
jnp lookup.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def jet_lut_np(n: int = 1024) -> np.ndarray:
    from matplotlib import cm

    lut = np.zeros((n, 3), np.float32)
    for i in range(n):
        lut[i] = cm.jet(i / float(n))[:3]
    return lut


def jet_lut(n: int = 1024):
    # NOTE: deliberately NOT cached as a jnp array — the first call may occur
    # inside a jit trace, and caching a tracer would leak it. jnp.asarray of
    # the cached numpy LUT constant-folds under jit.
    return jnp.asarray(jet_lut_np(n))


def color_from_colormap(z, min_z, max_z, lut=None):
    """Vectorized equivalent of BaseMap.color_from_colomap
    (mapping_common.py:216-219): clamp((z-min)/(max-min)*1023, 0, 1023) -> LUT.
    """
    if lut is None:
        lut = jet_lut()
    n = lut.shape[0]
    c = jnp.clip(((z - min_z) / (max_z - min_z)) * (n - 1), 0, n - 1).astype(jnp.int32)
    return jnp.take(lut, c, axis=0)
