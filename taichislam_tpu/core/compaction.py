"""Prefix-sum stream compaction.

The reference compacts variable-length outputs (surface voxels, mesh
triangles, export particles) with ``ti.atomic_add`` on a counter
(e.g. /root/reference/taichi_slam/mapping/dense_tsdf.py:358), which yields a
nondeterministic output order. Here compaction is an exclusive cumsum over a
boolean mask followed by a masked scatter: deterministic (linear-index
order), parallel, and jittable with static output capacity.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_mask(mask, capacity: int):
    """Return (positions, count) for compacting ``mask`` into ``capacity`` slots.

    ``positions[i]`` is the output index for element i when ``mask[i]`` and the
    element fits in ``capacity``; otherwise ``capacity`` (usable as a dropped
    scatter target with an extra garbage slot, or with mode="drop").
    """
    mask = mask.reshape(-1)
    idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.where(mask.size > 0, idx[-1] + 1, 0)
    pos = jnp.where(mask & (idx < capacity), idx, capacity)
    return pos, jnp.minimum(count, capacity), count


def compact_sort(mask, capacity: int, operands, fills):
    """Sort-based stream compaction of parallel ``operands``.

    XLA lowers masked-scatter compaction to ~10 ns per *input* lane per
    array — ruinous when compacting a few thousand survivors out of
    hundreds of thousands of lanes across several arrays. A single stable
    multi-operand ``lax.sort`` on the mask key moves all survivors to the
    front in one pass (~1-2 ms at 512k lanes on v5e, near-independent of
    operand count), preserving linear-index order like the scatter form.

    Returns ([out (capacity,) per operand], kept, total); padding and
    overflow lanes hold the per-operand ``fills`` value.
    """
    import jax

    n = mask.shape[0]
    key = jnp.where(mask, 0, 1).astype(jnp.int32)
    sorted_ = jax.lax.sort((key,) + tuple(operands), num_keys=1,
                           is_stable=True)
    total = jnp.sum(mask.astype(jnp.int32))
    kept = jnp.minimum(total, capacity)
    live = jnp.arange(capacity) < kept
    outs = []
    for arr, fill in zip(sorted_[1:], fills):
        if n >= capacity:
            o = arr[:capacity]
        else:
            o = jnp.concatenate(
                [arr, jnp.full((capacity - n,), fill, arr.dtype)])
        outs.append(jnp.where(live, o, jnp.asarray(fill, o.dtype)))
    return outs, kept, total


def compact(values, mask, capacity: int, fill_value=0):
    """Compact ``values`` (leading dim = mask size) where ``mask`` holds.

    Returns (out[capacity, ...], kept_count, total_count). total_count may
    exceed capacity (overflow detection, like the reference's
    ``max_disp_particles`` cap at dense_tsdf.py:359).
    """
    pos, kept, total = compact_mask(mask, capacity)
    out_shape = (capacity,) + values.shape[1:]
    out = jnp.full(out_shape, fill_value, dtype=values.dtype)
    out = out.at[pos].set(values, mode="drop")
    return out, kept, total
