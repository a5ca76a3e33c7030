#!/usr/bin/env python
"""Isolate the lax.scan state-carry cost on the relay.

Times three 50-frame scans at the bench config:
  a) trivial body (touch one channel) with the full state carried
  b) full integrate_depth with the state carried (the bench body)
  c) full integrate_depth with state carried, donated input
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for

    cfg = TSDFConfig(map_scale=(10., 10.), voxel_scale=0.05,
                     num_voxel_per_blk_axis=16, max_ray_length=3.0,
                     min_ray_length=0.3, recast_step=2, max_blocks=256,
                     max_bins=32768, max_submap_num=64)
    h, w = 480, 640
    K = jnp.asarray([384., 0, 320., 0, 384., 240., 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n_frames = 50
    frames = np.empty((n_frames, h, w), np.uint16)
    Rs = np.empty((n_frames, 3, 3), np.float32)
    Ts = np.empty((n_frames, 3), np.float32)
    for t in range(n_frames):
        base = 1500 + 40.0 * np.sin(0.3 * t)
        depth = base + 0.6 * ii + 0.3 * jj + rng.normal(0, 5, (h, w))
        frames[t] = np.clip(depth, 400, 2900).astype(np.uint16)
        th = 0.02 * t
        Rs[t] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float32)
        Ts[t] = [0.05 * t, 0.0, 0.0]
    frames_j = jnp.asarray(frames)
    Rs_j, Ts_j = jnp.asarray(Rs), jnp.asarray(Ts)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)

    state = tsdf_ops.make_tsdf_state(cfg)
    _, stats = tsdf_ops.integrate_depth(cfg, state, frames_j[0], texture,
                                        Rs_j[0], Ts_j[0], K, K, jnp.int32(0))
    cfg = dataclasses.replace(cfg, max_bins=bin_bucket_for(
        int(stats["num_bins"])))
    state = tsdf_ops.make_tsdf_state(cfg)

    # RPC latency baseline
    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lat = min(
        (lambda t0: (float(tiny(tv)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(5))
    print(f"rpc latency: {lat*1000:.2f} ms")

    def run(scan_fn, donate=False):
        jitted = jax.jit(scan_fn, donate_argnums=(0,) if donate else ())
        s0 = jitted(state, frames_j, Rs_j, Ts_j)
        float(s0[1] if isinstance(s0, tuple) else s0)
        best = float("inf")
        for _ in range(3):
            st = state
            t0 = time.perf_counter()
            out = jitted(st, frames_j, Rs_j, Ts_j)
            float(out[1] if isinstance(out, tuple) else out)
            best = min(best, time.perf_counter() - t0)
        return (best - lat) / n_frames * 1000

    def trivial(state, frames, Rs, Ts):
        def body(st, inputs):
            depth, R, T = inputs
            ch = dict(st.channels)
            ch["TSDF"] = ch["TSDF"] + jnp.float16(
                jnp.sum(depth.astype(jnp.float32)) * 0.0)
            return st._replace(channels=ch), None
        st, _ = jax.lax.scan(body, state, (frames, Rs, Ts))
        return st, jnp.sum(st.channels["TSDF"].astype(jnp.float32))

    def full(state, frames, Rs, Ts):
        def body(st, inputs):
            depth, R, T = inputs
            st, _ = tsdf_ops.integrate_depth(cfg, st, depth, texture, R, T,
                                             K, K, jnp.int32(0))
            return st, None
        st, _ = jax.lax.scan(body, state, (frames, Rs, Ts))
        return st, jnp.sum(st.channels["TSDF"].astype(jnp.float32))

    print(f"trivial carry: {run(trivial):7.2f} ms/frame", flush=True)
    print(f"full bench:    {run(full):7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
