#!/usr/bin/env python
"""SDF fidelity check: TPU framework vs the reference fusion math.

Replays a synthetic depth sequence through (a) this framework's jitted
integrate and (b) an independent numpy implementation of the reference's
sequential voxblox update (tests/reference_math.py re-derives
/root/reference/taichi_slam/mapping/dense_tsdf.py:188-270 step by step),
then reports SDF agreement statistics — the BASELINE.json "SDF values
comparable to the reference" requirement.

Usage: python tools/compare_vs_reference.py [--frames 3] [--cpu]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    from reference_math import RefTSDF
    from test_tsdf import mask_boundary_pixels

    K = np.array([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], np.float32)
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_ray_length=2.0,
                  min_ray_length=0.3, max_blocks=512, max_bins=8192,
                  max_disp_particles=65536, max_submap_num=8)
    m.set_dep_camera_intrinsic(K)
    ref = RefTSDF(voxel=0.1, max_ray=2.0, min_ray=0.3, internal=10,
                  recast_step=2)

    jj, ii = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    R = np.eye(3, dtype=np.float32)
    for t in range(args.frames):
        depth = (1000 + 15 * t + 4.0 * ii + 2.0 * jj).astype(np.uint16)
        depth = mask_boundary_pixels(depth, K, R)
        T = np.array([0.053 * t, -0.017, 0.111], np.float32)
        m.recast_depth_to_map(R, T, depth, None)
        ref.integrate_depth(depth, K, R, T)

    idx, tsdf, w, occ, col = m.to_numpy()
    D = {tuple(int(x) for x in i): float(v) for i, v in zip(idx, tsdf)}
    refD = {tuple(int(x) for x in k): float(v) for k, v in ref.D.items()}
    common = set(D) & set(refD)
    sym = set(D) ^ set(refD)
    errs = np.array([abs(D[k] - refD[k]) for k in common])
    print(f"frames:            {args.frames}")
    print(f"observed voxels:   ours {len(D)}, reference {len(refD)}, "
          f"symmetric diff {len(sym)} "
          f"({100.0 * len(sym) / max(len(refD), 1):.2f}%)")
    print(f"SDF abs error on common voxels: max {errs.max():.2e}  "
          f"mean {errs.mean():.2e}  p99 {np.percentile(errs, 99):.2e}")
    # mean/p99 must be fp-tight; the max tolerates the known ±1-voxel
    # ray-tail rounding flips (a single update's worth on a boundary voxel)
    ok = (errs.mean() < 1e-4 and np.percentile(errs, 99) < 1e-3 and
          errs.max() < 0.05 * 0.1 and len(sym) <= 0.01 * len(refD))
    print("FIDELITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
