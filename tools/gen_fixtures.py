#!/usr/bin/env python
"""Regenerate the reference-equivalent data fixtures under data/.

The reference bundles ``data/ri_tsdf.npy`` (a saved TSDF map) and validates
on a RealSense D435 rosbag; both blobs are stripped from this mirror
(/root/reference/.MISSING_LARGE_BLOBS). This writes deterministic
equivalents (gitignored, regenerated on demand):

  data/d435_synth_seq.npz   D435-like recorded depth sequence
                            (depth u16 (N,480,640), Rs, Ts, K)
  data/ri_tsdf_equiv.npy    saved global TSDF map in the reference's
                            export_submap()/saveMap() dict schema
                            (dense_tsdf.py:456-498), built from the sequence

Usage: python tools/gen_fixtures.py [--frames 40] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")
MAP_PATH = os.path.join(DATA_DIR, "ri_tsdf_equiv.npy")


def seq_path(n_frames):
    return os.path.join(DATA_DIR, f"d435_synth_seq_{n_frames}.npz")


def ensure_sequence(n_frames=40):
    from taichislam_tpu.utils.synthetic_scene import orbit_sequence
    path = seq_path(n_frames)
    if os.path.exists(path):
        return path
    os.makedirs(DATA_DIR, exist_ok=True)
    print(f"[fixtures] rendering {n_frames}-frame D435-like sequence ...")
    depth, Rs, Ts, K = orbit_sequence(n_frames=n_frames)
    np.savez_compressed(path, depth=depth, Rs=Rs, Ts=Ts, K=K)
    print(f"[fixtures] wrote {path} "
          f"({os.path.getsize(path)/1e6:.1f} MB)")
    return path


def ensure_map(n_frames=40):
    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    if os.path.exists(MAP_PATH):
        return MAP_PATH
    with np.load(ensure_sequence(n_frames)) as z:
        depth, Rs, Ts, K = z["depth"], z["Rs"], z["Ts"], z["K"]
    print("[fixtures] fusing the sequence into a global TSDF map ...")
    m = DenseTSDF(map_scale=[10.0, 10.0], voxel_scale=0.05,
                  num_voxel_per_blk_axis=16, max_ray_length=5.1,
                  min_ray_length=0.3, max_blocks=4096, max_bins=32768,
                  max_submap_num=1, is_global_map=True)
    m.set_dep_camera_intrinsic(K)
    for t in range(len(depth)):
        m.recast_depth_to_map(Rs[t], Ts[t], depth[t], None)
    m.saveMap(MAP_PATH)
    print(f"[fixtures] wrote {MAP_PATH} "
          f"({os.path.getsize(MAP_PATH)/1e6:.1f} MB, "
          f"{m.count_active()} voxels)")
    return MAP_PATH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    ensure_sequence(args.frames)
    ensure_map(args.frames)


if __name__ == "__main__":
    main()
