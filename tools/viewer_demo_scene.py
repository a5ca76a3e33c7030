#!/usr/bin/env python
"""Serve a deterministic demo scene through the interactive viewer —
used to drive the WebGL page in a real browser (particles ring + sphere
mesh + drone triad + trajectory + one skeleton edge).

Run: python tools/viewer_demo_scene.py [--port 8765] [--seconds 600]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--seconds", type=float, default=600)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.models.mesher import MarchingCubeMesher
    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    from taichislam_tpu.utils.viewer_server import InteractiveRender

    # sphere-fixture mesh through the real mesher
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=256,
                  max_disp_particles=65536, max_submap_num=4)
    m.init_sphere()
    mesher = MarchingCubeMesher(m, max_triangles=1 << 15)
    mesher.generate_mesh(1)

    # particle ring around the sphere, jet-colored by angle
    th = np.linspace(0, 2 * np.pi, 4096, endpoint=False)
    par = np.stack([1.5 * np.cos(th), 1.5 * np.sin(th),
                    0.3 * np.sin(3 * th)], -1).astype(np.float32)
    col = np.stack([0.5 + 0.5 * np.cos(th), 0.5 + 0.5 * np.sin(th),
                    np.linspace(0, 1, len(th))], -1).astype(np.float32)

    r = InteractiveRender(port=args.port)
    r.set_particles(par, col)
    r.set_mesh(mesher.mesh_vertices[:mesher.num_facelets * 3],
               mesher.mesh_colors[:mesher.num_facelets * 3],
               mesher.mesh_normals[:mesher.num_facelets * 3])
    r.set_drone_pose(0, np.eye(3, dtype=np.float32),
                     np.array([0, -2.0, 0.5], np.float32))
    traj = np.stack([np.linspace(-2, 0, 50),
                     np.full(50, -2.0), np.full(50, 0.5)], -1)
    r.set_drone_trajectory(0, traj.astype(np.float32))
    r.skeleton_edges[0] = np.array([[0, 0, 1.5], [1.5, 0, 0]], np.float32)
    r.rendering()
    print(f"[viewer-demo] serving {r.server.url} "
          f"(mesh tris {mesher.num_facelets}, particles {len(par)})",
          flush=True)
    time.sleep(args.seconds)


if __name__ == "__main__":
    main()
