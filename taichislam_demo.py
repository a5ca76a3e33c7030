#!/usr/bin/env python
"""Offline demo CLI (the reference's TaichiSLAM_demo.py, repaired).

Replays a rosbag (when rosbag + a bag file are available) or falls back to a
random occupancy fill (``random_init_octo``, the reference's data-free smoke
path, TaichiSLAM_demo.py:160-163) and renders the result headless.

The reference demo is bit-rotted — it reads ``args.voxel_scale`` while
argparse defines ``--voxel-size``, and calls ``recast_pcl_to_map`` with a
stale signature (SURVEY.md §7 "known bugs"); this version matches the
current model APIs.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="TaichiSLAM offline demo")
    ap.add_argument("-b", "--bag", type=str, default="",
                    help="path of rosbag to replay")
    ap.add_argument("-m", "--method", type=str, default="octo",
                    choices=["octo", "tsdf", "esdf"])
    ap.add_argument("-r", "--resolution", nargs=2, type=int,
                    default=[640, 480])
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--map-size", nargs=2, type=float, default=[100.0, 10.0])
    ap.add_argument("--blk", type=int, default=16,
                    help="num voxels per block per axis")
    ap.add_argument("--texture-enabled", action="store_true")
    ap.add_argument("--viewer", action="store_true",
                    help="serve the interactive WebGL viewer "
                         "(orbit/pan/zoom + options panel) on --viewer-port")
    ap.add_argument("--viewer-port", type=int, default=8765)
    ap.add_argument("--record", action="store_true",
                    help="save rendered frames as PNGs to ./frames/")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    from taichislam_tpu.models.dense_esdf import DenseESDF
    from taichislam_tpu.models.octomap import Octomap
    from taichislam_tpu.utils.visualization import TaichiSLAMRender
    from taichislam_tpu.utils.ros_pcl_transfer import (
        iteration_over_bag, pointcloud2_to_xyz_rgb_array, pose_msg_to_numpy)

    if args.method == "octo":
        mapping = Octomap(map_scale=args.map_size,
                          voxel_scale=args.voxel_size,
                          texture_enabled=args.texture_enabled)
    elif args.method == "tsdf":
        mapping = DenseTSDF(map_scale=args.map_size,
                            voxel_scale=args.voxel_size,
                            num_voxel_per_blk_axis=args.blk,
                            texture_enabled=args.texture_enabled)
    else:
        mapping = DenseESDF(map_scale=args.map_size,
                            voxel_scale=args.voxel_size,
                            num_voxel_per_blk_axis=args.blk,
                            texture_enabled=args.texture_enabled)

    save_path = None
    if args.record:
        import os
        os.makedirs("frames", exist_ok=True)
        save_path = "frames"
    if args.viewer:
        from taichislam_tpu.utils.viewer_server import InteractiveRender
        render = InteractiveRender(port=args.viewer_port)
    else:
        render = TaichiSLAMRender(1280, 720, save_path=save_path)

    if args.bag:
        def cb(pose_msg, cloud_msg):
            R, T = pose_msg_to_numpy(pose_msg.pose)
            xyz, rgb = pointcloud2_to_xyz_rgb_array(cloud_msg)
            if isinstance(mapping, Octomap):
                mapping.recast_pcl_to_map(R, T, xyz, rgb, len(xyz))
            else:
                mapping.recast_pcl_to_map(R, T, xyz, rgb)
        iteration_over_bag(args.bag, cb)
    else:
        print("No bag path is provided — running the random smoke fill")
        if isinstance(mapping, Octomap):
            mapping.random_init_octo(1000)
        else:
            mapping.init_sphere()

    if isinstance(mapping, Octomap):
        xyz, color = mapping.get_occupy_voxels(0)
        n = mapping.num_export_particles
    else:
        xyz, _, color = mapping.get_voxels_TSDF_surface()
        n = mapping.num_TSDF_particles
    print(f"map voxels exported: {n}")
    render.set_particles(xyz[:n], color[:n] if color is not None else None)
    render.rendering()
    print("demo done")


if __name__ == "__main__":
    main()
