#!/usr/bin/env python3
"""ROS node: the production application layer.

Rebuild of /root/reference/scripts/taichislam_node.py with the same topic
names (``~depth``, ``~image``, ``~frame_local``, ``~traj``, ``~pointcloud``,
``~pose``, ``/dense_mapping``), rosparams, message-filter synchronization,
100 Hz main loop (recast → comm → render), LCM multi-drone networking, and
the out-of-process topology worker — driving the TPU-native mapping stack
instead of Taichi kernels. Differences: no ``ti.init`` (JAX owns the device);
the topology worker runs the JAX CPU backend.

Requires rospy + message packages; everything below the ROS surface is
importable and testable without ROS.
"""

import sys
import time
from math import nan

import numpy as np

sys.path.insert(0, ".")

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.octomap import Octomap
from taichislam_tpu.models.mesher import MarchingCubeMesher
from taichislam_tpu.models.submap_mapping import SubmapMapping
from taichislam_tpu.utils.comm import CHANNEL_SUBMAP, CHANNEL_TRAJ, SLAMComm
from taichislam_tpu.utils.ros_pcl_transfer import (
    point_cloud,
    pointcloud2_to_xyz_rgb_array,
    pose_msg_to_numpy,
)
from taichislam_tpu.utils.visualization import TaichiSLAMRender

import rospy  # noqa: E402  (gated: the module needs a ROS environment)
import message_filters
from sensor_msgs.msg import CompressedImage, Image, PointCloud2
from geometry_msgs.msg import PoseStamped

try:
    from swarm_msgs.msg import DroneTraj, VIOFrame
except ImportError:
    DroneTraj = VIOFrame = None


class TaichiSLAMNode:
    def __init__(self):
        self.init_params()
        self.init_topology_generator()
        self.disp_level = 0
        self.count = 0
        self.cur_frame = None

        if self.enable_rendering:
            RES_X = rospy.get_param("~disp/res_x", 1920)
            RES_Y = rospy.get_param("~disp/res_y", 1080)
            self.render = TaichiSLAMRender(RES_X, RES_Y)
            self.render.enable_mesher = self.enable_mesher
            self.render.particle_radius = rospy.get_param("~voxel_scale",
                                                          0.05) / 2

        self.pub_occ = rospy.Publisher("/dense_mapping", PointCloud2,
                                       queue_size=10)
        self.updated = False
        self.initial_networking()
        self.initial_mapping()
        self.init_subscribers()
        self.updated_pcl = False
        self.post_submap_fusion_count = 0

    # ------------------------------------------------------------------
    def init_params(self):
        self.texture_compressed = rospy.get_param("~texture_compressed",
                                                  False)
        self.enable_mesher = rospy.get_param("~enable_mesher", True)
        self.enable_rendering = rospy.get_param("~enable_rendering", True)
        self.output_map = rospy.get_param("~output_map", False)
        self.enable_submap = rospy.get_param("~enable_submap", False)
        self.enable_multi = rospy.get_param("~enable_multi", True)
        self.drone_id = rospy.get_param("~drone_id", 1)
        self.keyframe_step = rospy.get_param("~keyframe_step", 10)

        fx_dep = rospy.get_param("Kdepth/fx", 384.2377014160156)
        fy_dep = rospy.get_param("Kdepth/fy", 384.2377014160156)
        cx_dep = rospy.get_param("Kdepth/cx", 323.4873046875)
        cy_dep = rospy.get_param("Kdepth/cy", 235.0628204345703)
        fx_color = rospy.get_param("Kcolor/fx", 384.2377014160156)
        fy_color = rospy.get_param("Kcolor/fy", 384.2377014160156)
        cx_color = rospy.get_param("Kcolor/cx", 323.4873046875)
        cy_color = rospy.get_param("Kcolor/cy", 235.0628204345703)
        self.Kdep = np.array([fx_dep, 0.0, cx_dep, 0.0, fy_dep, cy_dep,
                              0.0, 0.0, 1.0])
        self.Kcolor = np.array([fx_color, 0.0, cx_color, 0.0, fy_color,
                                cy_color, 0.0, 0.0, 1.0])
        self.mapping_type = rospy.get_param("~mapping_type", "tsdf")
        self.texture_enabled = rospy.get_param("~texture_enabled", True)
        self.max_mesh = rospy.get_param("~disp/max_mesh", 1000000)

        self.skeleton_graph_gen = rospy.get_param(
            "~enable_skeleton_graph_gen", False)
        self.skeleton_graph_gen_opts = {
            "max_raycast_dist": rospy.get_param(
                "~skeleton_graph_gen/max_raycast_dist", 2.5),
            "coll_det_num": rospy.get_param(
                "~skeleton_graph_gen/coll_det_num", 64),
            "frontier_combine_angle_threshold": rospy.get_param(
                "~skeleton_graph_gen/frontier_combine_angle_threshold", 20),
        }

    # ------------------------------------------------------------------
    def send_submap_handle(self, buf):
        self.comm.publishBuffer(buf, CHANNEL_SUBMAP)

    def traj_send_handle(self, traj):
        self.comm.publishBuffer(traj, CHANNEL_TRAJ)

    def initial_networking(self):
        if not self.enable_multi:
            return
        self.comm = SLAMComm(self.drone_id)
        self.comm.on_submap = self.on_remote_submap
        self.comm.on_traj = self.on_remote_traj

    def handle_comm(self):
        if self.enable_multi:
            self.comm.handle()

    def on_remote_submap(self, buf):
        self.mapping.input_remote_submap(buf)

    def on_remote_traj(self, buf):
        self.mapping.input_remote_traj(buf)

    # ------------------------------------------------------------------
    def init_subscribers(self):
        self.depth_sub = message_filters.Subscriber("~depth", Image,
                                                    queue_size=10)
        self.pointcloud_sub = message_filters.Subscriber(
            "~pointcloud", PointCloud2, queue_size=10)

        if self.enable_submap:
            self.frame_sub = message_filters.Subscriber("~frame_local",
                                                        VIOFrame)
            self.traj_sub = rospy.Subscriber("~traj", DroneTraj,
                                             self.traj_callback,
                                             queue_size=10, tcp_nodelay=True)
            if self.texture_enabled:
                img_type = CompressedImage if self.texture_compressed \
                    else Image
                self.image_sub = message_filters.Subscriber("~image",
                                                            img_type,
                                                            queue_size=10)
                self.ts = message_filters.ApproximateTimeSynchronizer(
                    [self.depth_sub, self.image_sub, self.frame_sub], 10,
                    slop=0.03)
                self.ts.registerCallback(self.process_depth_image_frame)
            else:
                self.ts = message_filters.ApproximateTimeSynchronizer(
                    [self.depth_sub, self.frame_sub], 10, slop=0.03)
                self.ts.registerCallback(self.process_depth_frame)
            self.ts_pcl = message_filters.ApproximateTimeSynchronizer(
                [self.pointcloud_sub, self.frame_sub], 10, slop=0.03)
            self.ts_pcl.registerCallback(self.process_pcl_frame)
        else:
            self.pose_sub = message_filters.Subscriber("~pose", PoseStamped)
            if self.texture_enabled:
                img_type = CompressedImage if self.texture_compressed \
                    else Image
                self.image_sub = message_filters.Subscriber("~image",
                                                            img_type,
                                                            queue_size=10)
                self.ts = message_filters.ApproximateTimeSynchronizer(
                    [self.depth_sub, self.image_sub, self.pose_sub], 10,
                    slop=0.03)
                self.ts.registerCallback(self.process_depth_image_pose)
            else:
                self.ts = message_filters.ApproximateTimeSynchronizer(
                    [self.depth_sub, self.pose_sub], 10, slop=0.03)
                self.ts.registerCallback(self.process_depth_pose)

    # ------------------------------------------------------------------
    def get_general_mapping_opts(self):
        max_disp_particles = rospy.get_param("~disp/max_disp_particles",
                                             1024 * 1024)
        map_size_xy = rospy.get_param("~map_size_xy", 100)
        map_size_z = rospy.get_param("~map_size_z", 10)
        self.voxel_scale = voxel_scale = rospy.get_param("~voxel_scale", 0.05)
        opts = {
            "texture_enabled": self.texture_enabled,
            "max_disp_particles": max_disp_particles,
            "map_scale": [map_size_xy, map_size_z],
            "voxel_scale": voxel_scale,
            "max_ray_length": rospy.get_param("~max_ray_length", 5.1),
            "min_ray_length": rospy.get_param("~min_ray_length", 0.3),
            "disp_ceiling": rospy.get_param("~disp_ceiling", 1.8),
            "disp_floor": rospy.get_param("~disp_floor", -0.3),
            "color_same_proj": rospy.get_param("~color_same_proj", False),
        }
        return opts

    def get_octo_opts(self):
        opts = self.get_general_mapping_opts()
        opts["K"] = rospy.get_param("K", 2)
        opts["min_occupy_thres"] = rospy.get_param("min_occupy_thres", 2)
        return opts

    def get_sdf_opts(self):
        opts = self.get_general_mapping_opts()
        opts["num_voxel_per_blk_axis"] = rospy.get_param(
            "~num_voxel_per_blk_axis", 16)
        return opts

    def get_submap_opts(self):
        opts = self.get_octo_opts() if self.mapping_type == "octo" \
            else self.get_sdf_opts()
        opts["max_disp_particles"] = rospy.get_param(
            "~submap_max_disp_particles", 100000)
        return opts

    def initial_mapping(self):
        if self.enable_submap:
            print(f"Initializing submap with {self.mapping_type}...")
            map_type = Octomap if self.mapping_type == "octo" else DenseTSDF
            self.mapping = SubmapMapping(
                map_type, global_opts=(self.get_octo_opts()
                                       if map_type is Octomap
                                       else self.get_sdf_opts()),
                sub_opts=self.get_submap_opts(),
                keyframe_step=self.keyframe_step)
            self.mapping.post_local_to_global_callback = \
                self.post_submapfusion_callback
            if map_type is DenseTSDF and self.enable_mesher:
                self.mesher = MarchingCubeMesher(
                    self.mapping.global_map, self.max_mesh,
                    tsdf_surface_thres=self.voxel_scale * 5)
            self.mapping.map_send_handle = self.send_submap_handle
            self.mapping.traj_send_handle = self.traj_send_handle
        else:
            if self.mapping_type == "octo":
                self.mapping = Octomap(**self.get_octo_opts())
            else:
                self.mapping = DenseTSDF(**self.get_sdf_opts())
                if self.enable_mesher:
                    self.mesher = MarchingCubeMesher(
                        self.mapping, self.max_mesh,
                        tsdf_surface_thres=self.voxel_scale * 5)
        self.mapping.set_color_camera_intrinsic(self.Kcolor)
        self.mapping.set_dep_camera_intrinsic(self.Kdep)

    # ------------------------------------------------------------------
    def init_topology_generator(self):
        if not self.skeleton_graph_gen:
            self.topo = None
            return
        print("Initializing skeleton graph generator thread...")
        from multiprocessing import Manager, Process
        from topo_gen_thread import TopoGenThread
        self.share_map_man = Manager()
        self.shared_map_d = self.share_map_man.dict()
        self.shared_map_d["exit"] = False
        self.shared_map_d["update"] = False
        self.shared_map_d["topo_graph_viz"] = None
        params = {
            "sdf_params": self.get_sdf_opts(),
            "skeleton_graph_gen_opts": self.skeleton_graph_gen_opts,
        }
        self.topo = Process(target=TopoGenThread,
                            args=[params, self.shared_map_d])
        self.topo.start()

    def end_topo_thread(self):
        if self.topo:
            print("Ending topology thread...")
            self.shared_map_d["exit"] = True
            self.topo.terminate()
            self.topo.join()
            self.topo = None

    # ------------------------------------------------------------------
    # callbacks: stage the latest frame; the main loop consumes it
    # ------------------------------------------------------------------
    def process_depth_frame(self, depth_msg, frame):
        self.taichimapping_depth_callback(frame, depth_msg)

    def process_pcl_frame(self, cloud_msg, frame):
        self.cloud_msg = cloud_msg
        self.cur_frame = frame
        self.updated = True
        self.updated_pcl = True

    def _decode_image(self, image):
        if isinstance(image, CompressedImage):
            import cv2
            np_arr = np.frombuffer(image.data, np.uint8)
            rgb = cv2.imdecode(np_arr, cv2.IMREAD_COLOR)
            return cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB)
        np_arr = np.frombuffer(image.data, np.uint8)
        return np_arr.reshape((image.height, image.width, -1))

    def process_depth_image_frame(self, depth_msg, image, frame):
        self.taichimapping_depth_callback(frame, depth_msg,
                                          self._decode_image(image))

    def process_depth_pose(self, depth_msg, pose):
        pass  # same TODO as the reference (taichislam_node.py:275-277)

    def process_depth_image_pose(self, depth_msg, image, pose):
        pass

    def taichimapping_depth_callback(self, frame, depth_msg,
                                     texture=np.array([], dtype=int)):
        self.depth_msg = depth_msg
        self.cur_frame = frame
        self.texture = texture
        self.updated = True

    # ------------------------------------------------------------------
    def recast(self):
        frame = self.cur_frame
        mapping = self.mapping
        start_time = time.time()
        if self.updated_pcl:
            self.updated_pcl = False
            xyz_array, rgb_array = pointcloud2_to_xyz_rgb_array(
                self.cloud_msg)
            t_pcl2npy = (time.time() - start_time) * 1000
            pose = pose_msg_to_numpy(frame.odom.pose.pose)
            ext = np.eye(3), np.zeros(3)
            mapping.recast_pcl_to_map_by_frame(frame.frame_id,
                                               frame.is_keyframe, pose, ext,
                                               xyz_array, rgb_array)
        else:
            w, h = self.depth_msg.width, self.depth_msg.height
            depthmap = np.frombuffer(self.depth_msg.data,
                                     dtype=np.uint16).reshape((h, w))
            t_pcl2npy = (time.time() - start_time) * 1000
            pose = pose_msg_to_numpy(frame.odom.pose.pose)
            ext = pose_msg_to_numpy(frame.extrinsics[0])
            mapping.recast_depth_to_map_by_frame(frame.frame_id,
                                                 frame.is_keyframe, pose, ext,
                                                 depthmap, self.texture)
        return pose, t_pcl2npy, (time.time() - start_time) * 1000

    def output(self, R, T):
        mapping = self.mapping
        t_mesh = t_export = t_pubros = nan
        if self.mapping_type == "octo":
            mapping.cvt_occupy_to_voxels(self.disp_level)
            n = mapping.num_export_particles
            if self.output_map:
                self.pub_to_ros(mapping.export_x[:n],
                                mapping.export_color[:n],
                                mapping.enable_texture)
        else:
            if self.enable_rendering and self.render.enable_mesher:
                start_time = time.time()
                self.mesher.generate_mesh(1)
                t_mesh = (time.time() - start_time) * 1000
                self.render.set_mesh(self.mesher.mesh_vertices,
                                     self.mesher.mesh_colors,
                                     self.mesher.mesh_normals,
                                     mesh_num=self.mesher.num_facelets)
            elif self.output_map:
                start_time = time.time()
                mapping.cvt_TSDF_surface_to_voxels()
                t_export = (time.time() - start_time) * 1000
                n = mapping.num_TSDF_particles
                start_time = time.time()
                self.pub_to_ros(mapping.export_TSDF_xyz[:n],
                                mapping.export_color[:n],
                                mapping.enable_texture)
                t_pubros = (time.time() - start_time) * 1000
        if self.enable_rendering and self.render.lock_pos_drone:
            self.render.camera_lookat = T
        return t_mesh, t_export, t_pubros

    def process_taichi(self):
        if not self.updated:
            return
        self.updated = False
        pose, t_pcl2npy, t_recast = self.recast()
        if self.enable_rendering:
            self.render.set_drone_pose(0, pose[0], pose[1])
        t_mesh, t_export, t_pubros = self.output(pose[0], pose[1])
        self.count += 1
        print(f"[TaichiSLAM] Time: pcl2npy {t_pcl2npy:.1f}ms t_recast "
              f"{t_recast:.1f}ms t_export {t_export:.1f}ms t_mesh "
              f"{t_mesh:.1f}ms t_pubros {t_pubros:.1f}ms")

    def rendering(self):
        start_time = time.time()
        mapping = self.mapping
        if self.enable_rendering:
            if self.mapping_type == "tsdf":
                mapping.cvt_TSDF_surface_to_voxels()
                self.render.set_particles(mapping.export_TSDF_xyz,
                                          mapping.export_color,
                                          mapping.num_TSDF_particles)
            if self.mapping_type == "octo":
                mapping.cvt_occupy_to_voxels(self.disp_level)
                self.render.set_particles(mapping.export_x,
                                          mapping.export_color,
                                          mapping.num_export_particles)
            self.render.rendering()
        return (time.time() - start_time) * 1000

    def traj_callback(self, traj):
        if traj.drone_id != self.drone_id:
            return
        frame_poses = {}
        positions = np.zeros((len(traj.poses), 3))
        for i in range(len(traj.frame_ids)):
            R, T = pose_msg_to_numpy(traj.poses[i])
            frame_poses[traj.frame_ids[i]] = (R, T)
            positions[i] = T
        self.mapping.set_frame_poses(frame_poses)
        if self.enable_rendering:
            self.render.set_drone_trajectory(0, positions)

    def pub_to_ros(self, pos_, colors_, enable_texture):
        if enable_texture:
            pts = np.concatenate((pos_, colors_.astype(float)), axis=1)
            self.pub_occ.publish(point_cloud(pts, "world", has_rgb=True))
        else:
            self.pub_occ.publish(point_cloud(pos_, "world", has_rgb=False))

    def post_submapfusion_callback(self, global_map):
        self.post_submap_fusion_count += 1
        if self.topo:
            self.shared_map_d["map_data"] = global_map.export_submap()
            self.shared_map_d["update"] = True
            viz = self.shared_map_d["topo_graph_viz"]
            if viz is not None and self.enable_rendering:
                self.render.set_skeleton_graph_edges(viz["lines"])


def slam_main():
    rospy.init_node("taichislam_node")
    node = TaichiSLAMNode()
    print("TaichiSLAMNode initialized")
    rate = rospy.Rate(100)
    while not rospy.is_shutdown():
        try:
            node.process_taichi()
            node.handle_comm()
            if node.enable_rendering:
                node.rendering()
            rate.sleep()
        except KeyboardInterrupt:
            break
    node.end_topo_thread()


if __name__ == "__main__":
    slam_main()
