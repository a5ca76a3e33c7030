"""MarchingCubeMesher: host-facing mesher with the reference API
(/root/reference/taichi_slam/mapping/marching_cube_mesher.py:13-27, 189-193):
``MarchingCubeMesher(mapping, max_triangles, tsdf_surface_thres)``,
``generate_mesh(step)``, ``vertice_num()``, and ``mesh_vertices`` /
``mesh_colors`` / ``mesh_normals`` flat arrays of ``max_triangles * 3``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.ops import marching_cubes as mc_ops


class MarchingCubeMesher:
    def __init__(self, mapping, max_triangles=1000000,
                 tsdf_surface_thres=0.1, surface_block_cap=2048,
                 delivery="quantized"):
        self.mapping = mapping
        self.max_triangles = max_triangles
        self.tsdf_surface_thres = tsdf_surface_thres
        self.surface_block_cap = min(surface_block_cap,
                                     mapping.cfg.max_blocks)
        self.enable_texture = mapping.enable_texture
        # "quantized" ships the mesh as one 12-byte/vertex buffer (i16 mm
        # vertices, i8 normals, u8 colors — one host round-trip, 3× less
        # wire traffic; exact to 0.5 mm); "f32" ships the raw arrays.
        # Falls back to f32 when the map extent exceeds the i16 mm range.
        cfg = mapping.cfg
        half_extent = max(cfg.grid.bn_xy, cfg.grid.bn_z) * \
            cfg.num_voxel_per_blk_axis * cfg.voxel_scale / 2.0
        self.delivery = delivery if half_extent < 32.7 else "f32"
        self.num_facelets = 0
        n = max_triangles * 3
        self.mesh_vertices = np.full((n, 3), -1000000.0, np.float32)
        self.mesh_colors = np.full((n, 3), 0.5, np.float32)
        self.mesh_normals = np.zeros((n, 3), np.float32)
        self.mesh_indices = None

    def generate_mesh(self, step=1):
        # op cost scales with the static caps, so bucket them to the actual
        # map (powers of two bound recompiles): the block cap to the
        # allocated block count (blocks with surface cells are a subset, so
        # nothing drops), the triangle cap grown on overflow and remembered
        nblocks = int(self.mapping.state.num_blocks) + 1
        cap = 64
        while cap < nblocks:
            cap *= 2
        cap = min(cap, self.surface_block_cap)
        mt = min(getattr(self, "_mt_bucket", 1 << 14), self.max_triangles)
        while True:
            out = mc_ops.extract_mesh(
                self.mapping.cfg, mt, int(step), cap, self.mapping.state,
                jnp.int32(self.mapping.active_submap_id),
                jnp.float32(self.tsdf_surface_thres))
            # ONE packed host fetch for all the counters (each separate
            # int() is a device round-trip on high-latency links)
            pack = np.asarray(jnp.stack([out["num_triangles"],
                                         out["total_triangles"],
                                         out["surface_blocks_dropped"]]))
            n_tri, total, dropped = (int(x) for x in pack)
            if total > mt and mt < self.max_triangles:
                while mt < min(total, self.max_triangles):
                    mt *= 2
                mt = min(mt, self.max_triangles)
                continue
            break
        self._mt_bucket = mt
        if dropped > 0:
            print(f"[Mesher] surface block cap hit: {dropped} dropped")
        self.num_facelets = n_tri
        self.total_triangles = total
        # ship only the LIVE triangle prefix (triangles are compacted to
        # the front): the device buffers are sized to the pow2 bucket, and
        # fetching the dead tail through a remote link costs real seconds
        # at ~50 MB of mesh buffers. The fetch length is pow2-bucketed to
        # bound slice-executable recompiles.
        rows = 1 << 8
        while rows < n_tri * 3:
            rows *= 2
        rows = min(rows, mt * 3)
        if self.delivery == "quantized":
            buf = mc_ops.pack_mesh_delivery(
                out["vertices"], out["normals"], out["colors"], rows,
                self.enable_texture)
            v, nrm, col = mc_ops.unpack_mesh_delivery(
                buf, rows, self.enable_texture)
            # dead tail keeps the reference's -1e6 fill (the live prefix
            # is [:num_facelets*3])
            v[n_tri * 3:] = -1000000.0
            self.mesh_vertices, self.mesh_normals = v, nrm
            self.mesh_colors = col
        else:
            sl = jax.lax.dynamic_slice_in_dim
            self.mesh_vertices = np.asarray(sl(out["vertices"], 0, rows, 0))
            self.mesh_normals = np.asarray(sl(out["normals"], 0, rows, 0))
            self.mesh_colors = np.asarray(sl(out["colors"], 0, rows, 0))
        if total > self.max_triangles:
            print(f"[Mesher] triangle cap hit: {total} > "
                  f"{self.max_triangles}")
        print("Total triangles", self.num_facelets)

    def vertice_num(self):
        return self.num_facelets * 3
