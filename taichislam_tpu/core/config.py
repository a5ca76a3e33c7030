"""Static configuration for the block voxel-grid substrate and map types.

The reference (see SURVEY.md §5.6) spreads configuration over argparse,
rosparams and per-class kwargs; here every knob lives in a frozen dataclass
whose field names match the reference's knob names exactly
(``voxel_scale``, ``map_scale``, ``num_voxel_per_blk_axis``,
``max_ray_length`` …, cf. /root/reference/taichi_slam/mapping/dense_tsdf.py:13-16)
so launch files and demos translate one-to-one.

A frozen dataclass is hashable, so configs can be passed as static arguments
to jitted functions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp


def _ceil_to(x: float, m: int) -> int:
    return int(math.ceil(x)) if m <= 1 else int(math.ceil(x / m) * m)


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Geometry + capacity of one block voxel grid.

    Replaces the reference's sparse SNode trees
    (/root/reference/taichi_slam/mapping/dense_tsdf.py:108-118) with a
    fixed-topology layout:

    - voxel index space: centered, ``i,j in [-N//2, N//2)``,
      ``k in [-Nz//2, Nz//2)`` — same offset convention as the reference
      (`offset=[0, -N/2, -N/2, -Nz/2]`, dense_tsdf.py:90).
    - blocks of ``V**3`` voxels; block coord ``b = (ijk + N//2) // V``.
    - a direct-mapped block table of shape ``(num_submaps * bn_xy^2 * bn_z,)``
      mapping linear block coordinates to storage slots (-1 = unallocated).
    - channel arrays of shape ``(max_blocks + 1, V, V, V)``; the final slot is
      a garbage row absorbing writes to unallocated/overflowed blocks.
    """

    voxel_scale: float = 0.05
    map_size_xy: float = 10.0
    map_size_z: float = 10.0
    num_voxel_per_blk_axis: int = 16
    num_submaps: int = 1024
    max_blocks: int = 8192

    # ---- derived (computed in __post_init__) ----
    N: int = 0            # voxels per xy axis (multiple of V)
    Nz: int = 0           # voxels per z axis
    bn_xy: int = 0        # blocks per xy axis
    bn_z: int = 0         # blocks per z axis

    def __post_init__(self):
        V = self.num_voxel_per_blk_axis
        # Mirrors DenseTSDF.__init__ (dense_tsdf.py:24-31): N is map extent in
        # voxels rounded up to a whole number of blocks.
        bn_xy = max(1, math.ceil(self.map_size_xy / self.voxel_scale / V))
        bn_z = max(1, math.ceil(self.map_size_z / self.voxel_scale / V))
        object.__setattr__(self, "bn_xy", bn_xy)
        object.__setattr__(self, "bn_z", bn_z)
        object.__setattr__(self, "N", bn_xy * V)
        object.__setattr__(self, "Nz", bn_z * V)
        # actual map size after rounding (reference recomputes the same way)
        object.__setattr__(self, "map_size_xy", self.voxel_scale * self.N)
        object.__setattr__(self, "map_size_z", self.voxel_scale * self.Nz)

    # -- sizes --------------------------------------------------------------
    @property
    def V(self) -> int:
        return self.num_voxel_per_blk_axis

    @property
    def voxels_per_block(self) -> int:
        return self.V ** 3

    @property
    def blocks_per_submap(self) -> int:
        return self.bn_xy * self.bn_xy * self.bn_z

    @property
    def table_size(self) -> int:
        return self.num_submaps * self.blocks_per_submap

    @property
    def origin_voxel(self) -> Tuple[int, int, int]:
        """Voxel index of the grid's lower corner (the negative offset)."""
        return (-(self.N // 2), -(self.N // 2), -(self.Nz // 2))

    @property
    def voxel_bounds_lo(self) -> Tuple[int, int, int]:
        return self.origin_voxel

    @property
    def voxel_bounds_hi(self) -> Tuple[int, int, int]:
        o = self.origin_voxel
        return (o[0] + self.N, o[1] + self.N, o[2] + self.Nz)


@dataclasses.dataclass(frozen=True)
class TSDFConfig:
    """DenseTSDF map configuration.

    Field names/defaults mirror DenseTSDF.__init__
    (/root/reference/taichi_slam/mapping/dense_tsdf.py:13-16).
    """

    map_scale: Tuple[float, float] = (10.0, 10.0)
    voxel_scale: float = 0.05
    texture_enabled: bool = False
    max_disp_particles: int = 1024 * 1024
    num_voxel_per_blk_axis: int = 16
    max_ray_length: float = 10.0
    min_ray_length: float = 0.3
    internal_voxels: int = 10
    max_submap_num: int = 1024
    is_global_map: bool = False
    disp_ceiling: float = 1.8
    disp_floor: float = -0.3
    recast_step: int = 2
    color_same_proj: bool = True

    # ---- capacity knobs of the TPU rebuild (no reference equivalent; the
    # reference allocates SNodes on demand) ----
    max_blocks: int = 8192
    max_bins: int = 32768          # per-frame deduped ray bins (PCL grid analog)
    storage_dtype: str = "float32"  # 'float32' | 'float16' | 'bfloat16'

    # voxblox weight constants (dense_tsdf.py:8,216-225,39)
    w_max: float = 1000.0

    # fusion accumulation backend: "auto" uses the Pallas sorted
    # segmented-reduce kernel on TPU (2.7x faster than XLA scatters) and XLA
    # elsewhere; "on"/"off" force it (interpret mode off-TPU)
    pallas_accum: str = "auto"
    # static cap on post-sort march lanes fed to the Pallas accumulation
    # (0 = uncapped). The sort packs valid lanes first, so a cap >= the
    # worst frame's live-lane count is lossless while the kernel skips the
    # dead-lane tail (~30-50% of the lattice); integrate reports
    # stats["lanes_dropped"] / stats["live_lanes"] so callers can size it
    # with a zero-drop guard (bench.py does).
    max_march_lanes: int = 0
    # fused ESDF sweep kernel (ops/pallas/esdf_sweep.py): "auto" uses it on
    # TPU backends, "on"/"off" force; the XLA sweep body stays as fallback
    pallas_esdf: str = "auto"
    max_touched_blocks: int = 1024

    # ESDF raise hysteresis, in voxel_scale units: support gaps below
    # slack * voxel_scale are tolerated (values may lag a receding surface
    # by up to that much before re-converging). The default 0 is exact
    # voxblox raise semantics — affordable because the multi-hop scan
    # sweeps (ops/esdf.py) re-converge a shifted shadow region in ~1 sweep;
    # raise it only to damp pathological seed churn.
    esdf_raise_slack_voxels: float = 0.0

    # ESDF sweep convergence threshold in meters: the while_loop stops when
    # no voxel changed by more than this in a sweep. The TSDF seeds jitter
    # by ~sensor-noise millimeters every frame; converging the whole field
    # to machine epsilon against that is wasted sweeps. 1e-4 (0.1 mm) keeps
    # the field well below the sensor noise floor.
    esdf_converge_eps: float = 1e-4

    # Updated-voxel gating for the incremental ESDF, in voxel_scale units:
    # a frame-touched block re-enters the ESDF working set only if some
    # voxel's TSDF moved by more than this (or an observed flag flipped)
    # since the ESDF last consumed the block. This is voxblox's propagation
    # gate (its ESDF integrator only processes TSDF voxels flagged updated,
    # with a min_diff_m threshold, default 0.05 m); 0.25 voxels = 0.0125 m
    # at 5 cm voxels is strictly tighter. Sub-threshold sensor jitter then
    # costs ZERO sweeps on already-converged regions; the field lags true
    # seeds by at most this much. 0.0 still skips bit-identical blocks
    # (exactness preserved); negative disables gating entirely.
    esdf_seed_eps_voxels: float = 0.25

    # How many leading sweeps of each ESDF update run the multi-hop
    # segmented axis scans (the "raise queue" pass that moves information a
    # whole block-row per sweep; a scan sweep costs ~2x a class-stencil
    # sweep). 1 = first sweep only (best for small per-frame budgets, where
    # later sweeps are cheap refinements); -1 = every sweep (best for
    # DRAINED updates — convergence needs ~2-3 scan sweeps instead of
    # ~shadow-diameter class sweeps).
    esdf_scan_sweeps: int = 1

    # With a positive period p, scan sweeps ALSO run on every p-th sweep
    # (it % p == 0), not just the first ``esdf_scan_sweeps``. Drained-mode
    # lever: information crosses one block boundary per halo exchange, and
    # only scan sweeps carry it across the next block's interior in a
    # single hop — first-sweep-only scans leave later crossings at one
    # voxel per sweep, while scans-every-sweep doubles the cost of the
    # cheap refinement sweeps. A period amortizes: one block-crossing scan
    # sweep per p, class sweeps in between. 0 disables (default).
    esdf_scan_period: int = 0

    # Debug/measurement only: run exactly ``max_sweeps`` sweeps with every
    # slab active (no convergence early-exit, no activity gating) so sweep
    # costs are measurable at a fixed count (tools/exp_drained.py).
    esdf_force_sweeps: bool = False

    # Whole-while-loop-in-one-kernel ESDF (ops/pallas/esdf_sweep.py
    # esdf_sweep_loop_pallas): sweeps, halo exchange, and convergence run
    # inside a single pallas_call with the field VMEM-resident. Measured:
    # the orchestrated per-sweep design pays 0.28 ms/sweep of pure XLA
    # glue (identity kernel == real kernel cost). "auto" = on TPU when
    # the working set fits VMEM; "on" forces (interpret mode off-TPU,
    # tests only); "off" keeps the per-sweep orchestration.
    esdf_loop_kernel: str = "auto"

    @property
    def tsdf_surface_thres(self) -> float:
        return self.voxel_scale * 1.8

    @property
    def max_ray_steps(self) -> int:
        """Static bound for the per-bin ray march (dense_tsdf.py:249)."""
        return int(math.ceil(self.max_ray_length / self.voxel_scale))

    @property
    def grid(self) -> GridSpec:
        return GridSpec(
            voxel_scale=self.voxel_scale,
            map_size_xy=self.map_scale[0],
            map_size_z=self.map_scale[1],
            num_voxel_per_blk_axis=self.num_voxel_per_blk_axis,
            num_submaps=1 if self.is_global_map else self.max_submap_num,
            max_blocks=self.max_blocks,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.storage_dtype)


@dataclasses.dataclass(frozen=True)
class OctomapConfig:
    """Octomap configuration.

    Mirrors Octomap.__init__
    (/root/reference/taichi_slam/mapping/taichi_octomap.py:14-17). The grid is
    sized like the reference's K**R tree: ``N = K**ceil(log_K(map/voxel))``
    and the voxel scale is re-derived as ``map_size/N``
    (taichi_octomap.py:19-28).
    """

    map_scale: Tuple[float, float] = (10.0, 10.0)
    voxel_scale: float = 0.05
    min_occupy_thres: float = 3.0
    texture_enabled: bool = False
    min_ray_length: float = 0.3
    max_ray_length: float = 3.0
    max_disp_particles: int = 1000000
    K: int = 2
    max_submap_num: int = 1024
    disp_ceiling: float = 10.0
    disp_floor: float = -10.0
    is_global_map: bool = False
    recast_step: int = 2
    color_same_proj: bool = True

    max_blocks: int = 8192
    num_voxel_per_blk_axis: int = 16

    def __post_init__(self):
        Rxy = math.ceil(math.log2(self.map_scale[0] / self.voxel_scale) / math.log2(self.K))
        Rz = math.ceil(math.log2(self.map_scale[1] / self.voxel_scale) / math.log2(self.K))
        object.__setattr__(self, "Rxy", Rxy)
        object.__setattr__(self, "Rz", Rz)
        object.__setattr__(self, "N", self.K ** Rxy)
        object.__setattr__(self, "Nz", self.K ** Rz)
        # reference re-derives voxel scale from the tree size
        object.__setattr__(self, "voxel_scale", self.map_scale[0] / self.N)

    @property
    def grid(self) -> GridSpec:
        # Octomap's N is a power of K; blocks must evenly divide it.
        V = self.num_voxel_per_blk_axis
        while self.N % V != 0 or (self.Nz % V != 0 and self.Nz > V):
            V //= 2
        V = max(V, 1)
        return GridSpec(
            voxel_scale=self.voxel_scale,
            map_size_xy=self.voxel_scale * self.N,
            map_size_z=self.voxel_scale * max(self.Nz, V),
            num_voxel_per_blk_axis=V,
            num_submaps=1 if self.is_global_map else self.max_submap_num,
            max_blocks=self.max_blocks,
        )
