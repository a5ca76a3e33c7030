import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichislam_tpu.core.config import GridSpec
from taichislam_tpu.core import geometry
from taichislam_tpu.core.grid import (
    GridState,
    allocate_blocks,
    block_lin_to_coords,
    block_origin_voxel,
    flat_voxel_index,
    gather_channel,
    lookup_slots,
    make_grid_state,
    reset_grid,
    scatter_add,
    voxel_to_block,
)
from taichislam_tpu.core.compaction import compact


@pytest.fixture
def spec():
    return GridSpec(voxel_scale=0.1, map_size_xy=3.2, map_size_z=1.6,
                    num_voxel_per_blk_axis=8, num_submaps=4, max_blocks=16)


def test_spec_derivation(spec):
    assert spec.N == 32 and spec.Nz == 16
    assert spec.bn_xy == 4 and spec.bn_z == 2
    assert spec.blocks_per_submap == 4 * 4 * 2
    assert spec.origin_voxel == (-16, -16, -8)


def test_round_half_away():
    x = jnp.array([0.5, -0.5, 1.49, -1.5, 2.5, 0.0])
    got = geometry.round_half_away(x)
    np.testing.assert_array_equal(np.asarray(got), [1.0, -1.0, 1.0, -2.0, 3.0, 0.0])


def test_xyz_ijk_roundtrip(spec):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, size=(100, 3)).astype(np.float32)
    ijk = geometry.xyz_to_ijk(jnp.asarray(xyz), spec.voxel_scale)
    back = geometry.ijk_to_xyz(ijk, spec.voxel_scale)
    assert np.max(np.abs(np.asarray(back) - xyz)) <= spec.voxel_scale / 2 + 1e-6


def test_voxel_to_block_bounds(spec):
    s = jnp.array([0, 0, 0, 5])
    ijk = jnp.array([
        [-16, -16, -8],   # lower corner -> block 0 of submap 0
        [15, 15, 7],      # upper corner
        [16, 0, 0],       # out of bounds in x
        [0, 0, 0],        # bad submap id
    ], jnp.int32)
    blin, intra, inb = voxel_to_block(spec, s, ijk)
    assert bool(inb[0]) and bool(inb[1])
    assert not bool(inb[2]) and not bool(inb[3])
    assert int(blin[0]) == 0
    assert int(intra[0]) == 0
    assert int(blin[2]) == -1 and int(blin[3]) == -1
    # round-trip block coords
    coords = block_lin_to_coords(spec, blin[1])
    np.testing.assert_array_equal(np.asarray(coords), [0, 3, 3, 1])
    origin = block_origin_voxel(spec, coords)
    np.testing.assert_array_equal(np.asarray(origin), [8, 8, 0])


def test_allocate_lookup_scatter(spec):
    state = make_grid_state(spec, {"val": (jnp.float32, ())})
    # two distinct voxels in the same block + one in another block
    ijk = jnp.array([[0, 0, 0], [0, 0, 1], [9, 0, 0]], jnp.int32)
    s = jnp.zeros((3,), jnp.int32)
    blin, intra, inb = voxel_to_block(spec, s, ijk)

    state = allocate_blocks(spec, state, blin, inb, jnp.int32(0))
    assert int(state.num_blocks) == 2
    assert int(state.alloc_overflow) == 0

    slots = lookup_slots(spec, state.table, blin)
    assert int(slots[0]) == int(slots[1]) != int(slots[2])
    assert int(slots[2]) < spec.max_blocks

    flat = flat_voxel_index(spec, slots, intra)
    ch = scatter_add(state.channels["val"], flat, jnp.ones((3,)))
    got = gather_channel(ch, flat)
    np.testing.assert_allclose(np.asarray(got), [1, 1, 1])

    # idempotent allocation: same blocks again -> no growth
    state2 = allocate_blocks(spec, state, blin, inb, jnp.int32(0))
    assert int(state2.num_blocks) == 2

    # lookups for unallocated blocks hit the garbage slot
    miss_blin = jnp.array([spec.blocks_per_submap - 1], jnp.int32)
    miss = lookup_slots(spec, state.table, miss_blin)
    assert int(miss[0]) == spec.max_blocks


def test_allocate_overflow(spec):
    state = make_grid_state(spec, {"val": (jnp.float32, ())})
    # touch more blocks than capacity (cap=16, submap has 32 blocks)
    all_blocks = jnp.arange(spec.blocks_per_submap, dtype=jnp.int32)
    state = allocate_blocks(spec, state, all_blocks,
                            jnp.ones_like(all_blocks, bool), jnp.int32(0))
    assert int(state.num_blocks) == spec.max_blocks
    assert int(state.alloc_overflow) == spec.blocks_per_submap - spec.max_blocks
    # table entries beyond capacity stayed unallocated
    slots = lookup_slots(spec, state.table, all_blocks)
    assert int(jnp.sum(slots == spec.max_blocks)) == int(state.alloc_overflow)


def test_allocate_second_submap(spec):
    state = make_grid_state(spec, {"val": (jnp.float32, ())})
    ijk = jnp.array([[0, 0, 0]], jnp.int32)
    blin0, _, inb0 = voxel_to_block(spec, jnp.array([0]), ijk)
    blin1, _, inb1 = voxel_to_block(spec, jnp.array([1]), ijk)
    state = allocate_blocks(spec, state, blin0, inb0, jnp.int32(0))
    state = allocate_blocks(spec, state, blin1, inb1, jnp.int32(1))
    assert int(state.num_blocks) == 2
    s0 = lookup_slots(spec, state.table, blin0)
    s1 = lookup_slots(spec, state.table, blin1)
    assert int(s0[0]) != int(s1[0])
    np.testing.assert_array_equal(
        np.asarray(state.block_coords[int(s1[0])]), [1, 2, 2, 1])


def test_reset(spec):
    state = make_grid_state(spec, {"val": (jnp.float32, ())})
    blin = jnp.array([0], jnp.int32)
    state = allocate_blocks(spec, state, blin, jnp.array([True]), jnp.int32(0))
    state = reset_grid(state)
    assert int(state.num_blocks) == 0
    assert int(jnp.sum(state.table >= 0)) == 0


def test_compaction():
    vals = jnp.arange(10, dtype=jnp.float32)
    mask = vals % 2 == 0
    out, kept, total = compact(vals, mask, capacity=3, fill_value=-1)
    np.testing.assert_array_equal(np.asarray(out), [0, 2, 4])
    assert int(kept) == 3 and int(total) == 5

    out, kept, total = compact(vals, mask, capacity=8, fill_value=-1)
    np.testing.assert_array_equal(np.asarray(out), [0, 2, 4, 6, 8, -1, -1, -1])
    assert int(kept) == 5 and int(total) == 5


def test_allocation_jittable(spec):
    state = make_grid_state(spec, {"val": (jnp.float32, ())})

    @jax.jit
    def step(state, ijk, s):
        blin, intra, inb = voxel_to_block(spec, s, ijk)
        state = allocate_blocks(spec, state, blin, inb, jnp.int32(0))
        slots = lookup_slots(spec, state.table, blin)
        flat = flat_voxel_index(spec, slots, intra)
        ch = scatter_add(state.channels["val"], flat, jnp.ones(flat.shape))
        return state._replace(channels={"val": ch})

    # [0,0,0] -> block (2,2,1); [0,0,-8] -> block (2,2,0): two distinct blocks
    ijk = jnp.array([[0, 0, 0], [0, 0, -8]], jnp.int32)
    s = jnp.zeros((2,), jnp.int32)
    state = step(state, ijk, s)
    state = step(state, ijk, s)
    assert int(state.num_blocks) == 2
    assert float(jnp.sum(state.channels["val"])) == 4.0
