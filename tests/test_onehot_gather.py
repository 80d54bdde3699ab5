"""MXU one-hot gather: bit-exactness vs the XLA gather+dequant path.

The kernel must be bit-identical to tiers/hbm.py gather_dequant_xla (int8 ->
bf16 conversion is exact, each output row sums exactly one nonzero product in
f32, scales accumulate in f32), so these tests assert EQUALITY, not closeness.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hugectr_backend_tpu.ops.onehot_gather import (
    M_TILE,
    R_TILE,
    OnehotPlan,
    onehot_gather,
    plan_onehot_worklist,
    verify_onehot_path,
)
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


def _build_arena(rng, member_rows, dim):
    """Tile-padded int8 arena + scales + per-member (tile0, ntiles)."""
    parts, scales, tiles = [], [], []
    tile0 = 0
    for rows in member_rows:
        ntiles = -(-rows // R_TILE)
        padded = ntiles * R_TILE
        v = rng.integers(-127, 128, (padded, dim)).astype(np.int8)
        s = rng.random(padded).astype(np.float32) * 0.1 + 0.01
        parts.append(v)
        scales.append(s)
        tiles.append((tile0, ntiles))
        tile0 += ntiles
    return (
        np.concatenate(parts),
        np.concatenate(scales),
        tiles,
    )


@pytest.mark.parametrize("member_rows", [[700], [3, 1461, 2174, 5684]])
def test_bit_exact_vs_xla(rng, member_rows):
    dim = 128
    values, scales, tiles = _build_arena(rng, member_rows, dim)
    keys_per_member = [M_TILE] * len(member_rows)
    plan = plan_onehot_worklist(tiles, keys_per_member)

    slots = []
    for (tile0, _), rows in zip(tiles, member_rows):
        base = tile0 * R_TILE
        slots.append(base + rng.integers(0, rows, M_TILE))
    slots = np.concatenate(slots).astype(np.int32)

    got = onehot_gather(
        jnp.asarray(values), jnp.asarray(scales), jnp.asarray(slots),
        plan, interpret=True,
    )
    want = gather_dequant_xla(
        jnp.asarray(values), jnp.asarray(scales), jnp.asarray(slots)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multiple_key_tiles_per_member(rng):
    dim = 128
    values, scales, tiles = _build_arena(rng, [900, 40], dim)
    plan = plan_onehot_worklist(tiles, [2 * M_TILE, M_TILE])
    slots = np.concatenate([
        tiles[0][0] * R_TILE + rng.integers(0, 900, 2 * M_TILE),
        tiles[1][0] * R_TILE + rng.integers(0, 40, M_TILE),
    ]).astype(np.int32)
    got = onehot_gather(
        jnp.asarray(values), jnp.asarray(scales), jnp.asarray(slots),
        plan, interpret=True,
    )
    want = gather_dequant_xla(
        jnp.asarray(values), jnp.asarray(scales), jnp.asarray(slots)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_no_scales_path(rng):
    dim = 128
    values, _, tiles = _build_arena(rng, [300], dim)
    plan = plan_onehot_worklist(tiles, [M_TILE])
    slots = rng.integers(0, 300, M_TILE).astype(np.int32)
    got = onehot_gather(
        jnp.asarray(values), None, jnp.asarray(slots), plan, interpret=True
    )
    want = gather_dequant_xla(jnp.asarray(values), None, jnp.asarray(slots))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_plan_validation():
    with pytest.raises(ValueError):
        plan_onehot_worklist([(0, 1)], [100])  # not a tile multiple
    with pytest.raises(ValueError):
        plan_onehot_worklist([(0, 0)], [M_TILE])  # empty member
    p = plan_onehot_worklist([(0, 2), (2, 1)], [M_TILE, 2 * M_TILE])
    assert isinstance(p, OnehotPlan)
    assert p.steps == 2 + 1 + 1
    assert p.num_key_tiles == 3
    assert p.first.tolist() == [1, 0, 1, 1]


def test_verify_onehot_path(rng):
    values, scales, tiles = _build_arena(rng, [700, 40], 128)
    plan = plan_onehot_worklist(tiles, [M_TILE, M_TILE])
    assert verify_onehot_path(
        jnp.asarray(values), jnp.asarray(scales), plan, tiles, interpret=True
    )
