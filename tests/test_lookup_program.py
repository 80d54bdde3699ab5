"""Unit tests for the shared device lookup program (cache/lookup_program.py):
bit-exactness of every access-path kind against the reference gather, across
arena dtypes — including the int8 MXU one-hot branch (s8xs8->s32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hugectr_backend_tpu.cache.lookup_program import (
    gather_rows_for_groups,
    lookup_flat_jit,
    onehot_member_rows,
    pack_host_args,
)
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


def _arena(dtype, rows=300, dim=16, seed=0):
    r = np.random.default_rng(seed)
    if dtype == "int8":
        return r.integers(-127, 128, (rows, dim)).astype(np.int8)
    if dtype == "fp8":
        import ml_dtypes

        return r.standard_normal((rows, dim)).astype(ml_dtypes.float8_e4m3fn)
    if dtype == "bf16":
        return r.standard_normal((rows, dim)).astype(jnp.bfloat16)
    return r.standard_normal((rows, dim)).astype(np.float32)


@pytest.mark.parametrize("dtype", ["int8", "fp8", "bf16", "fp32"])
def test_onehot_member_bit_exact_vs_gather(dtype):
    vals = jnp.asarray(_arena(dtype))
    slots = jnp.asarray(
        np.random.default_rng(1).integers(40, 140, 64).astype(np.int32))
    # member segment [40, 140) of the arena
    got = onehot_member_rows(vals, 40, 100, slots)
    want = jnp.take(vals, slots, axis=0).astype(jnp.float32)
    # int8/fp8/bf16: exact (one-hot product in s32 / bf16 values exact);
    # fp32 uses a HIGHEST-precision matmul, exact for one-hot masks.
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_onehot_int8_blocked_layout_flattens():
    vals3 = jnp.asarray(_arena("int8", rows=320).reshape(4, 80, 16))
    flat = vals3.reshape(-1, 16)
    slots = jnp.asarray(np.arange(10, 74, dtype=np.int32))
    got = onehot_member_rows(vals3, 10, 64, slots)
    want = jnp.take(flat, slots, axis=0).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_for_groups_mixed_kinds_and_flat():
    r = np.random.default_rng(2)
    # group 0: int8 onehot arena with 2 members (+ host scales)
    oh = jnp.asarray(_arena("int8", rows=96))
    oh_slots = np.concatenate([
        r.integers(0, 40, 8), r.integers(40, 96, 8)]).astype(np.int32)
    oh_scales = r.uniform(0.5, 2.0, 16).astype(np.float32)
    # group 1: int8 gather arena with device scales
    ar = jnp.asarray(_arena("int8", rows=200, seed=3))
    ar_scales = jnp.asarray(r.uniform(0.5, 2.0, 200).astype(np.float32))
    ar_slots = r.integers(0, 200, 12).astype(np.int32)
    # group 2: solo gather + host scales
    so = jnp.asarray(_arena("int8", rows=500, seed=4))
    so_slots = r.integers(0, 500, 10).astype(np.int32)
    so_scales = r.uniform(0.5, 2.0, 10).astype(np.float32)

    meta = (
        ("onehot", (0, 40), (40, 56), (8, 8)),
        ("gather",),
        ("gather",),
    )
    vals = [oh, ar, so]
    dscales = [None, ar_scales, None]
    slots_l = [oh_slots, ar_slots, so_slots]
    scin_l = [oh_scales, None, so_scales]

    outs = gather_rows_for_groups(
        vals, dscales,
        [jnp.asarray(s) for s in slots_l],
        [None if s is None else jnp.asarray(s) for s in scin_l],
        meta,
    )
    want0 = (jnp.take(oh, jnp.asarray(oh_slots), axis=0).astype(jnp.float32)
             * oh_scales[:, None])
    want1 = gather_dequant_xla(ar, ar_scales, jnp.asarray(ar_slots))
    want2 = (jnp.take(so, jnp.asarray(so_slots), axis=0).astype(jnp.float32)
             * so_scales[:, None])
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(want1))
    np.testing.assert_array_equal(np.asarray(outs[2]), np.asarray(want2))

    # the one-dispatch flat path gives the same rows, table-major flattened
    slots_cat, sb, scin_cat, cb = pack_host_args(slots_l, scin_l)
    slices = (
        (0, 0, 8), (0, 8, 8),   # two onehot members as two tables
        (1, 0, 12),
        (2, 0, 10),
    )
    flat = lookup_flat_jit(
        vals, dscales, jnp.asarray(slots_cat),
        None if scin_cat is None else jnp.asarray(scin_cat),
        meta, sb, cb, slices)
    want_flat = jnp.concatenate([
        want0[:8].reshape(-1), want0[8:].reshape(-1),
        want1.reshape(-1), want2.reshape(-1)])
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(want_flat))
