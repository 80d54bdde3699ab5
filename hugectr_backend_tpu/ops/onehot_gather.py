"""MXU one-hot matmul gather for SMALL embedding tables.

Replaces per-access HBM gathers (the reference's GPU-cache gather, engine-side
``lookup`` behind reference model_instance_state.cpp:194) for tables small
enough that a block-diagonal one-hot matmul is cheaper than random access.

WHY: v5e random gather is per-access latency bound (~12-22 ns/row, see
ops/dequant_gather.py's cost model) with no SparseCore to hide it. The MXU,
by contrast, reads the table SEQUENTIALLY: looking a key up in a table of R
rows as ``onehot(slot) @ table`` costs 2*R*D flops ~= R * 1.3 ps at bf16 —
for R <= ~8k rows that undercuts the 12 ns random access. The win compounds
because many recsys tables are tiny (16 of the 26 Criteo-Kaggle tables have
< 6k rows).

DESIGN (one kernel for ALL small tables — per-op overhead is ~50 us, so
per-table kernels would lose the win):
- Tables live concatenated in one arena, each member padded to R_TILE rows
  and R_TILE-aligned (its default/miss row is inside its range, so misses
  need no masking — same invariant as tiers/hbm.py).
- Keys arrive per-table-contiguous, each segment a multiple of M_TILE.
- A host-side PLAN flattens the block-diagonal structure into a work list:
  one grid step per (key-tile, row-tile-of-that-table) pair, exactly like a
  block-sparse matmul. Scalar-prefetched arrays drive the index maps; a
  first-flag selects init-vs-accumulate on the revisited output block.
- In each step: build ``mask[m, r] = (slot[m] == global_row r)`` in VMEM,
  dot the bf16 mask with the bf16-converted int8 tile on the MXU
  (EXACT: int8 values are exact in bf16; each output row sums one nonzero
  product in f32), and accumulate the per-key dequant scale as a masked f32
  VPU reduction over the scales tile. Final output = rows * scales, fused by
  XLA outside the kernel. Bit-identical to tiers/hbm.py gather_dequant_xla.

MEASURED (v5e, 16 tiny Criteo tables x batch 4096, zipf keys, scan-serialized
— scripts/microbench_onehot.py): XLA gather 1163-1200 us/batch (18.3 ns/row);
this kernel 808 us at (m_tile=4096, r_tile=1024) -> 1.45x. The kernel is
VPU-bound on mask generation (~N * sum(R_pad) compare+convert element ops),
not MXU- or HBM-bound, so it overlaps poorly with itself but leaves HBM free.

HAZARD (hit in practice, kept as a guard): a 1-sublane f32 scales block
(1, r_tile) MISCOMPILED for r_tile >= 1024 depending on what else had been
compiled in the process — every scalar-prefetched index map collapsed to
block 0 (only global tile 0 was read; everything else returned zeros). The
scales input is therefore replicated to 8 sublanes so every block in the
kernel is tile-aligned, and ``verify_onehot_path`` offers a cheap build-time
device check callers use to fall back to the XLA gather if the compiled
kernel is ever wrong.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TILE = 512   # default keys per work-list row block
R_TILE = 512   # default table rows per work-list column block

# Tables with padded rows above this are cheaper via random-access gather
# (crossover: 2*R*D flops/key at ~197 bf16 TFLOP/s vs ~12 ns/row access).
DEFAULT_MAX_ROWS = 8192


@dataclasses.dataclass(frozen=True)
class OnehotPlan:
    """Host-side work list for one arena-wide block-diagonal gather."""

    kt: np.ndarray     # [S] int32: output/slot key-tile index per step
    rt: np.ndarray     # [S] int32: table row-tile index per step
    first: np.ndarray  # [S] int32: 1 on the first step of each key tile
    num_key_tiles: int
    m_tile: int = M_TILE
    r_tile: int = R_TILE

    @property
    def steps(self) -> int:
        return int(self.kt.shape[0])


def plan_onehot_worklist(
    member_row_tiles: "list[tuple[int, int]]",
    keys_per_member: "list[int]",
    m_tile: int = M_TILE,
    r_tile: int = R_TILE,
) -> OnehotPlan:
    """Build the work list.

    member_row_tiles: per member, (first_row_tile, num_row_tiles) in the
        arena's R_TILE-tile coordinates.
    keys_per_member: number of query slots per member (each a multiple of
        M_TILE); slots are laid out per-member-contiguously.
    """
    kt, rt, first = [], [], []
    key_tile = 0
    for (tile0, ntiles), nkeys in zip(member_row_tiles, keys_per_member,
                                      strict=True):
        if nkeys % m_tile:
            raise ValueError(f"keys per member must be a multiple of {m_tile}")
        if ntiles <= 0:
            raise ValueError("member must span at least one row tile")
        for _ in range(nkeys // m_tile):
            for j in range(ntiles):
                kt.append(key_tile)
                rt.append(tile0 + j)
                first.append(1 if j == 0 else 0)
            key_tile += 1
    return OnehotPlan(
        kt=np.asarray(kt, np.int32),
        rt=np.asarray(rt, np.int32),
        first=np.asarray(first, np.int32),
        num_key_tiles=key_tile,
        m_tile=m_tile,
        r_tile=r_tile,
    )


def _masked_part(slots_ref, table_ref, rt_smem, s, m_tile, r_tile):
    """Shared kernel body for both one-hot kernels: the key-tile mask and
    the dtype-dispatched MXU contraction (bf16 mask x bf16 table is EXACT
    for int8/bf16 arenas; fp32 arenas must stay f32 end-to-end or the
    advertised bit-identity with gather_dequant_xla breaks)."""
    r0 = rt_smem[s] * r_tile
    iota = jax.lax.broadcasted_iota(jnp.int32, (m_tile, r_tile), 1)
    mask = slots_ref[...] == (r0 + iota)  # [M, R] bool, slots broadcast
    if table_ref.dtype == jnp.float32:
        part = jax.lax.dot_general(
            mask.astype(jnp.float32),
            table_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        part = jax.lax.dot_general(
            mask.astype(jnp.bfloat16),
            table_ref[...].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return mask, part


def _onehot_kernel(
    kt_smem, rt_smem, first_smem,  # scalar-prefetched plan arrays
    slots_ref,   # [m_tile, 1] int32 (block of [N, 1])
    table_ref,   # [r_tile, D] int8/bf16/f32 (block of [R_pad, D])
    scales_ref,  # [8, r_tile] f32 (block of [8, R_pad], sublane-replicated)
    rows_ref,    # out [m_tile, D] f32
    svec_ref,    # out [m_tile, 1] f32
    *,
    m_tile: int,
    r_tile: int,
):
    s = pl.program_id(0)
    mask, part = _masked_part(slots_ref, table_ref, rt_smem, s, m_tile,
                              r_tile)
    spart = jnp.sum(
        jnp.where(mask, scales_ref[0:1, :], 0.0), axis=1, keepdims=True
    )

    @pl.when(first_smem[s] == 1)
    def _init():
        rows_ref[...] = part
        svec_ref[...] = spart

    @pl.when(first_smem[s] == 0)
    def _acc():
        rows_ref[...] += part
        svec_ref[...] += spart


@functools.partial(
    jax.jit,
    static_argnames=("num_key_tiles", "m_tile", "r_tile", "interpret"),
)
def _onehot_gather_raw(
    values, scales8, slots2d, kt, rt, first, num_key_tiles,
    m_tile=M_TILE, r_tile=R_TILE, interpret=False,
):
    d = values.shape[1]
    steps = kt.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m_tile, 1), lambda s, kt, rt, first: (kt[s], 0)),
            pl.BlockSpec((r_tile, d), lambda s, kt, rt, first: (rt[s], 0)),
            # 8 sublanes, NOT 1: see the module-docstring miscompile hazard.
            pl.BlockSpec((8, r_tile), lambda s, kt, rt, first: (0, rt[s])),
        ],
        out_specs=[
            pl.BlockSpec((m_tile, d), lambda s, kt, rt, first: (kt[s], 0)),
            pl.BlockSpec((m_tile, 1), lambda s, kt, rt, first: (kt[s], 0)),
        ],
    )
    n = num_key_tiles * m_tile
    rows, svec = pl.pallas_call(
        functools.partial(_onehot_kernel, m_tile=m_tile, r_tile=r_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * m_tile * r_tile * d,
            bytes_accessed=steps * r_tile * d * values.dtype.itemsize
            + n * d * 4,
            transcendentals=0,
        ),
    )(kt, rt, first, slots2d, values, scales8)
    return rows * svec


def _onehot_rows_kernel(
    kt_smem, rt_smem, first_smem,  # scalar-prefetched plan arrays
    slots_ref,   # [m_tile, 1] int32 (block of [N, 1])
    table_ref,   # [r_tile, D] int8/bf16/f32 (block of [R_pad, D])
    rows_ref,    # out [m_tile, D] f32
    *,
    m_tile: int,
    r_tile: int,
):
    """v2 kernel: rows only — no in-kernel scale reduction (the caller
    multiplies by host-gathered per-key scales outside, where XLA fuses it).
    Measured on v5e: dropping the masked scale sum + svec output cuts ~30%
    off the v1 kernel's VPU-bound cost."""
    s = pl.program_id(0)
    _, part = _masked_part(slots_ref, table_ref, rt_smem, s, m_tile, r_tile)

    @pl.when(first_smem[s] == 1)
    def _init():
        rows_ref[...] = part

    @pl.when(first_smem[s] == 0)
    def _acc():
        rows_ref[...] += part


@functools.partial(
    jax.jit,
    static_argnames=("num_key_tiles", "m_tile", "r_tile", "interpret"),
)
def _onehot_rows_raw(
    values, slots2d, kt, rt, first, num_key_tiles,
    m_tile=M_TILE, r_tile=R_TILE, interpret=False,
):
    d = values.shape[1]
    steps = kt.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m_tile, 1), lambda s, kt, rt, first: (kt[s], 0)),
            pl.BlockSpec((r_tile, d), lambda s, kt, rt, first: (rt[s], 0)),
        ],
        out_specs=[
            pl.BlockSpec((m_tile, d), lambda s, kt, rt, first: (kt[s], 0)),
        ],
    )
    n = num_key_tiles * m_tile
    (rows,) = pl.pallas_call(
        functools.partial(_onehot_rows_kernel, m_tile=m_tile, r_tile=r_tile),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * m_tile * r_tile * d,
            bytes_accessed=steps * r_tile * d * values.dtype.itemsize
            + n * d * 4,
            transcendentals=0,
        ),
    )(kt, rt, first, slots2d, values)
    return rows


def onehot_gather_rows(
    values: jax.Array,   # [R_pad, D] arena (R_pad % r_tile == 0)
    slots: jax.Array,    # [N] int32 arena-global slots, per-member segments
    plan: OnehotPlan,
    interpret: bool = False,
) -> jax.Array:
    """-> [N, D] f32 rows, bit-identical to values[slots].astype(f32).

    The production v2 path: per-key dequant scales are gathered host-side
    during key translation and multiplied in by the caller (fused by XLA)."""
    if slots.shape[0] != plan.num_key_tiles * plan.m_tile:
        raise ValueError(
            f"slots length {slots.shape[0]} does not match the plan "
            f"({plan.num_key_tiles} x {plan.m_tile} keys) — member keys "
            "would be silently dropped"
        )
    return _onehot_rows_raw(
        values,
        slots.reshape(-1, 1).astype(jnp.int32),
        jnp.asarray(plan.kt),
        jnp.asarray(plan.rt),
        jnp.asarray(plan.first),
        num_key_tiles=plan.num_key_tiles,
        m_tile=plan.m_tile,
        r_tile=plan.r_tile,
        interpret=interpret,
    )


def onehot_gather(
    values: jax.Array,   # [R_pad, D] quantized arena (R_pad % R_TILE == 0)
    scales,              # [R_pad] f32 or None (fp32/bf16 arenas)
    slots: jax.Array,    # [N] int32 arena-global slots, per-member segments
    plan: OnehotPlan,
    interpret: bool = False,
) -> jax.Array:
    """-> [N, D] f32, bit-identical to gather_dequant_xla(values, scales, slots)."""
    if slots.shape[0] != plan.num_key_tiles * plan.m_tile:
        raise ValueError(
            f"slots length {slots.shape[0]} does not match the plan "
            f"({plan.num_key_tiles} x {plan.m_tile} keys) — member keys "
            "would be silently dropped"
        )
    if scales is None:
        scales = jnp.ones((values.shape[0],), jnp.float32)
    scales8 = jnp.broadcast_to(
        scales.reshape(1, -1).astype(jnp.float32), (8, values.shape[0])
    )
    return _onehot_gather_raw(
        values,
        scales8,
        slots.reshape(-1, 1).astype(jnp.int32),
        jnp.asarray(plan.kt),
        jnp.asarray(plan.rt),
        jnp.asarray(plan.first),
        num_key_tiles=plan.num_key_tiles,
        m_tile=plan.m_tile,
        r_tile=plan.r_tile,
        interpret=interpret,
    )


def verify_onehot_path(
    values, scales, plan: OnehotPlan, member_row_tiles, rng_seed: int = 0,
    interpret: bool = False, rows_only: bool = False,
) -> bool:
    """Cheap build-time device check: run the kernel once on random in-range
    slots and compare against the XLA gather. Returns True when bit-identical.

    Callers use this to gate the MXU path at cache-build time and fall back
    to gather_dequant_xla when the compiled kernel is wrong (the
    compile-order-dependent Mosaic hazard in the module docstring)."""
    from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla

    r = np.random.default_rng(rng_seed)
    parts = []
    for (tile0, ntiles), nkeys in zip(
        member_row_tiles, [plan.m_tile] * len(member_row_tiles)
    ):
        base = tile0 * plan.r_tile
        parts.append(base + r.integers(0, ntiles * plan.r_tile, nkeys))
    check_plan = plan_onehot_worklist(
        member_row_tiles, [plan.m_tile] * len(member_row_tiles),
        m_tile=plan.m_tile, r_tile=plan.r_tile,
    )
    slots = jnp.asarray(np.concatenate(parts).astype(np.int32))
    if rows_only:
        got = onehot_gather_rows(values, slots, check_plan,
                                 interpret=interpret)
        want = gather_dequant_xla(values, None, slots)
    else:
        got = onehot_gather(values, scales, slots, check_plan,
                            interpret=interpret)
        want = gather_dequant_xla(values, scales, slots)
    return bool(jnp.all(got == want))
