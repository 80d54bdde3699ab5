"""The shared device lookup program: one compiled access path for every
serving surface (EmbeddingCache.lookup, the fused model servers, bench.py).

Replaces the reference engine's CUDA embedding-cache gather kernels (the hot
loop behind reference model_instance_state.cpp:194) with the access-path mix
that is optimal on v5e (slope-timed, scripts/microbench_true.py +
microbench_onehot_v2.py — see tiers/hbm.py DeviceArena docstring):

- "gather": XLA row gather (+ fused device scales gather for small arenas).
  The v5e per-access floor is ~10 ns/row regardless of table size.
- "solo":   XLA row gather with HOST-gathered per-key scales passed as an
  input (device-gathering scales from a >100 MB array costs another
  ~14 ns/access — 60% of big-table lookup time).
- "onehot": MXU one-hot matmul per member table — no per-access gather at
  all. Cost ~2 ps per (key x member row); beats the 10 ns/access gather for
  tables under ~4k rows (14 of the 26 Criteo-Kaggle tables). Pure XLA: the
  measured 221 us/batch on the 16 tiny Criteo tables beats both the Pallas
  one-hot kernels (239-324 us) and the XLA gather (667 us).

All functions here are pure jax (traceable), so fused model programs embed
them directly and the lookup compiles INTO the dense forward.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


def onehot_member_rows(
    values: jax.Array,   # [R_total, D] flat arena
    offset: int,         # static member offset (128-aligned in one-hot arenas)
    size: int,           # static member PHYSICAL rows (ArenaView.block_rows
                         # >= capacity + 1; pad rows are never selected)
    slots: jax.Array,    # [n] int32 arena-global slots for this member
) -> jax.Array:
    """rows = values[slots] via an MXU one-hot matmul (bit-identical to the
    gather for every arena dtype: int8 arenas ride the native s8xs8->s32 MXU
    path (2x bf16 peak; measured 122->107 us/batch on the 14 Criteo one-hot
    tables, scripts/microbench_int8_onehot.py) and the one-hot product is
    exact in int32; fp8/bf16 values are exact in bf16; fp32 arenas use a
    HIGHEST-precision f32 matmul which is exact for one-hot masks)."""
    if values.ndim == 3:
        # Blocked [K, SUB, D] layout (only reachable when tests force a tiny
        # block size): flatten — one-hot arenas are small by construction.
        values = values.reshape(-1, values.shape[-1])
    if values.dtype == jnp.uint8:
        # Nibble-packed int4: the one-hot matmul would multiply PACKED
        # bytes and return half-width garbage. The production grouping
        # policy never routes int4 here (parameter_server.py), but the
        # public build_arena_views(..., quant="int4", lookup_kind="onehot")
        # can — fail loudly instead.
        raise TypeError(
            "one-hot lookup cannot consume nibble-packed int4 arenas; use "
            "the gather path (lookup_kind='arena'/'solo')"
        )
    seg = values[offset : offset + size]
    local = slots - offset
    iota = jax.lax.broadcasted_iota(jnp.int32, (slots.shape[0], size), 1)
    mask = local[:, None] == iota
    if seg.dtype == jnp.float32:
        return jax.lax.dot_general(
            mask.astype(jnp.float32), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if seg.dtype == jnp.int8:
        return jax.lax.dot_general(
            mask.astype(jnp.int8), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    return jax.lax.dot_general(
        mask.astype(jnp.bfloat16), seg.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gather_rows_for_groups(
    vals: Sequence[jax.Array],
    dscales: Sequence[Optional[jax.Array]],
    slots: Sequence[jax.Array],
    scin: Sequence[Optional[jax.Array]],
    meta: tuple,
) -> "list[Optional[jax.Array]]":
    """Pure-jax device lookup over arena groups.

    One entry per group in each parallel list; ``meta[g]`` is a static
    descriptor:

      ("gather",)
          -> gather_dequant_xla(vals, dscales, slots)    [arena kind]
      ("onehot", (offset, ...), (size, ...), (padded_count, ...))
          -> per-member one-hot matmuls, concatenated    [onehot kind]
             (sizes are PHYSICAL member blocks — 128-aligned
             ArenaView.block_rows, >= capacity + 1)
      ("skip",)
          -> None (the caller consumes this group elsewhere; only the
             fused serving program constructs it — "skip" must never
             reach the public jit wrappers below, whose outputs are
             sliced unconditionally)

    ``scin[g]`` (host-gathered per-key scales, or None) multiplies the f32
    rows — the solo/onehot scale path.
    """
    outs = []
    for v, ds, sl, si, m in zip(vals, dscales, slots, scin, meta):
        if m[0] == "skip":
            # The caller consumes this group elsewhere (the fused serving
            # program folds one-hot groups into the interaction kernel —
            # serving/program.py) and must not pay its lookup here.
            outs.append(None)
            continue
        if m[0] == "onehot":
            _, offs, sizes, counts = m
            parts, p = [], 0
            for o, sz, c in zip(offs, sizes, counts):
                parts.append(onehot_member_rows(v, o, sz, sl[p : p + c]))
                p += c
            rows = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        else:
            rows = gather_dequant_xla(v, ds, sl)
        if si is not None:
            rows = rows * si[:, None]
        outs.append(rows)
    return outs


def pack_host_args(slots_l, scin_l):
    """Pack per-group host arrays into ONE slots array + ONE scales array
    (+ static bounds). A remote/tunneled device pays per-transfer overhead;
    two uploads beat ~2 x n_groups. -> (slots_cat, slot_bounds, scin_cat,
    scin_bounds)."""
    import numpy as np

    bounds, off = [], 0
    for a in slots_l:
        bounds.append((off, off + a.shape[0]))
        off += a.shape[0]
    slots_cat = (
        np.concatenate(slots_l) if slots_l else np.zeros(0, np.int32)
    )
    sbounds, off, parts = [], 0, []
    for s in scin_l:
        if s is None:
            sbounds.append(None)
        else:
            sbounds.append((off, off + s.shape[0]))
            off += s.shape[0]
            parts.append(s)
    scin_cat = np.concatenate(parts) if parts else None
    return slots_cat, tuple(bounds), scin_cat, tuple(sbounds)


def _unpack_device_args(slots_cat, scin_cat, slot_bounds, scin_bounds):
    slots = [slots_cat[a:b] for (a, b) in slot_bounds]
    scin = [
        None if ab is None else scin_cat[ab[0] : ab[1]] for ab in scin_bounds
    ]
    return slots, scin


@functools.partial(
    jax.jit, static_argnames=("meta", "slot_bounds", "scin_bounds")
)
def lookup_groups_jit(vals, dscales, slots_cat, scin_cat, meta, slot_bounds,
                      scin_bounds):
    """Jitted standalone wrapper over packed host inputs (retraces per
    (shapes, meta) signature — bounded by the bucket grid)."""
    slots, scin = _unpack_device_args(
        slots_cat, scin_cat, slot_bounds, scin_bounds
    )
    return gather_rows_for_groups(vals, dscales, slots, scin, meta)


@functools.partial(
    jax.jit, static_argnames=("meta", "slot_bounds", "scin_bounds", "slices")
)
def lookup_flat_jit(vals, dscales, slots_cat, scin_cat, meta, slot_bounds,
                    scin_bounds, slices):
    """One program: group lookups + per-table slice + flatten into a single
    f32 vector (table-major, the OUTPUT0 wire layout). With the packed
    inputs this is TWO uploads, one dispatch and one fetch per request —
    the serving hot path. ``slices[t]`` is the static (group, start, count)
    of table t's rows."""
    slots, scin = _unpack_device_args(
        slots_cat, scin_cat, slot_bounds, scin_bounds
    )
    gouts = gather_rows_for_groups(vals, dscales, slots, scin, meta)
    parts = [
        gouts[g][start : start + count].reshape(-1)
        for (g, start, count) in slices
    ]
    return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)
