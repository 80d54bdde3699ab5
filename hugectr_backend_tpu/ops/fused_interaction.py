"""Pallas fused DLRM dot-interaction: einsum + triu extraction in one kernel.

The XLA lowering of DLRM's pairwise interaction (models/dlrm.py
``DotInteraction``) materializes the full ``zzt = z @ z^T`` [B, F, F] tensor
to HBM and re-reads it for the upper-triangle gather. Measured on v5e at
batch 4096 / F=27 / D=128 (bench_artifacts/interaction_variants.json): the
einsum alone is 22.6 us (memory roofline) but einsum+extraction is 90.6 us —
the extraction pays a full HBM round-trip of the [B, 729] intermediate plus
a gather that the MXU cannot absorb. ROOFLINE.md §6.2 names the fused Pallas
kernel as the one remaining lever (expected <=50 us back).

This kernel blocks over the batch; per block it
  1. stacks ``z = [bottom; emb]`` in VMEM (never materialized to HBM),
  2. computes ``zzt`` with a batched MXU contraction (bf16 passes, f32
     accumulation — identical precision semantics to XLA's default f32
     matmul lowering on TPU),
  3. writes ``concat([bottom, triu(zzt, k=1)])`` straight from VMEM with
     26 static lane-slices (no gather, no HBM intermediate).

HBM traffic: read bottom+emb once, write [B, D+P] once — the [B, F, F]
intermediate and the separate z concat buffer disappear entirely.

Gradients: serving never differentiates this op, but the training-style
multi-chip dryrun does; a ``jax.custom_vjp`` supplies an XLA backward
(scatter into the symmetric zzt adjoint), so ``jax.grad`` works everywhere.

Reference parity: this is the TPU replacement for the interaction stage the
reference serves through its ensemble's dense backend (reference
samples/hps-triton-ensemble/README.md:1-24); output matches
``DotInteraction`` (models/dlrm.py:58) bit-for-bf16-tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(batch: int) -> int:
    """Power-of-two batch block dividing ``batch``. 256 measured fastest on
    v5e (40.2 us vs 55.4/56.2 at 64/128 for batch 4096 — bench_artifacts/
    pallas_interaction.json); 512 would exceed VMEM with the [bb, F, F]
    intermediate double-buffered."""
    for bb in (256, 128, 64, 32, 16, 8):
        if batch % bb == 0:
            return bb
    return 0


def _eligible(batch: int, dim: int) -> bool:
    """Kernel eligibility: blockable batch AND lane-aligned embedding dim.
    Sub-128 dims produce non-lane-aligned slice stores that Mosaic compiles
    pathologically slowly (observed: a D=32/F=7 instance ground the shared
    remote-compile queue for >40 min on the dev tunnel) — and at those
    shapes the HBM traffic the kernel saves is negligible anyway, so the
    XLA lowering is the right path."""
    return _pick_block(batch) > 0 and dim % 128 == 0


def _kernel(bot_ref, emb_ref, out_ref, *, dim: int, feats: int):
    bot = bot_ref[...]  # [bb, D]
    emb = emb_ref[...]  # [bb, T, D]
    z = jnp.concatenate([bot[:, None, :], emb], axis=1)  # [bb, F, D]
    zb = z.astype(jnp.bfloat16)
    zzt = jax.lax.dot_general(
        zb,
        zb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bb, F, F]
    out_ref[:, :dim] = bot
    off = dim
    for f in range(feats - 1):
        n = feats - 1 - f
        out_ref[:, off : off + n] = zzt[:, f, f + 1 :].astype(out_ref.dtype)
        off += n


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def _fused_pallas(bottom, emb, *, interpret: bool = False, block: int = 0):
    batch, dim = bottom.shape
    feats = emb.shape[1] + 1
    pairs = feats * (feats - 1) // 2
    bb = block or _pick_block(batch)
    grid = (batch // bb,)
    return pl.pallas_call(
        functools.partial(_kernel, dim=dim, feats=feats),
        out_shape=jax.ShapeDtypeStruct((batch, dim + pairs), bottom.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bb, feats - 1, dim),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, dim + pairs), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * feats * feats * dim,
            bytes_accessed=(
                bottom.size * bottom.dtype.itemsize
                + emb.size * emb.dtype.itemsize
                + batch * (dim + pairs) * bottom.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bottom, emb)


def _xla_reference(bottom, emb):
    """The XLA formulation (models/dlrm.py DotInteraction), used for the
    backward pass and as the numerical reference in tests."""
    z = jnp.concatenate([bottom[:, None, :], emb], axis=1)
    zzt = jnp.einsum("bfd,bgd->bfg", z, z, preferred_element_type=jnp.float32)
    f = z.shape[1]
    rows, cols = jnp.triu_indices(f, k=1)
    inter = zzt[:, rows, cols].astype(bottom.dtype)
    return jnp.concatenate([bottom, inter], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dot_interaction(bottom, emb, interpret: bool = False):
    """``concat([bottom, triu(z z^T, k=1)])`` for ``z = [bottom; emb]``.

    bottom [B, D] f32, emb [B, T, D] -> [B, D + (T+1)T/2]. Falls back to the
    XLA formulation when the batch cannot be blocked (not a multiple of 8)
    or the dim is not lane-aligned (see _eligible). Pass ``interpret=True``
    to run the kernel interpreted (CPU tests).
    """
    if not interpret and not _eligible(*bottom.shape):
        return _xla_reference(bottom, emb)
    if _pick_block(bottom.shape[0]) == 0:
        return _xla_reference(bottom, emb)
    return _fused_pallas(bottom, emb, interpret=interpret)


def _fwd(bottom, emb, interpret):
    return fused_dot_interaction(bottom, emb, interpret), (bottom, emb)


def _bwd(interpret, res, g):
    bottom, emb = res
    batch, dim = bottom.shape
    feats = emb.shape[1] + 1
    rows, cols = np.triu_indices(feats, k=1)
    g_bot_direct = g[:, :dim]
    g_pairs = g[:, dim:].astype(jnp.float32)  # [B, P]
    # Adjoint of zzt = z z^T through the triu extraction: scatter each pair
    # gradient to (r, c) AND (c, r) — dz = (dzzt + dzzt^T) @ z collapses to
    # one contraction over the symmetric scatter.
    dzzt = jnp.zeros((batch, feats, feats), jnp.float32)
    dzzt = dzzt.at[:, rows, cols].set(g_pairs)
    dzzt = dzzt + jnp.swapaxes(dzzt, 1, 2)
    z = jnp.concatenate([bottom[:, None, :], emb], axis=1).astype(jnp.float32)
    dz = jnp.einsum("bfg,bgd->bfd", dzzt, z)
    g_bot = g_bot_direct + dz[:, 0, :].astype(bottom.dtype)
    g_emb = dz[:, 1:, :].astype(emb.dtype)
    return g_bot, g_emb


fused_dot_interaction.defvjp(_fwd, _bwd)


# ------------------------------------------------------------- parts variant
#
# The fused serving program's embedding features arrive as CHUNKED lookup
# outputs (one-hot MXU block [n_oh, B, D], arena-gather block [n_ar, B, D],
# solo tables [1, B, D]) — not as one [B, T, D] tensor. Stacking them in HBM
# just to feed the interaction costs a full write+read of the stacked tensor
# plus a layout copy: measured on v5e at batch 4096/T=26/D=128, the Pallas
# kernel goes from -56 us (direct [B,T,D] input, 161 vs 218) to +91 us
# (stack first, 428 vs 336) — the stack materialization erases the win
# (bench_artifacts/pallas_interaction_parts.json). This variant assembles z
# in VMEM straight from the chunks, so the [B, T, D] tensor never exists.


@jax.tree_util.register_pytree_node_class
class EmbParts:
    """Embedding features held as the lookup engine's chunked outputs.

    ``parts[i]`` is [n_i, S_i, D] (feature-major chunks, S_i >= B — the
    lookup engine pads per-table blocks to pow2 buckets); ``feature_map[t]``
    = (part_idx, sub_idx) places each model feature; ``batch`` is the
    logical batch (defaults to parts[0]'s stride). Behaves enough like the
    stacked [B, T, D] tensor (shape/astype) for model code; ``stack()``
    materializes it for the XLA fallback path.

    ``oh`` optionally carries a NOT-YET-COMPUTED one-hot lookup group as
    ``(values, slots, scales, members)``: ``values`` [R_pad, D] arena,
    ``slots``/``scales`` [n_oh, B], ``members`` static ((offset, size), ...)
    with 128-aligned offsets/sizes. These features occupy the FIRST
    ``len(members)`` feature positions (before every ``feature_map`` entry);
    the fused interaction assembles them in-kernel from the VMEM-resident
    arena (``fused_dot_interaction_oh``), so their [n_oh*B, D] rows never
    round-trip HBM. ``astype`` leaves ``oh`` untouched (quantized values and
    f32 scales keep their dtypes; the kernel produces rows in f32).
    """

    def __init__(self, parts, feature_map, batch: "Optional[int]" = None,
                 oh=None):
        self.parts = list(parts)
        self.feature_map = tuple(tuple(x) for x in feature_map)
        if oh is not None:
            v, sl, sc, members = oh
            oh = (v, sl, sc, tuple(tuple(m) for m in members))
        self.oh = oh
        if batch is not None:
            self.batch = int(batch)
        elif self.parts:
            self.batch = int(self.parts[0].shape[1])
        else:
            self.batch = int(oh[1].shape[1])

    @property
    def _dim(self):
        if self.parts:
            return self.parts[0].shape[2]
        return self.oh[0].shape[-1]

    @property
    def _n_oh(self):
        return 0 if self.oh is None else len(self.oh[3])

    @property
    def shape(self):
        return (self.batch, self._n_oh + len(self.feature_map), self._dim)

    @property
    def ndim(self):
        return 3

    @property
    def dtype(self):
        return self.parts[0].dtype if self.parts else jnp.float32

    def astype(self, dt):
        return EmbParts(
            [p.astype(dt) for p in self.parts], self.feature_map, self.batch,
            oh=self.oh,
        )

    def oh_rows(self):
        """[n_oh, B, D] one-hot features materialized the XLA way (exact
        same math as the standalone lookup stage) — the fallback when the
        in-kernel path is ineligible."""
        from hugectr_backend_tpu.cache.lookup_program import (
            onehot_member_rows,
        )

        values, slots, scales, members = self.oh
        return jnp.stack(
            [
                onehot_member_rows(values, off, size, slots[j])
                * scales[j][:, None]
                for j, (off, size) in enumerate(members)
            ]
        )

    def stack(self):
        cols = []
        if self.oh is not None:
            oh = self.oh_rows()
            cols += [oh[j] for j in range(oh.shape[0])]
        cols += [
            self.parts[p][s][: self.batch] for (p, s) in self.feature_map
        ]
        return jnp.stack(cols, axis=1)

    def tree_flatten(self):
        if self.oh is None:
            return tuple(self.parts), (self.feature_map, self.batch, None)
        v, sl, sc, members = self.oh
        return (
            tuple(self.parts) + (v, sl, sc),
            (self.feature_map, self.batch, members),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        fmap, batch, members = aux
        if members is None:
            return cls(children, fmap, batch)
        return cls(
            children[:-3], fmap, batch,
            oh=(children[-3], children[-2], children[-1], members),
        )


def _kernel_parts(*refs, dim: int, feats: int, fmap):
    bot_ref = refs[0]
    part_refs = refs[1:-1]
    out_ref = refs[-1]
    bot = bot_ref[...]  # [bb, D]
    cols = [bot[:, None, :]]
    for p, s in fmap:
        cols.append(part_refs[p][s][:, None, :])  # [bb, 1, D]
    z = jnp.concatenate(cols, axis=1)  # [bb, F, D]
    zb = z.astype(jnp.bfloat16)
    zzt = jax.lax.dot_general(
        zb,
        zb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :dim] = bot
    off = dim
    for f in range(feats - 1):
        n = feats - 1 - f
        out_ref[:, off : off + n] = zzt[:, f, f + 1 :].astype(out_ref.dtype)
        off += n


def _kernel_parts_fm(*refs, dim: int, feats: int):
    """Feature-major z assembly for PART-MAJOR feature maps.

    When the model's feature order is part-major (feature_map ==
    part_major_order(...)[1]), z never needs per-feature interleaving:
    the chunks concatenate along axis 0 into [F, bb, D] (contiguous
    sublane-major copies) and ONE batched contraction with the batch as
    dimension 1 produces the same [bb, F, F] zzt. The 27 per-feature VMEM
    relayouts of the general kernel disappear.
    """
    bot_ref = refs[0]
    part_refs = refs[1:-1]
    out_ref = refs[-1]
    bot = bot_ref[...]  # [bb, D]
    # One major-dims transpose per PART ([n, bb, D] -> [bb, n, D]) instead
    # of the general kernel's per-FEATURE [bb, 1, D] relayouts. (A batch-
    # minor contraction on [F, bb, D] would skip the transpose entirely,
    # but Mosaic requires matmul batch dims at position 0.)
    cols = [bot[:, None, :]]
    for r in part_refs:
        cols.append(jnp.swapaxes(r[...], 0, 1))  # [bb, n_p, D]
    z = jnp.concatenate(cols, axis=1)  # [bb, F, D]
    zb = z.astype(jnp.bfloat16)
    zzt = jax.lax.dot_general(
        zb,
        zb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bb, F, F]
    out_ref[:, :dim] = bot
    off = dim
    for f in range(feats - 1):
        n = feats - 1 - f
        out_ref[:, off : off + n] = zzt[:, f, f + 1 :].astype(out_ref.dtype)
        off += n


def is_part_major(feature_map) -> bool:
    """True when features enumerate parts in order with contiguous subs
    ((0,0),(0,1),...,(1,0),... ) — the order the _fm kernel requires."""
    want_p, want_s = 0, 0
    for p, s in feature_map:
        if p == want_p and s == want_s:
            want_s += 1
            continue
        if p == want_p + 1 and s == 0:
            want_p, want_s = p, 1
            continue
        return False
    return True


def part_major_order(feature_map):
    """-> (order, new_feature_map): ``order[i]`` is the ORIGINAL feature
    index placed at position i when features are sorted part-major. Use
    with :func:`permute_top_mlp_kernel` to serve a checkpoint trained in
    the original order through the cheaper _fm kernel."""
    order = sorted(range(len(feature_map)), key=lambda t: feature_map[t])
    new_map = tuple(feature_map[t] for t in order)
    return order, new_map


def interaction_permutation(order, dim: int):
    """Row permutation for the FIRST top-MLP kernel when the interaction's
    features are reordered by ``order`` (new position i <- original
    order[i]).

    DotInteraction output = [bottom(dim), triu pairs(P)]. Reordering
    features permutes the pair slots; multiplying the permuted output by a
    row-permuted first-layer weight reproduces the original logits
    exactly. Returns indices ``src`` with new_kernel[j] = old_kernel[src[j]]
    for j in [0, dim + P).
    """
    feats = len(order) + 1  # +1 for bottom at z index 0
    rows, cols = np.triu_indices(feats, k=1)
    old_pair_idx = {(int(r), int(c)): k for k, (r, c) in
                    enumerate(zip(rows, cols))}
    # z-index map: new z index 0 is bottom; 1+i holds original 1+order[i].
    zmap = [0] + [1 + t for t in order]
    src = list(range(dim))
    for r, c in zip(rows, cols):
        a, b = zmap[int(r)], zmap[int(c)]
        if a > b:
            a, b = b, a
        src.append(dim + old_pair_idx[(a, b)])
    return np.asarray(src, dtype=np.int64)


def permute_top_mlp_kernel(kernel: np.ndarray, order, dim: int):
    """new_kernel = old_kernel[interaction_permutation(order, dim)] —
    apply to the first top-MLP Dense kernel ([dim+P, width]) so permuted
    interaction outputs produce identical logits."""
    return np.asarray(kernel)[interaction_permutation(order, dim)]


def permute_dlrm_top_params(model_params, order, dim: int):
    """DLRM param tree with the FIRST top-MLP layer's kernel rows permuted
    for ``order``-reordered interaction features (models/dlrm.py layout:
    params/MLP_1/{Dense_0|QuantDense_0}). Weight-only quant layers permute
    ``kernel_q`` rows (scales are per-output-column — row-invariant).
    Logits are exactly preserved; serving uses this to adopt the cheaper
    part-major _fm kernel for checkpoints trained in table order."""
    src = interaction_permutation(order, dim)
    params = dict(model_params)
    inner = dict(params["params"])
    if "MLP_1" not in inner:
        raise ValueError("not a DLRM param tree (no MLP_1 top module)")
    top = dict(inner["MLP_1"])
    for name in ("Dense_0", "QuantDense_0"):
        if name in top:
            layer = dict(top[name])
            key = "kernel" if "kernel" in layer else "kernel_q"
            k = np.asarray(layer[key])
            if k.shape[0] != src.shape[0]:
                raise ValueError(
                    f"top kernel rows {k.shape[0]} != dim+pairs "
                    f"{src.shape[0]} — wrong dim or model shape"
                )
            layer[key] = jnp.asarray(k[src])
            top[name] = layer
            break
    else:
        raise ValueError("MLP_1 has no Dense_0/QuantDense_0 layer")
    inner["MLP_1"] = top
    params["params"] = inner
    return params


@functools.partial(
    jax.jit, static_argnames=("feature_map", "interpret", "block")
)
def _fused_pallas_parts(bottom, parts, *, feature_map, interpret=False,
                        block: int = 0):
    batch, dim = bottom.shape
    feats = len(feature_map) + 1
    pairs = feats * (feats - 1) // 2
    bb = block or _pick_block(batch)
    # Parts may carry UNMAPPED rows (pow2 tail-padded arena blocks from the
    # lookup engine's _chunk_plan, or tables excluded from the interaction).
    # A part-major map references exactly the first `used[p]` rows of each
    # part, so the _fm kernel's BlockSpecs fetch only those — phantom
    # blocks are never DMA'd into VMEM and z stays [bb, feats, D]. A
    # wholly-unmapped part (used == 0: zero-size block) or a non-part-major
    # map takes the general kernel, which addresses parts through the fmap.
    used = [0] * len(parts)
    for p, s in feature_map:
        used[p] = max(used[p], s + 1)
    if is_part_major(feature_map) and all(used):
        kern = functools.partial(_kernel_parts_fm, dim=dim, feats=feats)
        fetch_rows = used
    else:
        kern = functools.partial(
            _kernel_parts, dim=dim, feats=feats, fmap=feature_map
        )
        fetch_rows = [p.shape[0] for p in parts]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((batch, dim + pairs), bottom.dtype),
        grid=(batch // bb,),
        in_specs=[
            pl.BlockSpec((bb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec(
                (rows, bb, dim),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
            for p, rows in zip(parts, fetch_rows)
        ],
        out_specs=pl.BlockSpec(
            (bb, dim + pairs), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * feats * feats * dim,
            bytes_accessed=(
                bottom.size * bottom.dtype.itemsize
                + sum(p.size * p.dtype.itemsize for p in parts)
                + batch * (dim + pairs) * bottom.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bottom, *parts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_dot_interaction_parts(bottom, parts, feature_map,
                                interpret: bool = False):
    """``fused_dot_interaction`` taking chunked features (see EmbParts).

    bottom [B, D]; parts: list of [n_i, B, D]; feature_map[t] =
    (part_idx, sub_idx). Assembles z in VMEM — the stacked [B, T, D]
    never materializes in HBM.
    """
    if (not interpret and not _eligible(*bottom.shape)) or _pick_block(
            bottom.shape[0]) == 0:
        return _xla_reference(
            bottom,
            EmbParts(parts, feature_map, bottom.shape[0])
            .stack().astype(bottom.dtype),
        )
    return _fused_pallas_parts(
        bottom, tuple(parts), feature_map=tuple(map(tuple, feature_map)),
        interpret=interpret,
    )


def _fwd_parts(bottom, parts, feature_map, interpret):
    return (
        fused_dot_interaction_parts(bottom, parts, feature_map, interpret),
        (bottom, parts),
    )


def _bwd_parts(feature_map, interpret, res, g):
    bottom, parts = res
    batch, dim = bottom.shape
    feats = len(feature_map) + 1
    rows, cols = np.triu_indices(feats, k=1)
    g_pairs = g[:, dim:].astype(jnp.float32)
    dzzt = jnp.zeros((batch, feats, feats), jnp.float32)
    dzzt = dzzt.at[:, rows, cols].set(g_pairs)
    dzzt = dzzt + jnp.swapaxes(dzzt, 1, 2)
    emb = EmbParts(parts, feature_map, batch).stack()
    z = jnp.concatenate(
        [bottom[:, None, :], emb], axis=1
    ).astype(jnp.float32)
    dz = jnp.einsum("bfg,bgd->bfd", dzzt, z)
    g_bot = g[:, :dim] + dz[:, 0, :].astype(bottom.dtype)
    # Route each feature's gradient back to its (part, sub) slot; rows past
    # the logical batch (pow2 padding in strided parts) get zero grad.
    g_parts = []
    zero_row = jnp.zeros((batch, dim), jnp.float32)
    for i, p in enumerate(parts):
        subs = {s: t for t, (pi, s) in enumerate(feature_map) if pi == i}
        # Rows of a part that no feature references (e.g. a looked-up table
        # excluded from the interaction) receive zero gradient.
        gp = jnp.stack(
            [dz[:, 1 + subs[s], :] if s in subs else zero_row
             for s in range(p.shape[0])], axis=0
        ).astype(p.dtype)
        if p.shape[1] != batch:
            gp = jnp.zeros_like(p).at[:, :batch].set(gp)
        g_parts.append(gp)
    return g_bot, g_parts


fused_dot_interaction_parts.defvjp(_fwd_parts, _bwd_parts)


# ------------------------------------------------- one-hot-in-kernel variant
#
# EXPERIMENTAL (round 4, VERDICT option b for the composed-fused gap): the
# production fused program runs the one-hot lookup stage as XLA matmuls
# whose [n_oh*B, D] output materializes in HBM before the interaction
# kernel reads it back — a ~2x29 MB round-trip at the headline shape that
# XLA cannot fuse across the pallas_call boundary. This variant assembles
# those features INSIDE the interaction kernel: the (small, VMEM-resident)
# one-hot arena rides in whole, and each feature's row is computed with the
# same exact one-hot MXU contraction the standalone stage uses
# (cache/lookup_program.py onehot_member_rows), scaled by the host-gathered
# per-key scales. Requires 128-aligned member offsets (Mosaic's misaligned
# static-slice hazard — see _eligible); the microbench pads its layout.


def oh_arena_vmem_budget() -> int:
    """Max one-hot arena bytes the in-kernel variant will pin in VMEM
    alongside its batch blocks. The headline Criteo arena is ~1.1 MB
    (8576 padded rows x 128 int8) and measured fine with bb=256
    (bench_artifacts/oh_fused_ab.json); 8 MiB leaves the same headroom
    the standalone kernels keep."""
    import os

    return int(os.environ.get("HPS_OH_ARENA_MAX_BYTES", str(8 << 20)))


def oh_in_kernel_eligible(batch: int, dim: int, members, values) -> bool:
    """Static eligibility for assembling the one-hot group inside the
    interaction kernel: blockable batch, lane-aligned dim, flat (unblocked)
    arena, 128-aligned member offsets/sizes (Mosaic's misaligned
    static-slice hazard — see ``_eligible``), arena small enough to ride
    whole in VMEM, and not nibble-packed int4 (the mask matmul would
    multiply packed bytes). Float32 arenas are ALSO excluded: the kernel
    contracts the one-hot mask in bf16 — exact for int8/bf16/fp8 values,
    but it would round f32 embeddings, while the standalone path
    (onehot_member_rows) keeps them exact with a HIGHEST-precision f32
    matmul; unquantized deployments take the identical-math fallback."""
    return (
        _pick_block(batch) > 0
        and dim % 128 == 0
        and values.ndim == 2
        and values.dtype not in (jnp.uint8, jnp.float32)
        and bool(members)
        and all(off % 128 == 0 and sz % 128 == 0 for off, sz in members)
        and values.size * values.dtype.itemsize <= oh_arena_vmem_budget()
    )


def _kernel_oh_parts(bot_ref, arena_ref, slots_ref, scales_ref, *rest,
                     dim: int, feats: int, members):
    part_refs = rest[:-1]
    out_ref = rest[-1]
    bot = bot_ref[...]  # [bb, D]
    bb = bot.shape[0]
    cols = [bot[:, None, :]]
    for j, (off, size) in enumerate(members):
        seg = arena_ref[off : off + size, :]  # [size, D], off 128-aligned
        local = slots_ref[j, :][:, None] - off  # [bb, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (bb, size), 1)
        mask = (local == iota).astype(jnp.bfloat16)
        row = jax.lax.dot_general(
            mask,
            seg.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scales_ref[j, :][:, None]
        cols.append(row[:, None, :])
    for r in part_refs:
        cols.append(jnp.swapaxes(r[...], 0, 1))
    z = jnp.concatenate(cols, axis=1)  # [bb, F, D]
    zb = z.astype(jnp.bfloat16)
    zzt = jax.lax.dot_general(
        zb, zb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :dim] = bot
    off_o = dim
    for f in range(feats - 1):
        n = feats - 1 - f
        out_ref[:, off_o : off_o + n] = zzt[:, f, f + 1 :].astype(
            out_ref.dtype)
        off_o += n


@functools.partial(
    jax.jit, static_argnames=("members", "interpret", "block", "part_rows")
)
def fused_dot_interaction_oh_parts(bottom, arena, slots, scales, parts,
                                   *, members, interpret=False,
                                   block: int = 0, part_rows=None):
    """Interaction with the one-hot features gathered IN-KERNEL.

    bottom [B, D]; arena [R_pad, D] (small quantized one-hot arena, rides
    whole in VMEM); slots [n_oh, B] int32 arena-global; scales [n_oh, B]
    f32 host-gathered per-key dequant scales; parts: remaining feature
    chunks [n_i, B, D] (part-major after the one-hot features).
    ``members``: per one-hot feature (offset, size), offsets 128-aligned.
    ``part_rows``: rows to fetch per part (defaults to all) — lets the
    caller exclude phantom pow2 tail blocks from padded lookup groups so
    they are never DMA'd into VMEM.
    """
    batch, dim = bottom.shape
    n_oh = len(members)
    fetch = tuple(
        part_rows if part_rows is not None else (p.shape[0] for p in parts)
    )
    feats = 1 + n_oh + sum(fetch)
    pairs = feats * (feats - 1) // 2
    bb = block or _pick_block(batch)
    return pl.pallas_call(
        functools.partial(
            _kernel_oh_parts, dim=dim, feats=feats,
            members=tuple(tuple(m) for m in members),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, dim + pairs), bottom.dtype),
        grid=(batch // bb,),
        in_specs=[
            pl.BlockSpec((bb, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(arena.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_oh, bb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_oh, bb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((rows, bb, dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
            for p, rows in zip(parts, fetch)
        ],
        out_specs=pl.BlockSpec(
            (bb, dim + pairs), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * feats * feats * dim
            + 2 * batch * dim * sum(sz for _, sz in members),
            bytes_accessed=(
                bottom.size * 4 + arena.size * arena.dtype.itemsize
                + sum(
                    rows * batch * dim * p.dtype.itemsize
                    for p, rows in zip(parts, fetch)
                )
                + batch * (dim + pairs) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bottom, arena, slots, scales, *parts)


def fused_dot_interaction_oh(bottom, oh, parts, feature_map,
                             interpret: bool = False):
    """Production dispatcher for the one-hot-in-kernel interaction.

    ``oh`` = (values, slots, scales, members) as carried by
    :class:`EmbParts`; ``feature_map`` places the ``parts`` features AFTER
    the ``len(members)`` one-hot features. When the in-kernel variant is
    eligible (``oh_in_kernel_eligible`` + part-major map), the whole
    one-hot lookup stage folds into the Pallas interaction (measured
    208.0 -> 188.8 us on the one-hot+interaction stage at the headline
    shape, bench_artifacts/oh_fused_ab.json); otherwise the one-hot rows
    materialize via the exact XLA path and the parts kernel (or its XLA
    fallback) takes over — identical math on every path.

    Forward-only: serving never differentiates this op (training-style
    paths use the materializing fallback via ``EmbParts.stack``).
    """
    values, slots, scales, members = oh
    batch, dim = bottom.shape
    n_oh = len(members)
    if slots.shape != (n_oh, batch) or scales.shape != (n_oh, batch):
        raise ValueError(
            f"oh slots/scales must be [n_oh={n_oh}, batch={batch}]; got "
            f"{slots.shape} / {scales.shape}"
        )
    kernel_ok = (
        (interpret or _eligible(batch, dim))
        and _pick_block(batch) > 0
        and oh_in_kernel_eligible(batch, dim, members, values)
        and is_part_major(feature_map)
    )
    if kernel_ok:
        # Fetch only the mapped rows of each part (phantom pow2 tail
        # blocks from padded lookup groups are never DMA'd).
        used = [0] * len(parts)
        for p, s in feature_map:
            used[p] = max(used[p], s + 1)
        if all(used):
            return fused_dot_interaction_oh_parts(
                bottom, values, slots, scales, tuple(parts),
                members=members, interpret=interpret,
                part_rows=tuple(used),
            )
    # Exact fallback: materialize the one-hot rows the standalone-stage way
    # and run the parts path (which itself falls back to XLA when needed).
    ep = EmbParts(parts, feature_map, batch, oh=oh)
    parts2 = [ep.oh_rows().astype(bottom.dtype)] + list(parts)
    fmap2 = tuple(
        [(0, j) for j in range(n_oh)]
        + [(p + 1, s) for (p, s) in feature_map]
    )
    return fused_dot_interaction_parts(bottom, parts2, fmap2, interpret)
