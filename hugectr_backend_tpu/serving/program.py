"""Fused serving programs: lookup + dense forward as one XLA executable.

The reference composes the sparse HPS backend with a separate dense backend
via a Triton ensemble DAG (reference samples/hps-triton-ensemble/README.md:4-8)
— two engines, a device round-trip between them. On TPU both halves fuse into
ONE jitted program: dequant+gather feeds the dense MLP/interaction directly in
HBM (BASELINE: "Fused single XLA program ... overlapped with dense DNN
forward"), so the embedding result never re-enters host memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache
from hugectr_backend_tpu.config.params import InferenceParams
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla


def make_dlrm_forward(model, keys_per_sample: int):
    """Build the fused (params, table, slots, dense) -> logits program.

    ``slots`` is [B * keys_per_sample] int32 (host-translated); the gather,
    dequant, reshape and the full dense graph compile into a single XLA
    executable, jitted once per batch bucket.
    """

    @jax.jit
    def forward(params, values, scales, slots, scin, dense):
        flat = gather_dequant_xla(values, scales, slots)
        if scin is not None:  # host-gathered per-key scales (solo policy)
            flat = flat * scin[:, None]
        emb = flat.reshape(dense.shape[0], keys_per_sample, flat.shape[-1])
        return model.apply(params, dense, emb)

    return forward


class FusedDlrmServer:
    """Serve DLRM end-to-end against an :class:`EmbeddingCache`.

    One instance per (model, device); thread-safe like a LookupSession. The
    host does key->slot translation; everything else runs on device.
    """

    def __init__(
        self,
        params: InferenceParams,
        cache: EmbeddingCache,
        model,
        model_params,
        table_idx: int = 0,
    ):
        if cache.num_tables <= table_idx:
            raise ValueError("cache does not hold the requested table")
        self.params = params
        self.cache = cache
        self.model = model
        self.model_params = model_params
        self.table_idx = table_idx
        self.keys_per_sample = params.maxnum_catfeature_query_per_table_per_sample[
            table_idx
        ]
        self._forward = make_dlrm_forward(model, self.keys_per_sample)

    def predict(self, keys: np.ndarray, dense: np.ndarray) -> jax.Array:
        """keys [B, keys_per_sample] or flat; dense [B, num_dense]."""
        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        keys = np.asarray(keys, dtype=np.int64).reshape(b * self.keys_per_sample)
        # Translate + operand snapshot pair under one cache-lock hold
        # (arena-aware; see EmbeddingCache.translate_resolve).
        vals, scales, slots, scin = self.cache.translate_resolve(
            self.table_idx, keys)
        return self._forward(
            self.model_params,
            vals,
            scales,
            jnp.asarray(slots),
            None if scin is None else jnp.asarray(scin),
            jnp.asarray(dense),
        )


class FusedMultiTableServer:
    """Generic fused server for models consuming one pooled/stacked embedding
    block per table: gathers every table, reshapes to per-table [B, K_t, D_t]
    and hands the list to ``assemble_fn(model_params, dense, embs)``.

    Specializations below mirror the reference's model families (WDL, DCN —
    reference samples deploy these through TF/TRT ensembles; here the dense
    graph fuses with the lookups into one XLA program).
    """

    def __init__(self, params: InferenceParams, cache: EmbeddingCache,
                 assemble_fn, chunked: bool = False):
        self.params = params
        self.cache = cache
        self.keys_per_sample = list(
            params.maxnum_catfeature_query_per_table_per_sample
        )

        from hugectr_backend_tpu.cache.lookup_program import (
            _unpack_device_args,
            gather_rows_for_groups,
        )

        # use_mixed_precision (reference InferenceParams, backend.cpp:390-517):
        # run the dense forward's matmuls in bf16 on the MXU while params
        # stay f32 — the TPU translation of the reference's FP16 dense path.
        # (``scaler`` is a TRAINING loss-scale knob; accepted and inert for
        # inference, see config/params.py.)
        mp = bool(getattr(params, "use_mixed_precision", False))

        @functools.partial(
            jax.jit,
            static_argnames=("batch", "meta", "slot_bounds", "scin_bounds",
                             "slices"),
        )
        def fwd(vals, dscales, slots_cat, scin_cat, dense, batch: int, meta,
                slot_bounds, scin_bounds, slices):
            slots, scin = _unpack_device_args(
                slots_cat, scin_cat, slot_bounds, scin_bounds
            )
            # Group output row-counts are knowable before the gather runs
            # (one output row per padded slot), so the chunk/fold layout is
            # decided first and folded groups are never looked up at all.
            chunk_plan = (
                self._chunk_plan(slices, {g: int(slots[g].shape[0])
                                          for g in {s[0] for s in slices}})
                if chunked and all(
                    k == 1 and d == slices[0][4] for (_, _, _, k, d) in slices
                )
                else None
            )
            order = None
            if chunk_plan is not None:
                # One feature per table, uniform dim: hand the dense graph
                # the GROUP outputs chunked (EmbParts) so the Pallas
                # interaction assembles z in VMEM — slicing per table would
                # re-materialize each [B, D] block and erase the kernel's
                # win (ROOFLINE.md §6.4). Tables sit at [start, start+B)
                # row blocks of their group's output; blocks are padded to
                # pow2 buckets and groups may carry tail padding, so the
                # block stride comes from the slice starts (chunk_plan).
                from hugectr_backend_tpu.ops.fused_interaction import (
                    EmbParts,
                    is_part_major,
                    part_major_order,
                )

                d = slices[0][4]
                group_shape, fmap = chunk_plan
                fold = self._fold_oh_plan(meta, group_shape, fmap)
                if fold is not None:
                    # Fold the one-hot group into the interaction kernel:
                    # its [n_oh*B, D] rows never materialize in HBM
                    # (measured 208.0 -> 188.8 us on the one-hot +
                    # interaction stage at the headline shape,
                    # bench_artifacts/oh_fused_ab.json). The one-hot
                    # features move to the FRONT of the feature order;
                    # `order` + the top-MLP row permutation keep logits
                    # exact, and fused_dot_interaction_oh falls back to
                    # the identical-math materializing path off-TPU.
                    pi, members, ord_l, fmap_rest, rest_parts = fold
                    g_oh = group_shape[pi][0]
                    stride = group_shape[pi][2]
                    n_oh = len(members)
                    slots_oh = slots[g_oh].reshape(n_oh, stride)[:, :batch]
                    sc = scin[g_oh]
                    scales_oh = (
                        sc.reshape(n_oh, stride)[:, :batch]
                        if sc is not None
                        else jnp.ones((n_oh, batch), jnp.float32)
                    )
                    meta_eff = tuple(
                        ("skip",) if g == g_oh else m
                        for g, m in enumerate(meta)
                    )
                    gouts = gather_rows_for_groups(
                        vals, dscales, slots, scin, meta_eff
                    )
                    parts = [gouts[g].reshape(nblk, stride_, d)
                             for (g, nblk, stride_) in rest_parts]
                    if ord_l != tuple(range(len(fmap))):
                        order = ord_l
                    embs = EmbParts(
                        parts, fmap_rest, batch,
                        oh=(vals[g_oh], slots_oh, scales_oh, members),
                    )
                else:
                    gouts = gather_rows_for_groups(
                        vals, dscales, slots, scin, meta
                    )
                    parts = [gouts[g].reshape(nblk, stride, d)
                             for (g, nblk, stride) in group_shape]
                    if not is_part_major(fmap):
                        # Reorder features part-major: the Pallas
                        # interaction then assembles z with one transpose
                        # per PART instead of one relayout per FEATURE
                        # (measured 213 -> 184 us on the full dense forward
                        # at the headline shape —
                        # bench_artifacts/parts_fm_ab.json). The
                        # assemble_fn compensates by permuting the first
                        # top-MLP kernel rows (exact logits;
                        # ops/fused_interaction.py
                        # permute_dlrm_top_params).
                        o, fmap = part_major_order(fmap)
                        order = tuple(o)
                    embs = EmbParts(parts, fmap, batch)
            elif chunked:
                gouts = gather_rows_for_groups(
                    vals, dscales, slots, scin, meta
                )
                embs = jnp.concatenate(
                    [
                        gouts[g][start : start + cnt].reshape(batch, k, d)
                        for (g, start, cnt, k, d) in slices
                    ],
                    axis=1,
                )
            else:
                gouts = gather_rows_for_groups(
                    vals, dscales, slots, scin, meta
                )
                embs = [
                    gouts[g][start : start + cnt].reshape(batch, k, d)
                    for (g, start, cnt, k, d) in slices
                ]
            call = (
                (lambda: assemble_fn(dense, embs, order))
                if chunked else (lambda: assemble_fn(dense, embs))
            )
            if mp:
                with jax.default_matmul_precision("bfloat16"):
                    return call()
            return call()

        self._fwd = fwd

    @staticmethod
    def _fold_oh_plan(meta, group_shape, fmap):
        """Decide whether (and how) to fold a one-hot lookup group into the
        interaction kernel. -> (part_idx, members, order, fmap_rest,
        rest_parts) or None.

        ``order``: new feature position i holds original feature order[i]
        (the one-hot features first in member order, then the remaining
        features part-major — the layout ops/fused_interaction.py
        ``fused_dot_interaction_oh`` consumes); ``fmap_rest`` re-indexes the
        post-one-hot features onto ``rest_parts`` (group_shape minus the
        folded part). Structural only — kernel eligibility (alignment,
        VMEM, backend) is the ops layer's call, and its fallback computes
        identical math, so folding is always exact. Kill-switch:
        HPS_OH_IN_KERNEL=0."""
        import os

        if os.environ.get("HPS_OH_IN_KERNEL", "1") == "0":
            return None
        oh_parts = [i for i, (g, _n, _s) in enumerate(group_shape)
                    if meta[g][0] == "onehot"]
        if len(oh_parts) != 1:
            return None
        pi = oh_parts[0]
        g, nblk, stride = group_shape[pi]
        _, offs, sizes, pcounts = meta[g]
        members = tuple(zip(offs, sizes))
        if nblk != len(members) or any(pc != stride for pc in pcounts):
            return None
        # Member j must be feature sub j of the part (holds by construction
        # — uniform padded counts — but verify before moving features).
        oh_feats = sorted(
            (t for t in range(len(fmap)) if fmap[t][0] == pi),
            key=lambda t: fmap[t][1],
        )
        if [fmap[t][1] for t in oh_feats] != list(range(len(members))):
            return None
        rest = sorted(
            (t for t in range(len(fmap)) if fmap[t][0] != pi),
            key=lambda t: fmap[t],
        )
        order = tuple(oh_feats + rest)
        rest_parts = tuple(
            gs for i, gs in enumerate(group_shape) if i != pi
        )
        pmap = {
            old: new
            for new, old in enumerate(
                i for i in range(len(group_shape)) if i != pi
            )
        }
        fmap_rest = tuple((pmap[fmap[t][0]], fmap[t][1]) for t in rest)
        return pi, members, order, fmap_rest, rest_parts

    @staticmethod
    def _chunk_plan(slices, group_rows):
        """-> ([(g, nblocks, stride)], fmap) mapping each table to a block
        of its group's output, or None when the layout is not uniformly
        blocked (then the caller falls back to the stacked tensor).

        ``stride`` is the uniform spacing of the slice starts within a
        group (block starts are pow2-padded counts, the group tail may be
        padded further); every start must sit on a stride boundary and the
        group's total rows must divide into whole blocks.
        """
        used = sorted({g for (g, *_r) in slices})
        gpos = {g: i for i, g in enumerate(used)}
        strides = {}
        for g in used:
            starts = sorted(s[1] for s in slices if s[0] == g)
            if len(starts) == 1:
                stride = group_rows[g]
            else:
                diffs = {b - a for a, b in zip(starts, starts[1:])}
                if len(diffs) != 1:
                    return None
                stride = diffs.pop()
            if stride <= 0 or group_rows[g] % stride:
                return None
            if any(s % stride for s in starts):
                return None
            strides[g] = stride
        group_shape = tuple(
            (g, group_rows[g] // strides[g], strides[g]) for g in used
        )
        fmap = tuple(
            (gpos[g], start // strides[g])
            for (g, start, _cnt, _k, _d) in slices
        )
        return group_shape, fmap

    def predict(self, keys_per_table, dense) -> jax.Array:
        """keys_per_table[t]: [B, K_t] (or flat B*K_t); dense [B, Nd].

        The lookups run through the shared production access path
        (cache/lookup_program.py: one-hot MXU for tiny tables, arena gather
        with fused device scales, solo gather with host-side scales) and
        compile INTO the dense forward — one XLA program end to end.
        """
        dense = np.asarray(dense, dtype=np.float32)
        b = dense.shape[0]
        cache = self.cache
        counts, local_slots = [], []
        with cache._lock:
            for t, keys in enumerate(keys_per_table):
                keys = np.asarray(keys, dtype=np.int64).reshape(
                    b * self.keys_per_sample[t]
                )
                local_slots.append(cache.translate(t, keys))
                counts.append(keys.shape[0])
            vals, dscales, slots, scin, meta, table_pos = cache.prepare_lookup(
                counts, local_slots
            )
        from hugectr_backend_tpu.cache.lookup_program import pack_host_args

        slices = tuple(
            (
                table_pos[t][0],
                table_pos[t][1],
                counts[t],
                self.keys_per_sample[t],
                cache.tables[t].dim,
            )
            for t in range(len(cache.tables))
        )
        slots_cat, sb, scin_cat, cb = pack_host_args(slots, scin)
        return self._fwd(
            vals,
            dscales,
            jnp.asarray(slots_cat),
            None if scin_cat is None else jnp.asarray(scin_cat),
            jnp.asarray(dense),
            batch=b,
            meta=meta,
            slot_bounds=sb,
            scin_bounds=cb,
            slices=slices,
        )


def make_wdl_server(params, cache, model, model_params):
    """WDL: table 0 = wide (vecsize 1), table 1 = deep (reference WDL demo
    config, SURVEY §6: 2 tables, vecsize [1, 16])."""

    def assemble(dense, embs):
        return model.apply(model_params, dense, embs[0], embs[1])

    return FusedMultiTableServer(params, cache, assemble)


def make_dcn_server(params, cache, model, model_params):
    """DCN-v2: all tables stacked on the feature axis (equal dims)."""

    def assemble(dense, embs):
        emb = jnp.concatenate(embs, axis=1)  # [B, sum K_t, D]
        return model.apply(model_params, dense, emb)

    return FusedMultiTableServer(params, cache, assemble)


def make_deepfm_server(params, cache, model, model_params):
    """DeepFM: table 0 = first-order weights (vecsize 1), table 1 =
    second-order/deep embeddings (shared weights — the defining DeepFM
    structure; models/deepfm.py)."""

    def assemble(dense, embs):
        return model.apply(model_params, dense, embs[0], embs[1])

    return FusedMultiTableServer(params, cache, assemble)


def make_xdeepfm_server(params, cache, model, model_params):
    """xDeepFM: all tables stacked on the feature axis (equal dims) — the
    CIN + deep MLP share one embedding set (models/xdeepfm.py)."""

    def assemble(dense, embs):
        emb = jnp.concatenate(embs, axis=1)  # [B, sum K_t, D]
        return model.apply(model_params, dense, emb)

    return FusedMultiTableServer(params, cache, assemble)


def make_ncf_server(params, cache, model, model_params):
    """NCF/NeuMF: table 0 = users, table 1 = items, one key each
    (models/ncf.py)."""

    def assemble(dense, embs):
        return model.apply(model_params, dense, embs[0], embs[1])

    return FusedMultiTableServer(params, cache, assemble)


def make_dlrm_multi_server(params, cache, model, model_params):
    """DLRM over many tables, one categorical feature per table (the Criteo
    layout — 26 tables x 1 key). The dense graph receives the lookup
    outputs CHUNKED (EmbParts: one-hot block, arena block, solo tables) so
    the Pallas interaction assembles z in VMEM instead of paying the
    [B, T, D] stack materialization (ROOFLINE.md §6.4: fused DLRM
    922.5 us chunked vs 1072 us stacked at the headline shape). Models
    with K_t > 1 or mixed dims fall back to the stacked tensor."""

    from hugectr_backend_tpu.ops.fused_interaction import (
        permute_dlrm_top_params,
    )

    @functools.lru_cache(maxsize=8)
    def _permuted(order):
        return permute_dlrm_top_params(
            model_params, order, model.bottom_widths[-1]
        )

    def assemble(dense, emb, order=None):
        mp = model_params if order is None else _permuted(order)
        return model.apply(mp, dense, emb)

    return FusedMultiTableServer(params, cache, assemble, chunked=True)


def make_mmoe_server(params, cache, model, model_params):
    """MMoE: all tables stacked on the feature axis (equal dims); the
    fused program returns [B, num_tasks] logits (models/mmoe.py)."""

    def assemble(dense, embs):
        emb = jnp.concatenate(embs, axis=1)  # [B, sum K_t, D]
        return model.apply(model_params, dense, emb)

    return FusedMultiTableServer(params, cache, assemble)
