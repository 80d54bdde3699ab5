"""Row-sharded embedding tables with ICI-collective lookup.

Replaces the reference's *distributed* volatile database (tables partitioned
across a Redis cluster by key low bits, queried over the network —
reference docs/architecture.md:131-137, docs/hierarchical_parameter_server.md
:423-458) with tables row-sharded across a TPU mesh's aggregate HBM, looked
up inside one ``shard_map`` program with XLA collectives over ICI.

Two lookup strategies (both return replicated [N, D] f32 results):

- ``all_to_all`` (production serving default): the host — which translates
  keys to slots anyway — DEDUPS the batch and routes each unique slot to its
  owner shard's bucket; each shard gathers only the rows it owns, the
  deduped row blocks ride one ``all_gather`` over ICI, and a cheap local
  take expands back to request order. Host bucketing makes the bucket
  capacity exact per batch (pow2-bucketed to bound retraces), so there is NO
  capacity-overflow correctness hazard, and hot duplicate keys cost one row
  each.
- ``psum``: every shard gathers the full replicated slot vector (non-owned
  slots contribute identity 0 rows) and partials are ``psum``-ed. No host
  involvement — the right strategy INSIDE a fused/jitted training step where
  the host cannot intervene per batch. Immune to skew, but the full [N, D]
  matrix rides the reduction.

Row placement is INTERLEAVED (owner = slot % n_shards; local row =
slot // n_shards — the reference's key-low-bits partitioning,
docs/architecture.md:131): slot order follows sorted KEY order, so ANY key
distribution spreads its unique slots near-uniformly over shards. Round-2
used contiguous range placement, and a zipf(1.05) batch piled ~60% of its
unique slots onto shard 0 — the pow2 bucket capacity hit 2048 instead of
~512 at P=8, quadrupling the a2a exchange
(bench_artifacts/scaling_cpu_mesh.json measured that regression; the fix
restores the balanced math below).

ICI traffic per chip, N=4096 keys, D=128 f32, n=8 shards, zipf(1.05) batch
(~20% duplicate keys -> ~3.3k unique, balanced buckets -> cap pow2 512):

    psum:        ~2 (n-1)/n N D 4B  = 3.7 MB  (ring all-reduce, any batch)
    all_to_all:  (n-1) cap D 4B     = 1.8 MB  + 16 KB replicated buckets

i.e. ~2x less ICI traffic at n=8, scaling as unique/n (vs N for psum)
with shard count, plus an 8x smaller local gather per shard. Worst-case skew
(every unique slot owned by one shard — impossible under interleaving
unless the slots are arithmetically strided by n_shards) degrades capacity
to ~unique, making all_to_all's traffic equal psum's — never worse, and the
host could detect it per batch and pick psum.

The reference's Redis partitioning suffers hot-PARTITION imbalance (hot keys
hash to one node and each duplicate costs an RPC). Here hot duplicates cost
one row (dedup), and residual imbalance only shifts the local gather size.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hugectr_backend_tpu.tiers.hbm import KeyIndex


@dataclasses.dataclass
class ShardedTable:
    """One embedding table row-sharded over the mesh ``table`` axis.

    ``values`` is the global [R_pad, D] array with sharding P("table", None);
    each chip physically holds R_pad/n_shards rows in its HBM — the
    INTERLEAVED subset {s : s % n_shards == k} stored contiguously.
    Slot semantics match DeviceTable: ``index`` maps keys -> global slots;
    missing keys -> slot R_pad-? No: misses map to ``miss_slot`` which lands
    in the LAST shard's final row (a dedicated default row).
    """

    values: jax.Array  # [R_pad, D] sharded P("table", None)
    scales: Optional[jax.Array]  # [R_pad] sharded P("table")
    index: KeyIndex
    mesh: Mesh
    dim: int
    quant: str
    rows_padded: int

    @classmethod
    def from_numpy(
        cls,
        keys: np.ndarray,
        vectors: np.ndarray,
        mesh: Mesh,
        quant: str = "int8",
        default_value: float = 0.0,
    ) -> "ShardedTable":
        from hugectr_backend_tpu.ops.quantize import quantize_rows_int8

        vectors = np.asarray(vectors, dtype=np.float32)
        index, order = KeyIndex.build(keys)
        vectors = vectors[order]
        n, dim = vectors.shape
        # The shard axis: "table" when the mesh has one (the library
        # convention, incl. multi-axis tp x dp meshes), else the mesh's
        # single axis (the config path names it ps.json's table_shard_axis —
        # parallel/sharded_cache.py builds that mesh 1-axis).
        if "table" in mesh.axis_names:
            axis = "table"
        elif len(mesh.axis_names) == 1:
            axis = mesh.axis_names[0]
        else:
            raise ValueError(
                f"cannot infer the shard axis from mesh axes "
                f"{mesh.axis_names}; name one of them 'table'"
            )
        n_shards = mesh.shape[axis]
        # Pad so that (rows + 1 default row) divides evenly over shards.
        r_pad = -((n + 1) // -n_shards) * n_shards
        pad_rows = r_pad - n

        if quant == "int8":
            q, s = quantize_rows_int8(vectors)
            vals = np.concatenate(
                [q, np.zeros((pad_rows, dim), np.int8)]
            )
            scales = np.concatenate([s, np.ones(pad_rows, np.float32)])
        elif quant == "int4":
            # Nibble-packed rows ([R, D//2] uint8) — the natural flavor for
            # the sharded capacity path (2x int8's rows per shard HBM byte;
            # the shard_map gathers unpack on-device, see _rows_to_f32).
            from hugectr_backend_tpu.ops.quantize import quantize_rows_int4

            q, s = quantize_rows_int4(vectors)
            vals = np.concatenate(
                [q, np.zeros((pad_rows, dim // 2), np.uint8)]
            )
            scales = np.concatenate([s, np.ones(pad_rows, np.float32)])
        elif quant in ("fp32", "bf16"):
            dt = np.float32 if quant == "fp32" else jnp.bfloat16
            vals = np.concatenate(
                [vectors, np.full((pad_rows, dim), default_value, np.float32)]
            ).astype(dt)
            scales = None
        else:
            raise ValueError(f"unsupported quant {quant!r} for sharded tables")
        if quant in ("int8", "int4") and default_value != 0.0:
            raise NotImplementedError(
                f"sharded {quant} tables currently support default_value 0.0"
            )

        # Interleaved placement: logical slot s lives at physical position
        # (s % n_shards) * shard_rows + s // n_shards, so the contiguous
        # XLA sharding below gives shard k exactly the slots with
        # s % n_shards == k (reference key-low-bits partitioning) — balanced
        # buckets under any key distribution.
        shard_rows = r_pad // n_shards
        s_all = np.arange(r_pad)
        phys_pos = (s_all % n_shards) * shard_rows + s_all // n_shards
        inv = np.empty(r_pad, np.int64)
        inv[phys_pos] = s_all
        vals = vals[inv]
        if scales is not None:
            scales = scales[inv]

        vsharding = NamedSharding(mesh, P(axis, None))
        ssharding = NamedSharding(mesh, P(axis))
        table = cls(
            values=jax.device_put(vals, vsharding),
            scales=jax.device_put(scales, ssharding) if scales is not None else None,
            index=index,
            mesh=mesh,
            dim=dim,
            quant=quant,
            rows_padded=r_pad,
        )
        # Misses land on the first padding row (all default_value).
        table.index.miss_slot = n
        return table

    def slots_for(self, keys: np.ndarray) -> np.ndarray:
        return self.index.lookup(keys)

    @property
    def capacity(self) -> int:
        """Resident-row count (DeviceTable-compatible; the serving batcher
        keys its pow2 bucket grid off this)."""
        return self.index.capacity

    @property
    def shard_axis(self) -> str:
        return ("table" if "table" in self.mesh.axis_names
                else self.mesh.axis_names[0])

    def nbytes_per_shard(self) -> int:
        n_shards = self.mesh.shape[self.shard_axis]
        n = self.values.size * self.values.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * self.scales.dtype.itemsize
        return int(n // n_shards)


def _rows_to_f32(rows: jax.Array) -> jax.Array:
    """Gathered rows -> f32, unpacking nibble-packed int4 (uint8 storage)."""
    if rows.dtype == jnp.uint8:
        from hugectr_backend_tpu.tiers.hbm import _unpack_int4_device

        return _unpack_int4_device(rows)
    return rows.astype(jnp.float32)


def _lookup_shardmap(mesh: Mesh, has_scales: bool, rows_padded: int,
                     axis: str = "table"):
    """Build the shard_map psum-lookup: (values, scales, slots) -> [N, D]."""
    n_shards = mesh.shape[axis]
    shard_rows = rows_padded // n_shards

    def gather_local(values_l, scales_l, slots):
        # values_l: [shard_rows, D] local block; slots: [N] replicated
        # LOGICAL slots. Interleaved placement: shard k owns slots with
        # slot % n_shards == k at local row slot // n_shards.
        shard_id = jax.lax.axis_index(axis)
        mine = (slots % n_shards) == shard_id
        local = slots // n_shards
        mine = mine & (local < shard_rows)
        safe = jnp.where(mine, local, 0)
        rows = _rows_to_f32(jnp.take(values_l, safe, axis=0))
        if scales_l is not None:
            rows = rows * jnp.take(scales_l, safe)[:, None]
        rows = jnp.where(mine[:, None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    if has_scales:
        in_specs = (P(axis, None), P(axis), P())
        fn = gather_local
    else:
        in_specs = (P(axis, None), P())
        fn = lambda v, s: gather_local(v, None, s)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P())


@functools.lru_cache(maxsize=64)
def _cached_lookup(mesh: Mesh, has_scales: bool, rows_padded: int,
                   axis: str = "table"):
    fn = _lookup_shardmap(mesh, has_scales, rows_padded, axis=axis)
    return jax.jit(fn)


# One pow2-bucket utility for the whole package: the batcher's merge grid
# and the a2a capacity grid must never drift apart.
from hugectr_backend_tpu.cache.embedding_cache import _bucket as _bucket_pow2  # noqa: E402,E501


def plan_all_to_all(
    slots: np.ndarray, n_shards: int, shard_rows: int, min_capacity: int = 8
) -> "tuple[np.ndarray, np.ndarray]":
    """Host-side routing plan for the all_to_all strategy.

    Dedups ``slots`` and buckets each unique slot to its owner shard
    (owner = slot % n_shards; local row = slot // n_shards under the
    interleaved placement — balanced buckets for any key distribution).

    -> (buckets [n_shards, cap] int32 LOCAL row indices, zero-padded;
        expand  [N] int32 indices into the flattened [n_shards*cap] gathered
        rows restoring request order, duplicates included).

    ``cap`` is the pow2 bucket of the max per-owner unique count — exact for
    this batch, so no overflow hazard exists; retraces are bounded by the
    pow2 grid.
    """
    slots = np.asarray(slots, dtype=np.int64).reshape(-1)
    if slots.size and (
        int(slots.max()) >= n_shards * shard_rows or int(slots.min()) < 0
    ):
        # Out-of-range slots would be silently CLAMPED by the device
        # gather (a wrong embedding, no error) — and the psum strategy
        # masks the same slot to zeros; range-check here so the two
        # strategies cannot silently disagree.
        raise ValueError(
            f"slot out of range [0, {n_shards * shard_rows}) in "
            "all_to_all routing plan"
        )
    # Native O(n) hash dedup (first-seen order — the plan below is
    # order-independent); np.unique's sort cost ~4.6 ms on a 26k-key merged
    # batch, which would dominate the routed lookup itself.
    from hugectr_backend_tpu.tiers.hbm import dedup_int64

    uniq, inv = dedup_int64(slots)
    owner = uniq % n_shards
    counts = np.bincount(owner, minlength=n_shards)
    cap = _bucket_pow2(max(int(counts.max()), 1), min_capacity)
    order = np.argsort(owner, kind="stable")
    start = np.concatenate([[0], np.cumsum(counts)])
    within = np.empty(uniq.shape[0], np.int64)
    within[order] = np.arange(uniq.shape[0]) - start[owner[order]]
    buckets = np.zeros((n_shards, cap), np.int32)
    buckets[owner, within] = (uniq // n_shards).astype(np.int32)
    expand = (owner * cap + within)[inv].astype(np.int32)
    return buckets, expand


def _a2a_shardmap(mesh: Mesh, has_scales: bool, axis: str = "table"):
    """Build the all_to_all-lookup: (values, [scales,] buckets, expand) ->
    replicated [N, D] f32. Each shard gathers its own deduped bucket; the
    row blocks ride ONE all_gather over ICI; a local take expands back.
    Shape-polymorphic over the bucket capacity (jit retraces per cap)."""

    def gather_exchange(values_l, scales_l, buckets, expand):
        o = jax.lax.axis_index(axis)
        mine = jax.lax.dynamic_index_in_dim(buckets, o, axis=0,
                                            keepdims=False)  # [cap]
        rows = _rows_to_f32(jnp.take(values_l, mine, axis=0))
        if scales_l is not None:
            rows = rows * jnp.take(scales_l, mine)[:, None]
        allr = jax.lax.all_gather(rows, axis, axis=0)  # [n, cap, D]
        return jnp.take(allr.reshape(-1, rows.shape[-1]), expand, axis=0)

    if has_scales:
        in_specs = (P(axis, None), P(axis), P(), P())
        fn = gather_exchange
    else:
        in_specs = (P(axis, None), P(), P())
        fn = lambda v, b, e: gather_exchange(v, None, b, e)
    # check_vma=False: each shard picks ITS bucket via axis_index, so the
    # checker can't statically prove the post-all_gather output is
    # replicated — it is (every shard computes the identical expand over the
    # identical gathered blocks).
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
                         check_vma=False)


@functools.lru_cache(maxsize=64)
def _cached_a2a(mesh: Mesh, has_scales: bool, axis: str = "table"):
    return jax.jit(_a2a_shardmap(mesh, has_scales, axis=axis))


def sharded_lookup(
    table: ShardedTable, slots, strategy: str = "psum"
) -> jax.Array:
    """Replicated [N, D] float32 lookup across the mesh.

    ``strategy``:
    - "psum" (default, host-free: safe inside jitted steps)
    - "all_to_all" (serving production path: host dedup + bucket routing;
      ``slots`` must be host-resident — it IS, coming from key translation)
    """
    axis = table.shard_axis
    if strategy == "all_to_all":
        n_shards = table.mesh.shape[axis]
        shard_rows = table.rows_padded // n_shards
        buckets, expand = plan_all_to_all(
            np.asarray(slots), n_shards, shard_rows
        )
        fn = _cached_a2a(table.mesh, table.scales is not None, axis)
        if table.scales is not None:
            return fn(table.values, table.scales, jnp.asarray(buckets),
                      jnp.asarray(expand))
        return fn(table.values, jnp.asarray(buckets), jnp.asarray(expand))
    if strategy != "psum":
        raise ValueError(f"unknown sharded lookup strategy {strategy!r}")
    fn = _cached_lookup(table.mesh, table.scales is not None,
                        table.rows_padded, axis)
    if table.scales is not None:
        return fn(table.values, table.scales, slots.astype(jnp.int32))
    return fn(table.values, slots.astype(jnp.int32))
