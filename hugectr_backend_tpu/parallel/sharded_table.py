"""Row-sharded embedding tables with ICI-collective lookup.

Replaces the reference's *distributed* volatile database (tables partitioned
across a Redis cluster by key low bits, queried over the network —
reference docs/architecture.md:131-137, docs/hierarchical_parameter_server.md
:423-458) with tables row-sharded across a TPU mesh's aggregate HBM, looked
up inside one ``shard_map`` program with XLA collectives over ICI.

Two lookup strategies (both return replicated results):

- ``psum``: every shard gathers the slots it owns (others contribute the
  identity 0 rows) and the partials are ``psum``-ed. Traffic: N x D floats
  over ICI regardless of shard count; zero load-imbalance sensitivity; no
  key exchange. Best for moderate N — this is the default.
- ``all_gather``: each chip all-gathers nothing but computes on its local
  rows only after slots are replicated — identical traffic shape to psum on
  a ring; kept for benchmarking comparison.

Skew note: the reference's Redis partitioning suffers hot-partition imbalance
(hot keys all hash to one node). The psum strategy is immune: every chip does
identical work (a local gather of the full slot vector), and hot rows cost
nothing extra.
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
    each chip physically holds R_pad/n_shards contiguous rows in its HBM.
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
        n_shards = mesh.shape["table"]
        # Pad so that (rows + 1 default row) divides evenly over shards.
        r_pad = -((n + 1) // -n_shards) * n_shards
        pad_rows = r_pad - n

        if quant == "int8":
            q, s = quantize_rows_int8(vectors)
            vals = np.concatenate(
                [q, np.zeros((pad_rows, dim), np.int8)]
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
        if quant == "int8" and default_value != 0.0:
            raise NotImplementedError(
                "sharded int8 tables currently support default_value 0.0"
            )

        vsharding = NamedSharding(mesh, P("table", None))
        ssharding = NamedSharding(mesh, P("table"))
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

    def nbytes_per_shard(self) -> int:
        n_shards = self.mesh.shape["table"]
        n = self.values.size * self.values.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * self.scales.dtype.itemsize
        return int(n // n_shards)


def _lookup_shardmap(mesh: Mesh, has_scales: bool, rows_padded: int):
    """Build the shard_map psum-lookup: (values, scales, slots) -> [N, D]."""
    n_shards = mesh.shape["table"]
    shard_rows = rows_padded // n_shards

    def gather_local(values_l, scales_l, slots):
        # values_l: [shard_rows, D] local block; slots: [N] replicated.
        shard_id = jax.lax.axis_index("table")
        base = shard_id * shard_rows
        local = slots - base
        mine = (local >= 0) & (local < shard_rows)
        safe = jnp.where(mine, local, 0)
        rows = jnp.take(values_l, safe, axis=0).astype(jnp.float32)
        if scales_l is not None:
            rows = rows * jnp.take(scales_l, safe)[:, None]
        rows = jnp.where(mine[:, None], rows, 0.0)
        return jax.lax.psum(rows, "table")

    if has_scales:
        in_specs = (P("table", None), P("table"), P())
        fn = gather_local
    else:
        in_specs = (P("table", None), P())
        fn = lambda v, s: gather_local(v, None, s)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P())


@functools.lru_cache(maxsize=64)
def _cached_lookup(mesh: Mesh, has_scales: bool, rows_padded: int):
    fn = _lookup_shardmap(mesh, has_scales, rows_padded)
    return jax.jit(fn)


def sharded_lookup(table: ShardedTable, slots: jax.Array) -> jax.Array:
    """Replicated [N, D] float32 lookup across the mesh (psum strategy)."""
    fn = _cached_lookup(table.mesh, table.scales is not None, table.rows_padded)
    if table.scales is not None:
        return fn(table.values, table.scales, slots.astype(jnp.int32))
    return fn(table.values, slots.astype(jnp.int32))
