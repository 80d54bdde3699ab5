"""Pallas embedding gather experiments + the production gather path.

Replaces the reference's CUDA embedding-cache gather kernels (the engine-side
``lookup`` hot path behind reference model_instance_state.cpp:194).

MEASURED COST MODEL (TPU v5e, lax.scan-serialized inside one program, timing
forced by fetching the result value — see the tunnel pitfalls below; 26,624
uniform random slots per batch, D=128 int8 rows + per-row scale dequant):

    table <= ~2 MB  (16k rows)     ~397 us/batch   (~67M rows/s)
    table ~17 MB   (131k rows)     ~551 us/batch   (~48M rows/s)
    table ~128 MB  (1M rows)       ~740 us/batch   (~36M rows/s)
    table ~1.3 GB  (10M rows)      ~755 us/batch   (~35M rows/s)
    blocked [K,1M,D] (10M rows)    ~813 us/batch   (~33M rows/s)
    Pallas per-key grouped DMA     slower (~25 ns/key scalar-issue bound)

Conclusions encoded in this package:
1. TPU v5e random gather is PER-ACCESS bound (no SparseCore): ~15-30 ns/row,
   degrading mildly with table size (locality), flat in row width <=512 B.
   Quantization buys CAPACITY (2-4x rows/byte) more than lookup speed.
2. XLA's native gather beats hand-written per-key DMA kernels (one DMA
   descriptor per key costs ~25 ns of scalar core alone). PRODUCTION DEFAULT
   IS THE XLA PATH; the grouped Pallas kernel is kept as an experimental
   alternative (bit-exact, tests/test_pallas_gather.py).
3. Tables must be passed to jit AS ARGUMENTS, never closed over: closures
   embed them as constants in the remote-compile request (a 1.3 GB upload
   that presents as a multi-hour "compile hang" on tunneled TPU setups).
4. Host-side numpy dedup (np.unique) of 26k keys costs ~4.6 ms — more than
   the gather it saves; dedup belongs in the native C++ key translation.
5. For very large merged batches (>= ~1M keys per table) a streaming select
   (sort + full-table scan at HBM bandwidth + MXU row-select) could beat
   per-access gathers — but serving batch shapes never reach that size, so
   it is documented rather than built (analysis: ROOFLINE.md section 3.4).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # rows per DMA group = int8/f32 sublane tile
WAVE = 64  # concurrent DMAs per wave
N_BUF = 2  # waves in flight
BLOCK_N = 512  # keys per grid step


def _grouped_gather_kernel(
    slots_smem,  # [N] int32 (scalar prefetch)
    table_ref,  # [G, 8, D] ANY/HBM
    sel_ref,  # [BLOCK_N, 8] f32 (blocked): one-hot row mask x dequant scale
    out_ref,  # [BLOCK_N, D] f32 (blocked)
    scratch,  # [N_BUF, WAVE, 8, D] table dtype
    sems,  # DMA sems [N_BUF, WAVE]
):
    step = pl.program_id(0)
    base = step * BLOCK_N
    n_waves = BLOCK_N // WAVE

    def dma(wave, buf, k):
        g = slots_smem[base + wave * WAVE + k] // GROUP
        return pltpu.make_async_copy(
            table_ref.at[g], scratch.at[buf, k], sems.at[buf, k]
        )

    def issue(wave, buf):
        for k in range(WAVE):
            dma(wave, buf, k).start()

    issue(0, 0)
    for w in range(n_waves):
        buf = w % N_BUF
        if w + 1 < n_waves:
            issue(w + 1, (w + 1) % N_BUF)
        for k in range(WAVE):
            dma(w, buf, k).wait()
        # Row select + dequant in one shot: sel_ref holds scale * onehot(row),
        # so summing scale-masked group rows yields the dequantized row.
        # All operands stay 2D (Mosaic-friendly): 8 static multiply-adds.
        acc = sel_ref[pl.ds(w * WAVE, WAVE), 0:1] * scratch[buf, :, 0, :].astype(
            jnp.float32
        )
        for g in range(1, GROUP):
            acc += sel_ref[pl.ds(w * WAVE, WAVE), g : g + 1] * scratch[
                buf, :, g, :
            ].astype(jnp.float32)
        out_ref[pl.ds(w * WAVE, WAVE), :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_grouped_gather(
    table3d: jax.Array,  # [G, 8, D]
    slots: jax.Array,  # [N] int32, N % BLOCK_N == 0, values < G*8
    row_scales: jax.Array,  # [N] f32 (host- or XLA-gathered; ones if unquantized)
    interpret: bool = False,
) -> jax.Array:
    n = slots.shape[0]
    d = table3d.shape[2]
    assert n % BLOCK_N == 0, f"slot count {n} must be a multiple of {BLOCK_N}"
    # One-hot row mask with the dequant scale folded in (computed here in XLA,
    # where it fuses into the surrounding program).
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (n, GROUP), 1)
        == (slots % GROUP)[:, None]
    ).astype(jnp.float32) * row_scales[:, None]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BLOCK_N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BLOCK_N, GROUP), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, d), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, WAVE, GROUP, d), table3d.dtype),
            pltpu.SemaphoreType.DMA((N_BUF, WAVE)),
        ],
    )
    return pl.pallas_call(
        _grouped_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                N_BUF * WAVE * GROUP * d * table3d.dtype.itemsize
                + 4 * BLOCK_N * (d + GROUP) * 4
                + 2**20
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * GROUP * d,
            bytes_accessed=n * GROUP * d * table3d.dtype.itemsize + n * d * 4,
            transcendentals=0,
        ),
    )(slots, table3d, sel)


def to_grouped_layout(values: np.ndarray | jax.Array):
    """[R, D] -> ([G, 8, D], padded_rows). Pads R up to a GROUP multiple."""
    r, d = values.shape
    pad = (-r) % GROUP
    if pad:
        values = jnp.concatenate(
            [jnp.asarray(values), jnp.zeros((pad, d), values.dtype)]
        )
    return jnp.asarray(values).reshape(-1, GROUP, d), r + pad


def _pad_to_multiple(x: jax.Array, multiple: int, fill=0) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


def use_pallas_default() -> bool:
    """XLA take is the production default — see the module docstring for the
    measured numbers (the per-key DMA kernel is scalar-issue bound and
    slower). Set HPS_TPU_FORCE_PALLAS_GATHER=1 to experiment."""
    # "0"/"" must mean OFF (bool("0") is True) — same convention as the
    # sibling kill-switches (HPS_PALLAS_W8A8, HPS_PALLAS_INTERACTION).
    return os.environ.get("HPS_TPU_FORCE_PALLAS_GATHER", "0") not in ("", "0")


def dequant_gather(
    values: jax.Array,
    scales,
    slots: jax.Array,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused gather+dequant: float32 ``values[slots] * scales[slots][:,None]``.

    ``values`` may be [R, D] (XLA path / auto-grouped) or pre-grouped
    [G, 8, D]. For the Pallas path, per-row scales are expected to be cheap
    to gather (host-side or XLA) — pass ``scales=None`` for bf16/fp32 tables.
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if use_pallas:
        if values.ndim == 2:
            table3d, _ = to_grouped_layout(values)
        else:
            table3d = values
        d = table3d.shape[2]
        if d % 128 == 0:
            n = slots.shape[0]
            slots_p = _pad_to_multiple(slots.astype(jnp.int32), BLOCK_N)
            if scales is not None:
                row_scales = jnp.take(scales, slots, axis=0)
                row_scales = _pad_to_multiple(row_scales, BLOCK_N, 0.0)
            else:
                row_scales = jnp.ones(slots_p.shape, jnp.float32)
            return pallas_grouped_gather(table3d, slots_p, row_scales,
                                         interpret=interpret)[:n]
        values = table3d.reshape(-1, d)
    # XLA fallback path
    if values.ndim == 3:
        values = values.reshape(-1, values.shape[2])
    rows = jnp.take(values, slots, axis=0)
    out = rows.astype(jnp.float32)
    if scales is not None:
        out = out * jnp.take(scales, slots, axis=0)[:, None]
    return out
