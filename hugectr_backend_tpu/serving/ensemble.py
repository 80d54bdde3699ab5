"""Triton-ensemble-compatible DAG serving: sparse lookup + dense forward.

The reference composes the HPS backend with a dense backend through a Triton
ensemble (``platform: "ensemble"`` + ``ensemble_scheduling.step[]`` with
input_map/output_map — reference
hps_backend/samples/hps-triton-ensemble/02_model_inference_hps_tf_ensemble.ipynb,
README.md:4-8). Each step there runs in a different engine with a device
round-trip between them.

Here the same config.pbtxt drives a TPU-native executor:

- **Staged path** (general DAG): steps run in topological order; HPS steps go
  through the :class:`ModelManager` (continuous batcher, metrics, full tier
  cascade), dense steps run as jitted JAX programs (io/dense_model.py). This
  reproduces the reference's data flow exactly, including the table-major
  flat layout of the HPS output.
- **Fused path**: when the DAG is the canonical chain
  ``hps(single table, full static cache) -> dense`` the two steps compile
  into ONE XLA executable — dequant+gather feeds the MLP in HBM, the lookup
  vectors never reach the host (the ensemble's device round-trip disappears).
  Batch is padded to bucket sizes so the compile count stays bounded; padding
  keys map to the default row (slot == capacity), so no masking is needed.

The fused path is only used when its semantics equal the staged path: a full
(``gpucacheper >= 1``) static cache makes "HBM miss" == "key absent
everywhere" == default vector (reference docs/architecture.md:32), so
skipping the DRAM/SSD cascade changes nothing.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.cache.embedding_cache import _bucket
from hugectr_backend_tpu.config.params import ConfigError
from hugectr_backend_tpu.io.dense_model import DenseModel
from hugectr_backend_tpu.serving.scheduler import RequestError
from hugectr_backend_tpu.tiers.hbm import gather_dequant_xla
from hugectr_backend_tpu.utils.logging import get_logger

log = get_logger("hps_tpu.ensemble")


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _map_of(entries) -> dict[str, str]:
    """input_map/output_map pbtxt blocks -> {model_tensor: ensemble_tensor}."""
    out = {}
    for e in _as_list(entries):
        if not isinstance(e, Mapping) or "key" not in e or "value" not in e:
            raise ConfigError(f"bad input_map/output_map entry: {e!r}")
        out[str(e["key"])] = str(e["value"])
    return out


@dataclasses.dataclass
class EnsembleStep:
    model_name: str
    model_version: int
    input_map: dict[str, str]   # model input name -> ensemble tensor name
    output_map: dict[str, str]  # model output name -> ensemble tensor name


@dataclasses.dataclass
class EnsembleSpec:
    """Parsed + topologically sorted ensemble_scheduling config."""

    name: str
    inputs: list[dict]   # [{name, datatype, dims}]
    outputs: list[dict]
    steps: list[EnsembleStep]  # topological order

    @classmethod
    def from_config(cls, name: str, cfg: Mapping) -> "EnsembleSpec":
        if cfg.get("platform") != "ensemble":
            raise ConfigError(f"model {name!r} is not platform: \"ensemble\"")
        sched = cfg.get("ensemble_scheduling") or {}
        raw_steps = _as_list(sched.get("step"))
        if not raw_steps:
            raise ConfigError(
                f"ensemble {name!r}: ensemble_scheduling has no steps"
            )
        steps = [
            EnsembleStep(
                model_name=str(s.get("model_name", "")),
                model_version=int(s.get("model_version", -1)),
                input_map=_map_of(s.get("input_map")),
                output_map=_map_of(s.get("output_map")),
            )
            for s in raw_steps
        ]
        for s in steps:
            if not s.model_name:
                raise ConfigError(f"ensemble {name!r}: step without model_name")
            if not s.output_map:
                raise ConfigError(
                    f"ensemble {name!r}: step {s.model_name} has no output_map"
                )

        def tensor_list(field):
            return [
                {
                    "name": t.get("name"),
                    "datatype": str(t.get("data_type", "TYPE_FP32")).replace(
                        "TYPE_", ""
                    ),
                    "dims": _as_list(t.get("dims")),
                }
                for t in _as_list(cfg.get(field))
            ]

        inputs = tensor_list("input")
        outputs = tensor_list("output")

        # Topological sort: a step is runnable once every ensemble tensor its
        # input_map references has been produced (Triton schedules the same
        # way from the dependency graph).
        available = {i["name"] for i in inputs}
        ordered: list[EnsembleStep] = []
        pending = list(steps)
        while pending:
            runnable = [
                s for s in pending
                if set(s.input_map.values()) <= available
            ]
            if not runnable:
                missing = {
                    t for s in pending for t in s.input_map.values()
                } - available
                raise ConfigError(
                    f"ensemble {name!r}: steps "
                    f"{[s.model_name for s in pending]} are unreachable — "
                    f"tensors {sorted(missing)} are never produced "
                    f"(cycle or missing input)"
                )
            for s in runnable:
                ordered.append(s)
                pending.remove(s)
                available |= set(s.output_map.values())
        produced = available
        for o in outputs:
            if o["name"] not in produced:
                raise ConfigError(
                    f"ensemble {name!r}: output {o['name']!r} is never produced"
                )
        return cls(name, inputs, outputs, ordered)


class EnsembleServer:
    """Executes one ensemble against the live ModelManager + dense models.

    Thread-safe: the fused program build is locked; execution is stateless
    apart from the shared cache/batcher objects which are themselves safe.
    """

    def __init__(self, spec: EnsembleSpec, manager, dense_models: Mapping[str, DenseModel]):
        self.spec = spec
        self.manager = manager
        self.dense = dict(dense_models)
        self._lock = threading.Lock()
        self._fused = None          # jitted program, built lazily
        self._fused_ready = False   # tri-state: un-attempted / built / refused
        for s in spec.steps:
            if s.model_name not in self.dense and not self._is_hps(s.model_name):
                log.warning(
                    "ensemble %s: step model %r is neither an HPS model nor a "
                    "dense model (will fail at infer time)",
                    spec.name, s.model_name,
                )

    def _is_hps(self, model_name: str) -> bool:
        try:
            self.manager.ps.get_model_params(model_name)
            return True
        except (KeyError, ConfigError):
            return False

    # --------------------------------------------------------------- fused

    def _build_fused(self):
        """Compile the hps->dense chain into one program when semantics allow
        (see module docstring). Sets ``self._fused`` or leaves it None."""
        self._fused_ready = True
        s = self.spec.steps
        if len(s) != 2:
            return
        sparse, dense_step = s
        if not self._is_hps(sparse.model_name):
            return
        dm = self.dense.get(dense_step.model_name)
        if dm is None:
            return
        # The sparse output must be the dense step's only input.
        link = set(sparse.output_map.values())
        if set(dense_step.input_map.values()) != link or len(link) != 1:
            return
        params = self.manager.ps.get_model_params(sparse.model_name)
        cache_type = getattr(
            params.embedding_cache_type, "value", params.embedding_cache_type
        )
        if (
            params.num_tables != 1
            or str(cache_type) != "static"
            or params.cache_size_percentage < 1.0
        ):
            return
        rs = dm.reshape
        k = params.maxnum_catfeature_query_per_table_per_sample[0]
        d = params.embedding_vecsize_per_table[0]
        if rs is None or len(rs) != 2 or rs[0] != -1 or rs[1] <= 0 or (k * d) % rs[1]:
            return  # padding would not stay a clean row prefix
        dev = params.instance_devices[0]

        if params.shard_tables:
            # Sharded ensemble fusion: the COLLECTIVE lookup and the dense
            # forward compile into one mesh program — the multi-chip
            # analogue of the flat fast path below (the reference composes
            # these as separate ensemble steps with a device round-trip
            # between engines).
            from hugectr_backend_tpu.parallel.sharded_cache import (
                _shardmap_for,
            )

            @functools.partial(
                jax.jit,
                static_argnames=("rows_padded", "mesh", "axis", "strategy"),
            )
            def fused_sharded(dweights, dscales, values, scales, routed,
                              rows_padded, mesh, axis, strategy):
                # (No b_pad arg: the padding is fully encoded in the
                # routed operand shapes, which already key the jit cache.)
                lk = _shardmap_for(mesh, axis, strategy, scales is not None,
                                   rows_padded)
                flat = (lk(values, scales, *routed)
                        if scales is not None else lk(values, *routed))
                return dm.apply(flat, weights=dweights, scales=dscales)

            self._fused = ("sharded", fused_sharded, dev, params, k, d,
                           rs[1], sparse, dense_step)
            log.info(
                "ensemble %s: fused SHARDED %s -> %s into one mesh program",
                self.spec.name, sparse.model_name, dense_step.model_name,
            )
            return

        @functools.partial(jax.jit, static_argnames=("b_pad",))
        def fused(dweights, dscales, values, scales, slots, b_pad):
            flat = gather_dequant_xla(values, scales, slots)  # [b_pad*k, d]
            # DenseModel.apply owns the layer semantics (reshape +
            # activations AND the quantized kernels — int8/fp8 weight-only
            # dequant, w8a8; a re-implemented `x @ w + b` loop here
            # silently skipped the dequant scales for quantized dense
            # models). Weights/scales ride as jit ARGUMENTS.
            return dm.apply(flat, weights=dweights, scales=dscales)

        self._fused = ("flat", fused, dev, params, k, d, rs[1], sparse,
                       dense_step)
        log.info(
            "ensemble %s: fused %s -> %s into one XLA program",
            self.spec.name, sparse.model_name, dense_step.model_name,
        )

    def _run_fused(self, tensors: dict[str, np.ndarray]) -> Optional[dict]:
        mode, fused, dev, params, k, d, f, sparse, dense_step = self._fused
        # Fetch the LIVE cache every call: unload destroys it and a reload
        # creates a new object — a cache captured at build time would keep
        # serving the previous version's embeddings forever.
        try:
            cache = self.manager.ps.get_embedding_cache(
                sparse.model_name, dev)
        except KeyError:
            return None  # not loaded: the staged path raises the real error
        keys_name = sparse.input_map.get("KEYS")
        num_name = sparse.input_map.get("NUMKEYS")
        if keys_name not in tensors or num_name not in tensors:
            return None
        keys = np.asarray(tensors[keys_name], dtype=np.int64).reshape(-1)
        numkeys = np.asarray(tensors[num_name], dtype=np.int64).reshape(-1)
        if keys.size % k or numkeys.size != 1 or int(numkeys[0]) != keys.size:
            return None  # ragged request: the staged path handles it
        b = keys.size // k
        if b == 0:
            raise RequestError(f"ensemble {self.spec.name}: empty request")
        if b > params.max_batch_size:
            raise RequestError(
                f"ensemble {self.spec.name}: {b} samples exceed max batch size "
                f"{params.max_batch_size} (reference hps.cc:573-582)"
            )
        b_pad = _bucket(b)
        dm = self.dense[dense_step.model_name]
        if mode == "sharded":
            # Snapshot the (functional) table, route on the host, and run
            # lookup + dense as ONE mesh program. _route pads at the slot
            # level and updates the hit meter (parallel/sharded_cache.py).
            with cache._lock:
                table = cache.tables[0]
            routed = cache._route(table, 0, keys, pad_to=b_pad * k)
            y = fused(dm.weights, dm.scales, table.values, table.scales,
                      routed, rows_padded=table.rows_padded,
                      mesh=cache.mesh, axis=cache.axis,
                      strategy=cache.strategy)
            rows_per_sample = (k * d) // f
            out = np.asarray(y[: b * rows_per_sample])
            out_name = next(iter(dense_step.output_map.values()))
            return {out_name: out}
        table = cache.tables[0]
        # Translate + snapshot under one lock hold (see EmbeddingCache.lookup).
        with cache._lock:
            slots = np.full(b_pad * k, table.index.miss_slot, np.int32)
            slots[: b * k] = cache.translate(0, keys).astype(np.int32)
            values, scales = table.values, table.scales
        y = fused(dm.weights, dm.scales, values, scales, jnp.asarray(slots),
                  b_pad=b_pad)
        rows_per_sample = (k * d) // f
        out = np.asarray(y[: b * rows_per_sample])
        cache.hit_meter.update(0, b * k - int((slots[: b * k] == table.index.miss_slot).sum()), b * k)
        out_name = next(iter(dense_step.output_map.values()))
        return {out_name: out}

    # --------------------------------------------------------------- execute

    def infer(self, named_inputs: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Run the DAG. Input/output names are the ensemble's declared ones."""
        tensors: dict[str, np.ndarray] = {}
        declared = {i["name"] for i in self.spec.inputs}
        for name in declared:
            if name not in named_inputs:
                raise RequestError(
                    f"ensemble {self.spec.name}: missing input {name!r} "
                    f"(declared inputs: {sorted(declared)})"
                )
            tensors[name] = np.asarray(named_inputs[name])

        if not self._fused_ready:
            with self._lock:
                if not self._fused_ready:
                    try:
                        self._build_fused()
                    except Exception:
                        log.exception(
                            "ensemble %s: fused build failed; using staged path",
                            self.spec.name,
                        )
                        self._fused = None
                        self._fused_ready = True
        if self._fused is not None:
            result = self._run_fused(tensors)
            if result is not None:
                tensors.update(result)
                return self._collect_outputs(tensors)

        return self.infer_staged(tensors)

    def infer_staged(self, tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Step-by-step execution (always valid; used for ragged requests and
        non-canonical DAGs, and as the fused path's equivalence oracle)."""
        tensors = dict(tensors)
        for step in self.spec.steps:
            if self._is_hps(step.model_name):
                keys_t = step.input_map.get("KEYS")
                num_t = step.input_map.get("NUMKEYS")
                if keys_t is None or num_t is None:
                    raise RequestError(
                        f"ensemble {self.spec.name}: HPS step "
                        f"{step.model_name!r} must map KEYS and NUMKEYS"
                    )
                resp = self.manager.infer(
                    step.model_name,
                    np.asarray(tensors[keys_t], np.int64).reshape(-1),
                    np.asarray(tensors[num_t], np.int64).reshape(-1),
                )
                out_name = step.output_map.get("OUTPUT0")
                if out_name is None:
                    raise RequestError(
                        f"ensemble {self.spec.name}: HPS step "
                        f"{step.model_name!r} must map OUTPUT0"
                    )
                tensors[out_name] = np.asarray(resp.output, np.float32)
            elif step.model_name in self.dense:
                dm = self.dense[step.model_name]
                if len(step.input_map) != 1:
                    raise RequestError(
                        f"ensemble {self.spec.name}: dense step "
                        f"{step.model_name!r} takes exactly one input"
                    )
                (src,) = step.input_map.values()
                y = dm.forward(np.asarray(tensors[src], np.float32))
                (dst,) = step.output_map.values()
                tensors[dst] = y
            else:
                raise RequestError(
                    f"ensemble {self.spec.name}: step model "
                    f"{step.model_name!r} is not loaded"
                )
        return self._collect_outputs(tensors)

    def _collect_outputs(self, tensors) -> dict[str, np.ndarray]:
        return {o["name"]: np.asarray(tensors[o["name"]]) for o in self.spec.outputs}
