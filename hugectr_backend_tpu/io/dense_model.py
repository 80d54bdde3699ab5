"""Dense-model format: the TPU-native dense half of an ensemble.

The reference serves the dense part of a recsys model through a *separate*
Triton backend — TensorFlow SavedModel, TorchScript, or a TensorRT plan —
composed with the HPS sparse backend via an ensemble DAG (reference
hps_backend/samples/hps-triton-ensemble/README.md:1-24;
02_model_inference_hps_tf_ensemble.ipynb defines a
``platform: "tensorflow_savedmodel"`` dense model consuming the HPS lookup
vectors). On TPU the dense half runs as a JAX program so it can fuse with the
embedding gather into one XLA executable (serving/ensemble.py).

On-disk format (inside the Triton model-version directory, next to where the
reference would keep ``model.savedmodel`` / ``model.pt`` / ``model.plan``):

    <model>/<version>/dense_model.json   — architecture spec
    <model>/<version>/dense_model.npz    — weights (layers.<i>.w [in,out],
                                           layers.<i>.b [out])

Spec schema::

    {"format": "hps_tpu_dense_v1",
     "reshape": [-1, 416],            # applied to the incoming flat tensor
     "quant": "int8",                 # optional: int8/fp8 weight-only, or w8a8
     "layers": [{"units": 256, "activation": "relu"}, ...]}

With ``quant`` set, weights are stored column-scaled (``layers.<i>.wq`` +
``layers.<i>.wscale``) and the matmuls run in bf16 on the MXU with the
dequant multiply fused into the weight operand — the dense-side analogue of
the reference's ``fp8_quant`` flag (reference backend.cpp:500-504). Convert
with ``tools/convert_dense_model.py --quant int8|fp8|w8a8``.

Foreign formats are not executed: ``tools/convert_dense_model.py`` converts a
torch MLP (state_dict or TorchScript) into this format at deploy time —
serving stays pure JAX/XLA.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hugectr_backend_tpu.config.params import ConfigError

SPEC_FILE = "dense_model.json"
WEIGHTS_FILE = "dense_model.npz"

#: Triton platforms the reference's ensembles use for the dense step; these
#: require conversion to the native format (we never execute TF/torch/TRT).
FOREIGN_DENSE_PLATFORMS = (
    "tensorflow_savedmodel",
    "tensorflow_graphdef",
    "pytorch_libtorch",
    "tensorrt_plan",
    "onnxruntime_onnx",
)

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}


@dataclasses.dataclass
class DenseModel:
    """A loaded dense model: an MLP over the flattened lookup vectors.

    ``apply`` is a pure function usable inside a larger jitted program (the
    fused ensemble path); ``forward`` is the standalone jitted entry.
    """

    name: str
    spec: dict
    weights: list[tuple[jax.Array, jax.Array]]  # [(w [in,out], b [out]), ...]
    #: per-column dequant scales when spec["quant"] is set (w is then int8/fp8)
    scales: Optional[list[jax.Array]] = None
    # Tensor names from the model's config.pbtxt (the reference's dense demo
    # uses input_1/output_1 — 02_model_inference_hps_tf_ensemble.ipynb).
    input_name: str = "input_1"
    output_name: str = "output_1"

    def __post_init__(self):
        for layer in self.spec.get("layers", []):
            act = str(layer.get("activation", "identity")).lower()
            if act not in _ACTIVATIONS:
                raise ConfigError(
                    f"dense model {self.name!r}: unknown activation {act!r} "
                    f"(supported: {sorted(_ACTIVATIONS)})"
                )
        self._jit_forward = jax.jit(self.apply)

    # ------------------------------------------------------------------ shape

    @property
    def reshape(self) -> Optional[list[int]]:
        r = self.spec.get("reshape")
        return [int(d) for d in r] if r is not None else None

    @property
    def input_dim(self) -> int:
        return int(self.weights[0][0].shape[0])

    @property
    def output_dim(self) -> int:
        return int(self.weights[-1][0].shape[1])

    # ---------------------------------------------------------------- compute

    def apply(self, x: jax.Array, weights=None, scales=None) -> jax.Array:
        """Pure forward: reshape then dense layers. Safe to call inside jit.

        ``weights``/``scales`` default to this model's own; pass them
        explicitly to keep them jit ARGUMENTS instead of embedded
        compile-time constants (the fused ensemble does — large operands
        as closure constants are a remote-compile hazard, CLAUDE.md)."""
        weights = self.weights if weights is None else weights
        scales = self.scales if scales is None else scales
        if self.reshape is not None:
            x = x.reshape(self.reshape)
        quant = self.spec.get("quant")
        for i, ((w, b), layer) in enumerate(zip(weights, self.spec["layers"])):
            if quant == "w8a8":
                # Dynamic per-row activation int8 + s8xs8->s32 MXU pass (2x
                # the bf16 rate on v5e); on TPU one Pallas pass with the
                # layer activation fused into the epilogue
                # (ops/quant_matmul.py).
                from hugectr_backend_tpu.ops.quant_matmul import w8a8_dense

                act = str(layer.get("activation", "identity")).lower()
                act = None if act in ("identity", "linear", "none") else act
                x = w8a8_dense(x.astype(jnp.float32), w, scales[i], b,
                               act)
                continue
            elif quant:
                # Weight-only dequant fuses into the bf16 MXU matmul; the
                # f32 accumulate keeps additions exact.
                wd = w.astype(jnp.bfloat16) * scales[i].astype(
                    jnp.bfloat16)[None, :]
                x = jnp.dot(x.astype(jnp.bfloat16), wd,
                            preferred_element_type=jnp.float32) + b
            else:
                x = x @ w + b
            x = _ACTIVATIONS[str(layer.get("activation", "identity")).lower()](x)
        return x

    def forward(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self._jit_forward(jnp.asarray(x, dtype=jnp.float32)))

    # ------------------------------------------------------------ persistence

    @classmethod
    def load(cls, version_dir, name: Optional[str] = None) -> "DenseModel":
        vdir = Path(version_dir)
        spec_path = vdir / SPEC_FILE
        if not spec_path.exists():
            foreign = [
                p.name
                for p in vdir.iterdir()
                if p.name in ("model.savedmodel", "model.pt", "model.plan",
                              "model.onnx", "model.graphdef")
            ] if vdir.is_dir() else []
            hint = (
                f" (found {', '.join(foreign)}: convert it with "
                f"`python tools/convert_dense_model.py`)" if foreign else ""
            )
            raise ConfigError(
                f"dense model dir {vdir} has no {SPEC_FILE}{hint}"
            )
        spec = json.loads(spec_path.read_text())
        if spec.get("format") != "hps_tpu_dense_v1":
            raise ConfigError(
                f"{spec_path}: unsupported format {spec.get('format')!r}"
            )
        quant = spec.get("quant")
        if quant not in (None, "int8", "fp8", "w8a8"):
            raise ConfigError(f"{spec_path}: unsupported quant {quant!r}")
        with np.load(vdir / WEIGHTS_FILE) as z:
            weights, scales = [], []
            for i in range(len(spec["layers"])):
                if quant:
                    wq = z[f"layers.{i}.wq"]
                    if quant == "fp8":
                        import ml_dtypes

                        wq = wq.view(ml_dtypes.float8_e4m3fn)
                    w = jnp.asarray(wq)
                    scales.append(
                        jnp.asarray(z[f"layers.{i}.wscale"], jnp.float32))
                else:
                    w = jnp.asarray(z[f"layers.{i}.w"], dtype=jnp.float32)
                b = jnp.asarray(z[f"layers.{i}.b"], dtype=jnp.float32)
                if w.ndim != 2 or b.shape != (w.shape[1],):
                    raise ConfigError(
                        f"dense model {vdir}: layer {i} weight shapes "
                        f"{w.shape}/{b.shape} inconsistent"
                    )
                weights.append((w, b))
        return cls(name or vdir.parent.name, spec, weights,
                   scales=scales if quant else None)


def save_dense_model(
    version_dir,
    weights: Sequence[tuple[np.ndarray, np.ndarray]],
    activations: Sequence[str],
    reshape: Optional[Sequence[int]] = None,
    quant: Optional[str] = None,
) -> Path:
    """Write the native dense format. ``weights[i]`` is (w [in,out], b [out]).

    ``quant`` ("int8" | "fp8" | "w8a8") stores column-scaled quantized
    kernels; the fp32 weights passed in are quantized here (deploy-time
    conversion). "w8a8" also quantizes activations at serve time and runs
    the matmuls as int8 MXU passes (2x bf16 rate on v5e)."""
    vdir = Path(version_dir)
    vdir.mkdir(parents=True, exist_ok=True)
    if len(weights) != len(activations):
        raise ValueError("need one activation per layer")
    if quant not in (None, "int8", "fp8", "w8a8"):
        raise ValueError(f"unsupported quant {quant!r}")
    spec = {
        "format": "hps_tpu_dense_v1",
        "layers": [
            {"units": int(w.shape[1]), "activation": act}
            for (w, _), act in zip(weights, activations)
        ],
    }
    if reshape is not None:
        spec["reshape"] = [int(d) for d in reshape]
    if quant:
        spec["quant"] = quant
    arrays = {}
    for i, (w, b) in enumerate(weights):
        if quant:
            from hugectr_backend_tpu.models.quant_dense import quantize_weight

            q, s = quantize_weight(np.asarray(w, np.float32), quant)
            # fp8 rides as raw bytes (npz has no fp8 dtype); load views back.
            arrays[f"layers.{i}.wq"] = (
                q.view(np.uint8) if quant == "fp8" else q
            )
            arrays[f"layers.{i}.wscale"] = s
        else:
            arrays[f"layers.{i}.w"] = np.asarray(w, dtype=np.float32)
        arrays[f"layers.{i}.b"] = np.asarray(b, dtype=np.float32)
    (vdir / SPEC_FILE).write_text(json.dumps(spec, indent=1))
    np.savez(vdir / WEIGHTS_FILE, **arrays)
    return vdir


def convert_torch_sequential(module, reshape=None):
    """Convert a torch MLP (``nn.Sequential`` of Linear + activation modules,
    or a TorchScript trace of one) to (weights, activations) for
    :func:`save_dense_model`. Torch Linear stores [out,in]; we transpose to
    [in,out] so the TPU matmul reads activations row-major."""
    import torch  # CPU-only torch is available in this image

    weights: list[tuple[np.ndarray, np.ndarray]] = []
    activations: list[str] = []
    act_names = {
        "ReLU": "relu", "Sigmoid": "sigmoid", "Tanh": "tanh", "GELU": "gelu",
    }
    for mod in module.modules():
        cls = type(mod).__name__
        if cls == "Linear" or (
            hasattr(mod, "weight") and hasattr(mod, "bias")
            and getattr(mod, "original_name", "") == "Linear"
        ):
            w = mod.weight.detach().cpu().numpy().T
            b = mod.bias.detach().cpu().numpy()
            weights.append((w, b))
            activations.append("identity")
        elif cls in act_names or getattr(mod, "original_name", "") in act_names:
            name = act_names.get(cls) or act_names[mod.original_name]
            if not weights:
                raise ValueError("activation before any Linear layer")
            activations[-1] = name
    if not weights:
        raise ValueError("no Linear layers found in module")
    return weights, activations
