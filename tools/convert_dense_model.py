#!/usr/bin/env python
"""Convert a torch dense model to the native TPU dense format.

The reference's ensembles run the dense half on a foreign backend —
TorchScript (``model.pt``), TF SavedModel, or a TensorRT plan (reference
hps_backend/samples/hps-triton-ensemble/HPS_Pytorch_ensemble_deployment.ipynb
writes ``platform: "pytorch_libtorch"`` with a traced MLP). This framework
executes the dense half as JAX so it can fuse with the embedding gather; this
tool converts a torch MLP into that format at deploy time:

    python tools/convert_dense_model.py <model.pt> <version_dir> \
        [--reshape -1 416]

``model.pt`` may be a TorchScript archive (``torch.jit.save``) or a pickled
``nn.Module``. Supported layers: Linear + ReLU/Sigmoid/Tanh/GELU (the MLP
shapes the reference's recsys dense networks use). The result is
``dense_model.json`` + ``dense_model.npz`` in <version_dir>, loadable by
``hugectr_backend_tpu.io.dense_model.DenseModel``.
"""

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_pt", help="TorchScript archive or pickled nn.Module")
    ap.add_argument("version_dir", help="Triton model version dir to write into")
    ap.add_argument(
        "--reshape", type=int, nargs="+", default=None,
        help="reshape applied to the incoming flat tensor, e.g. --reshape -1 416",
    )
    ap.add_argument(
        "--quant", choices=("int8", "fp8", "w8a8"), default=None,
        help="store column-scaled quantized kernels: int8/fp8 weight-only "
        "(bf16 MXU matmuls with fused dequant) or w8a8 (activations "
        "quantized at serve time, int8 MXU passes at 2x the bf16 rate)",
    )
    args = ap.parse_args(argv)

    import torch

    from hugectr_backend_tpu.io.dense_model import (
        convert_torch_sequential,
        save_dense_model,
    )

    path = Path(args.model_pt)
    try:
        module = torch.jit.load(str(path), map_location="cpu")
    except RuntimeError:
        module = torch.load(str(path), map_location="cpu", weights_only=False)
    weights, activations = convert_torch_sequential(module)
    out = save_dense_model(args.version_dir, weights, activations,
                           args.reshape, quant=args.quant)
    dims = " -> ".join(
        [str(weights[0][0].shape[0])] + [str(w.shape[1]) for w, _ in weights]
    )
    print(f"wrote {out}/dense_model.json (+.npz): MLP {dims}, "
          f"activations {activations}"
          + (f", {args.quant} weight-only kernels" if args.quant else ""))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.exit(main())
