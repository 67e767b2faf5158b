#!/usr/bin/env python
"""Export the serving forward as StableHLO + compile options for the C++
PJRT shim (resnetc_tpu/native/pjrt_serve.cpp).

Writes <out>/model.mlir (StableHLO text), <out>/compile_options.pb
(serialized xla.CompileOptionsProto), and <out>/meta.json (shapes).  The
exported program is the BN-folded bf16 forward — the exact program the
Python engine's "xla" backend runs — taking one f32 NHWC image tensor and
returning f32 logits.

Usage: python tools/export_stablehlo.py --model resnet50 --batch 1 \
           [--weights PATH.pth|weights_dir] --out export/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--weights", default=None,
                    help=".pth state dict or reference weights_bin dir; "
                    "random init when absent")
    ap.add_argument("--out", default="export")
    args = ap.parse_args()

    from resnetc_tpu import checkpoint
    from resnetc_tpu.models import resnet
    from resnetc_tpu.tensor import BF16

    cfg = resnet.get_config(args.model)
    if args.weights is None:
        variables = resnet.init(cfg, jax.random.key(0))
    elif args.weights.endswith(".pth"):
        variables = checkpoint.load_torch_checkpoint(cfg, args.weights)
    else:
        variables = checkpoint.load_reference_format(cfg, args.weights)
    folded = resnet.fold_inference_params(cfg, variables)

    def serve(f, x):
        return resnet.forward_folded(cfg, f, x, policy=BF16).astype(jnp.float32)

    x_spec = jax.ShapeDtypeStruct(
        (args.batch, args.image_size, args.image_size, 3), jnp.float32
    )
    # Close over the weights as constants: the C++ shim then feeds images
    # only, and XLA folds/lays out the weights at compile time.  Serialized
    # StableHLO bytecode (not text): weights embed as raw dense bytes —
    # half the artifact size and no 200MB hex parse at compile time.
    exported = jax.export.export(jax.jit(lambda x: serve(folded, x)))(x_spec)
    mlir_bytes = exported.mlir_module_serialized

    from jax._src.lib import xla_client as xc

    opts = xc.CompileOptions()
    opts.num_replicas = 1
    opts.num_partitions = 1
    copts = opts.SerializeAsString()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "model.mlir").write_bytes(mlir_bytes)
    (out / "compile_options.pb").write_bytes(copts)
    (out / "meta.json").write_text(json.dumps({
        "model": args.model,
        "input": [args.batch, args.image_size, args.image_size, 3],
        "input_dtype": "f32",
        "output": [args.batch, cfg.num_classes],
        "weights": args.weights or "random-init",
    }, indent=1))
    print(f"exported {args.model} batch={args.batch} -> {out}/ "
          f"({len(mlir_bytes)//1024} KiB mlir bytecode, {len(copts)} B options)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
