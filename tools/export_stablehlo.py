#!/usr/bin/env python
"""Export the serving forward as StableHLO + compile options for the C++
PJRT shim (resnetc_tpu/native/pjrt_serve.cpp).

Writes <out>/model.mlir (StableHLO text), <out>/compile_options.pb
(serialized xla.CompileOptionsProto), and <out>/meta.json (shapes).  The
exported program is the BN-folded bf16 forward — the exact program the
Python engine's "xla" backend runs — taking one f32 NHWC image tensor and
returning f32 logits.

With ``--backend int8_chain`` the exported program is instead the flagship
int8 megakernel pipeline (fused_forward_int8_chain): Pallas kernels lower to
``tpu_custom_call`` StableHLO custom calls with the Mosaic module serialized
in the backend_config, so the C++ shim runs the exact winning-bench program
with calibration scales baked in as constants.  Requires a TPU lowering
target (the Mosaic lowering path); refuses cleanly elsewhere.

Usage: python tools/export_stablehlo.py --model resnet50 --batch 1 \
           [--backend xla|int8_chain] [--weights PATH.pth|weights_dir] \
           [--calib BATCH.npy] --out export/
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

BACKENDS = ("xla", "int8_chain")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--weights", default=None,
                    help=".pth state dict or reference weights_bin dir; "
                    "random init when absent")
    ap.add_argument("--backend", default="xla", choices=list(BACKENDS),
                    help="xla: BN-folded bf16 forward; int8_chain: the "
                    "int8 megakernel pipeline (TPU lowering required)")
    ap.add_argument("--calib", default=None,
                    help="int8_chain calibration batch: .npy of NHWC f32 "
                    "images (unit-normal noise with a warning if absent)")
    ap.add_argument("--out", default="export")
    args = ap.parse_args()

    from resnetc_tpu import checkpoint
    from resnetc_tpu.models import resnet
    from resnetc_tpu.tensor import BF16

    cfg = resnet.get_config(args.model)
    if args.weights is None:
        variables = resnet.init(cfg, jax.random.key(0))
    elif args.weights.endswith((".pth", ".pt")):
        variables = checkpoint.variables_from_torch_file(args.weights)
    else:
        variables = checkpoint.load_reference_format(cfg, args.weights)
    export_kwargs: dict = {}
    if args.backend == "int8_chain":
        # Mosaic lowering exists only for the TPU target; with no TPU
        # backend we cannot produce the custom calls the shim will compile.
        if jax.default_backend() not in ("tpu", "axon"):
            print(
                "error: --backend int8_chain needs a TPU lowering target "
                f"(default backend here: {jax.default_backend()}); the "
                "megakernels lower via Mosaic to tpu_custom_call",
                file=sys.stderr,
            )
            return 1
        from resnetc_tpu.serve import InferenceEngine

        calib = None
        if args.calib:
            calib = jnp.asarray(np.load(args.calib).astype(np.float32))
        engine = InferenceEngine(
            cfg, variables, policy=BF16, backend="int8_chain",
            calib_batch=calib,
        )
        run, folded = engine._fn(), engine.folded

        def serve(f, x):
            return run(f, x).astype(jnp.float32)

        # The Mosaic payload rides in a tpu_custom_call; jax.export blocks
        # non-allowlisted custom calls unless explicitly disabled.
        export_kwargs["platforms"] = ["tpu"]
        export_kwargs["disabled_checks"] = [
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    else:
        folded = resnet.fold_inference_params(cfg, variables)

        def serve(f, x):
            return resnet.forward_folded(cfg, f, x, policy=BF16).astype(
                jnp.float32
            )

    x_spec = jax.ShapeDtypeStruct(
        (args.batch, args.image_size, args.image_size, 3), jnp.float32
    )
    # Close over the weights as constants: the C++ shim then feeds images
    # only, and XLA folds/lays out the weights at compile time.  Serialized
    # StableHLO bytecode (not text): weights embed as raw dense bytes —
    # half the artifact size and no 200MB hex parse at compile time.
    exported = jax.export.export(
        jax.jit(lambda x: serve(folded, x)), **export_kwargs
    )(x_spec)
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
        "backend": args.backend,
        "input": [args.batch, args.image_size, args.image_size, 3],
        "input_dtype": "f32",
        "output": [args.batch, cfg.num_classes],
        "weights": args.weights or "random-init",
        "calibration": (args.calib or "unit-normal-noise")
        if args.backend == "int8_chain" else None,
    }, indent=1))
    print(f"exported {args.model} [{args.backend}] batch={args.batch} -> "
          f"{out}/ ({len(mlir_bytes)//1024} KiB mlir bytecode, "
          f"{len(copts)} B options)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
