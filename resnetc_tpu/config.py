"""Config layer: every hardcoded constant in the reference becomes a flag.

The reference compiles its configuration into the binary: batch/size
(main.cu:230), the architecture (main.cu:109-125), the weight directory
(nn.cuh:21), the input path (main.cu:236), eps (ops.cu:150) — its only
runtime switch is the DEBUG preprocessor define (SURVEY.md §5).  This module
is the replacement: dataclass configs with CLI parsers for model variant,
batch, dtype policy, mesh shape, backend, and paths.
"""

from __future__ import annotations

import argparse
import dataclasses

from resnetc_tpu.models.resnet import RESNET_CONFIGS

# Serving backends, fastest-first (measured b256 resnet50, PERF.md):
# int8_chain (megakernel pipeline, the headline) > xla (BN-folded bf16)
# > int8 > pallas_block > pallas.  The two bf16 Pallas paths are DEPRECATED
# for serving (kept as kernel-parity/debug references): their loss to XLA is
# structural — bf16 gets neither the int8 HBM halving nor the 2x int8 MXU
# rate, and XLA already fuses bf16 epilogues (measurements + disposition in
# PERF.md).
BACKENDS = ("int8_chain", "xla", "int8", "pallas_block", "pallas")


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Top-level invocation config shared by the CLI commands."""

    model: str = "resnet50"
    num_classes: int = 1000
    #: 256 = the headline serving config (serving is batch-size neutral on
    #: int8_chain — BATCH_SWEEP.json).  For TRAINING throughput b128
    #: measures +4.7% img/s over b256 (BN-stat reductions scale
    #: superlinearly); pass --batch-size 128 when training for speed.
    batch_size: int = 256
    image_size: int = 224
    policy: str = "bf16"  # "bf16" | "fp32"
    #: "xla" (bf16) is the accuracy-safe default; "int8_chain" is the
    #: fastest serving backend for bottleneck models (PERF.md round 5).
    backend: str = "xla"  # one of BACKENDS
    weights_dir: str | None = None  # reference raw-f32 weight directory
    data_dim: int = 1  # mesh data axis
    model_dim: int = 1  # mesh model axis (channel TP)
    calib_method: str = "absmax"  # int8 calibration: absmax | percentile | mse
    calib_per_channel: bool = False  # per-channel interior activation scales
    seed: int = 0
    # Multi-HOST (one process per host): set multihost (auto-detect on TPU
    # pods) or pass the explicit coordinator triple; see
    # parallel/distributed.py and README "Multi-host".
    multihost: bool = False
    coordinator: str | None = None  # "host:port"
    num_processes: int | None = None
    process_id: int | None = None


def add_run_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="resnet50", choices=sorted(RESNET_CONFIGS))
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--policy", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--backend", default="xla", choices=list(BACKENDS))
    p.add_argument(
        "--weights-dir",
        default=None,
        help="directory of raw-f32 weight files named by state_dict key "
        "(the reference's save_weights.py format); random init if omitted",
    )
    p.add_argument(
        "--calib-method",
        default="absmax",
        choices=["absmax", "percentile", "mse"],
        help="int8 activation-scale calibration (percentile clips at the "
        "99.9th percentile of |act|; mse picks the per-site clip that "
        "minimizes quantization MSE — both robust to outlier activations)",
    )
    p.add_argument(
        "--calib-per-channel", action=argparse.BooleanOptionalAction,
        default=False,
        help="per-channel scales at the interior int8 sites (baked into "
        "host constants — identical compiled program, only constant "
        "values change). Off by default: the on-chip A/B on a held-out "
        "real-fixture mix measured per-tensor absmax best "
        "(tools/battery/calib_ab.py)",
    )
    p.add_argument("--data-dim", type=int, default=1, help="mesh data-parallel axis size")
    p.add_argument("--model-dim", type=int, default=1, help="mesh channel-TP axis size")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--multihost", action="store_true",
        help="join the multi-process JAX runtime before any device use "
        "(TPU pods auto-detect the topology; other setups also need "
        "--coordinator/--num-processes/--process-id)",
    )
    p.add_argument("--coordinator", default=None, help='multi-host coordinator "host:port"')
    p.add_argument("--num-processes", type=int, default=None, help="multi-host total process count")
    p.add_argument("--process-id", type=int, default=None, help="this process's multi-host index")


def run_config_from_args(args: argparse.Namespace) -> RunConfig:
    multihost = bool(
        getattr(args, "multihost", False)
        or getattr(args, "coordinator", None) is not None
    )
    if not multihost and (
        getattr(args, "num_processes", None) is not None
        or getattr(args, "process_id", None) is not None
    ):
        # Silently dropping these would leave every worker training the
        # full global batch independently with no all-reduce — the exact
        # looks-distributed-but-isn't failure the serving commands guard.
        raise SystemExit(
            "--num-processes/--process-id require --multihost (TPU pod "
            "auto-detect) or --coordinator host:port"
        )
    return RunConfig(
        model=args.model,
        num_classes=args.num_classes,
        batch_size=args.batch_size,
        image_size=args.image_size,
        policy=args.policy,
        backend=args.backend,
        weights_dir=args.weights_dir,
        data_dim=args.data_dim,
        model_dim=args.model_dim,
        calib_method=args.calib_method,
        calib_per_channel=getattr(args, "calib_per_channel", False),
        seed=args.seed,
        multihost=multihost,
        coordinator=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )
