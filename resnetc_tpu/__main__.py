"""CLI: the framework's app layer.

Replaces the reference's hardcoded main() (cuda/inference/main.cu:228-254)
and its offline Python sidecars with subcommands:

  python -m resnetc_tpu classify IMG [IMG...]   # decode -> preprocess -> top-1
  python -m resnetc_tpu bench                   # serving throughput/latency
  python -m resnetc_tpu train                   # training loop (synthetic or image dir)
  python -m resnetc_tpu export-weights DIR      # random/loaded weights -> raw-f32 files
  python -m resnetc_tpu convert-images DIR      # JPEG -> reference .bin files
  python -m resnetc_tpu verify                  # parity report vs the torch twin

Every knob the reference bakes in at compile time is a flag here
(see resnetc_tpu.config).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_engine(run):
    import jax

    from resnetc_tpu import checkpoint
    from resnetc_tpu.models import resnet
    from resnetc_tpu.serve import InferenceEngine
    from resnetc_tpu.tensor import policy

    if run.multihost:
        # The serving commands are single-process: each process would build
        # the full batch locally and silently benchmark/classify it alone,
        # which is NOT a distributed run.  Only `train` implements the
        # multi-host data path (per-process shards -> global arrays).
        raise SystemExit(
            "--multihost/--coordinator are supported by the `train` "
            "command only; for multi-chip serving within one host use "
            "--data-dim (see README 'Multi-host')"
        )
    cfg = resnet.get_config(run.model, num_classes=run.num_classes)
    if run.weights_dir:
        variables = checkpoint.load_reference_format(cfg, run.weights_dir)
    else:
        variables = resnet.init(cfg, jax.random.key(run.seed))
    sharding = mesh = None
    if run.data_dim * run.model_dim > 1:
        from resnetc_tpu.parallel import create_mesh, param_shardings

        if run.backend == "int8_chain" and run.model_dim > 1:
            # int8_chain replicates weights and shard_maps only the 'data'
            # axis — a model axis would redundantly compute identical logits
            # on every model rank. Fail fast rather than burn the chips.
            raise SystemExit(
                "--backend int8_chain does not support --model-dim > 1 "
                "(channel TP applies to the XLA backends only); use "
                f"--data-dim {run.data_dim * run.model_dim} instead"
            )
        mesh = create_mesh(run.data_dim, run.model_dim)
        if run.backend != "int8_chain":
            # XLA backends shard the folded tree and let SPMD partition;
            # int8_chain replicates weights and shard_maps the batch (the
            # engine handles it via ``mesh``).
            folded_like = resnet.fold_inference_params(cfg, variables)
            sharding = param_shardings(mesh, folded_like)
    return cfg, InferenceEngine(
        cfg, variables, policy=policy(run.policy),
        backend=run.backend, sharding=sharding, mesh=mesh,
        calib_method=run.calib_method,
        calib_per_channel=run.calib_per_channel,
    )


def cmd_classify(args) -> int:
    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.serve import classify_files

    run = run_config_from_args(args)
    cfg, engine = _build_engine(run)
    labels = None
    if args.labels_file:
        # One class name per line, line i = class index i (the torchvision
        # categories format); indices past the file fall back to numbers.
        with open(args.labels_file) as f:
            labels = [ln.strip() for ln in f]
    classes = classify_files(engine, args.images, image_size=run.image_size)
    for path, cls in zip(args.images, classes):
        # Same readout as the reference's "max index is <idx>" (main.cu:250),
        # one line per image.
        name = (
            f" ({labels[cls]})" if labels and 0 <= cls < len(labels) else ""
        )
        print(f"{path}: class {cls}{name}")
    return 0


def cmd_bench(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.serve import bench_latency, bench_throughput
    from resnetc_tpu.utils.flops import model_flops

    run = run_config_from_args(args)
    cfg, engine = _build_engine(run)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (run.batch_size, run.image_size, run.image_size, 3), dtype=np.float32
        )
    )
    tp = bench_throughput(engine, images, steps=args.steps)
    lat = bench_latency(engine, images[:1], samples=args.latency_samples)
    flops = model_flops(cfg, run.image_size)
    print(json.dumps({
        "model": run.model,
        "backend": run.backend,
        "batch_size": run.batch_size,
        "images_per_sec": round(tp.images_per_sec, 2),
        "p50_latency_ms": round(lat.p50_ms, 3),
        "p99_latency_ms": round(lat.p99_ms, 3),
        "gflops_per_image": round(flops / 1e9, 2),
        "platform": jax.devices()[0].platform,
    }))
    return 0


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnetc_tpu import train
    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.data import synthetic_batches
    from resnetc_tpu.models import resnet
    from resnetc_tpu.utils.metrics import MetricsLogger

    run = run_config_from_args(args)
    if run.multihost:
        # Must precede any device use so every process learns the global
        # topology; afterwards jax.devices()/create_mesh are global and the
        # single-host code below works unchanged (README "Multi-host").
        from resnetc_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=run.coordinator,
            num_processes=run.num_processes,
            process_id=run.process_id,
        )
    cfg = resnet.get_config(run.model, num_classes=run.num_classes)
    tcfg = train.TrainConfig(
        lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
        label_smoothing=args.label_smoothing, policy_name=run.policy,
        remat=args.remat,
    )
    sched = train.cosine_schedule(args.lr, args.steps, warmup_steps=args.warmup_steps)
    log = MetricsLogger(prefix="train")

    ts = train.init_train_state(cfg, jax.random.key(run.seed))
    if args.resume:
        from resnetc_tpu.checkpoint import load_train_state

        ts = load_train_state(args.resume, jax.device_get(ts))
        print(f"resumed from {args.resume} at step {int(ts.step)}")
    mesh = None
    if run.data_dim * run.model_dim > 1:
        from resnetc_tpu.parallel import create_mesh

        mesh = create_mesh(run.data_dim, run.model_dim)
        step_fn, shard_state, _ = train.sharded_train_step(cfg, tcfg, mesh)
        ts = shard_state(ts)
    else:
        def step_fn(ts, x, y, lr):
            return train.train_step(cfg, tcfg, ts, x, y, lr)

    # Multi-host: every process loads only its 1/n slice of the GLOBAL
    # batch (run.batch_size) and the slices assemble into one
    # 'data'-sharded global array before the step.
    n_proc = jax.process_count()
    if n_proc > 1:
        if mesh is None:
            raise SystemExit(
                "multi-host training needs a mesh: set --data-dim (and "
                "optionally --model-dim) to cover all global devices"
            )
        from resnetc_tpu.parallel.distributed import global_batch_slice
        from resnetc_tpu.parallel.distributed import (
            host_local_to_global as to_global,
        )

        _, local_bs = global_batch_slice(run.batch_size)
    else:
        local_bs = run.batch_size

    if args.data_dir:
        from resnetc_tpu.data import ImageFolderLoader

        loader = ImageFolderLoader(
            args.data_dir, batch_size=local_bs, image_size=run.image_size,
            train=True, epochs=10**9, seed=run.seed,
            shard=(jax.process_index(), n_proc) if n_proc > 1 else None,
            # Multi-host assembles global arrays itself below; host arrays
            # avoid a redundant device round trip per step.
            to_device=n_proc == 1,
        )

        def take(it, n):
            for i, item in enumerate(it):
                if i >= n:
                    break
                yield item

        batches = take(iter(loader), args.steps)
    else:
        batches = synthetic_batches(
            batch_size=local_bs, image_size=run.image_size,
            steps=args.steps, num_classes=run.num_classes,
            seed=run.seed + jax.process_index(),
        )
    if n_proc > 1:
        from jax.sharding import PartitionSpec as P

        spec = P(("data",))
        batches = (
            (to_global(np.asarray(x), mesh, spec), to_global(np.asarray(y), mesh, spec))
            for x, y in batches
        )
    import time

    t_last = time.perf_counter()
    for i, (x, y) in enumerate(batches):
        ts, m = step_fn(ts, x, y, sched(ts.step))
        if (i + 1) % args.log_every == 0:
            now = time.perf_counter()
            log.log({
                "step": int(jax.device_get(ts.step)),
                "loss": float(m["loss"]),
                "accuracy": float(m["accuracy"]),
                "images_per_sec": run.batch_size * args.log_every / (now - t_last),
            })
            t_last = now
    if args.checkpoint_dir:
        from resnetc_tpu.checkpoint import save_train_state

        # Orbax is multi-host aware: pass the (possibly globally sharded)
        # state as-is — every process participates in the save.  Single
        # host keeps the host-fetch so the checkpoint never holds device
        # buffers alive.
        save_train_state(
            args.checkpoint_dir, ts if n_proc > 1 else jax.device_get(ts)
        )
        print(f"saved checkpoint to {args.checkpoint_dir}")
    if args.export_weights_dir:
        # Bridge to the serving CLIs: classify/eval/bench load the
        # reference's raw-f32 format via --weights-dir.
        from resnetc_tpu.checkpoint import save_reference_format
        from resnetc_tpu.models.resnet import merge_params_state

        if n_proc > 1:
            # DP replicates params, so every process holds the full values;
            # fetch the local replica and write from process 0 only.
            # (Channel-TP shards params — re-run export single-host from
            # the Orbax checkpoint in that case.)
            if run.model_dim > 1:
                raise SystemExit(
                    "--export-weights-dir with --model-dim > 1 on multi-host "
                    "is unsupported: params are channel-sharded; restore the "
                    "Orbax checkpoint single-host and export from there"
                )
            get = lambda t: jax.tree.map(
                lambda a: np.asarray(a.addressable_data(0)), t
            )
            if jax.process_index() != 0:
                return 0
        else:
            get = jax.device_get
        variables = merge_params_state(get(ts.params), get(ts.bn_state))
        n = save_reference_format(variables, args.export_weights_dir)
        print(f"exported {n} weight files to {args.export_weights_dir}")
    return 0


def cmd_eval(args) -> int:
    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.data import evaluate

    run = run_config_from_args(args)
    cfg, engine = _build_engine(run)
    result = evaluate(
        engine, args.data_dir,
        batch_size=run.batch_size, image_size=run.image_size,
    )
    print(json.dumps({"model": run.model, **result}))
    return 0


def cmd_export_weights(args) -> int:
    import jax

    from resnetc_tpu import checkpoint
    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.models import resnet

    run = run_config_from_args(args)
    cfg = resnet.get_config(run.model, num_classes=run.num_classes)
    if run.weights_dir:
        variables = checkpoint.load_reference_format(cfg, run.weights_dir)
    else:
        variables = resnet.init(cfg, jax.random.key(run.seed))
    n = checkpoint.save_reference_format(variables, args.out_dir)
    print(f"wrote {n} weight files to {args.out_dir} (save_weights.py format)")
    return 0


def cmd_convert_images(args) -> int:
    """JPEG dir -> reference test_bins/*.bin (convert_imgs_to_bin.py parity)."""
    from pathlib import Path

    from resnetc_tpu.data.preprocess import preprocess_file, save_input_bin

    src = Path(args.image_dir)
    out = Path(args.out_dir)
    n = 0
    for img in sorted(src.iterdir()):
        if img.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        x = preprocess_file(img)
        save_input_bin(x, out / (img.stem + ".bin"))
        n += 1
    print(f"converted {n} images to {out}")
    return 0


def cmd_verify(args) -> int:
    import numpy as np

    from resnetc_tpu.config import run_config_from_args
    from resnetc_tpu.models import resnet
    from resnetc_tpu.tensor import policy as get_policy
    from resnetc_tpu.verify.harness import logit_report
    from resnetc_tpu.verify.twin import build_twin

    run = run_config_from_args(args)
    cfg = resnet.get_config(run.model, num_classes=run.num_classes)
    twin = build_twin(cfg, seed=run.seed)
    twin.eval()
    x = np.random.default_rng(run.seed).standard_normal(
        (args.verify_batch, 3, run.image_size, run.image_size)
    ).astype(np.float32)
    rep = logit_report(cfg, twin, x, policy=get_policy(run.policy))
    result = {
        "model": run.model,
        "policy": run.policy,
        "logit_mae": rep.mae,
        "max_abs_err": rep.max_abs_err,
        "argmax_match_rate": rep.argmax_match_rate,
        "pass": bool(rep.argmax_match and (run.policy != "fp32" or rep.mae <= 1e-3)),
    }
    if args.per_stage:
        from resnetc_tpu.verify import stage_parity_report

        result["stages"] = stage_parity_report(
            cfg, twin, x, policy=get_policy(run.policy)
        )
    print(json.dumps(result))
    return 0 if rep.argmax_match else 1


def main(argv: list[str] | None = None) -> int:
    from resnetc_tpu.config import add_run_args

    parser = argparse.ArgumentParser(prog="resnetc_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("classify", help="classify image files (top-1 index)")
    add_run_args(p)
    p.add_argument("images", nargs="+")
    p.add_argument(
        "--labels-file", default=None,
        help="class-name file (one name per line, line i = index i) to "
        "print names alongside indices",
    )
    p.set_defaults(fn=cmd_classify)

    p = sub.add_parser("bench", help="serving throughput + latency")
    add_run_args(p)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--latency-samples", type=int, default=50)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("train", help="training loop (synthetic data)")
    add_run_args(p)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument(
        "--remat", action="store_true",
        help="checkpoint residual blocks in the backward pass (activation "
        "memory ~O(depth) smaller for ~30%% recompute FLOPs)",
    )
    p.add_argument("--warmup-steps", type=int, default=5)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument(
        "--data-dir", default=None,
        help="ImageFolder tree (root/<class>/<img>); synthetic data if omitted",
    )
    p.add_argument(
        "--export-weights-dir", default=None,
        help="after training, also export raw-f32 weight files (for "
        "--weights-dir in classify/eval/bench)",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="top-1 accuracy over an ImageFolder tree")
    add_run_args(p)
    p.add_argument("data_dir")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("export-weights", help="write raw-f32 weight files")
    add_run_args(p)
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_export_weights)

    p = sub.add_parser("convert-images", help="JPEGs -> reference .bin inputs")
    p.add_argument("image_dir")
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_convert_images)

    p = sub.add_parser("verify", help="numeric parity vs the torch twin")
    add_run_args(p)
    p.add_argument("--verify-batch", type=int, default=2)
    p.add_argument(
        "--per-stage", action="store_true",
        help="also report per-stage activation MAE (the check_out workflow)",
    )
    p.set_defaults(fn=cmd_verify)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
