#!/usr/bin/env python
"""Headline benchmark: ResNet-50 batch-256 inference images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is the
driver-supplied north star: >=80% of the v5e bf16 MXU roofline at ResNet-50
batch-256.  ``vs_baseline`` is measured_throughput / (0.8 * roofline) —
1.0 means the target is exactly met, >1.0 beats it.

Every serving backend (xla / pallas / pallas_block / int8) is measured and
reported under ``backend_images_per_sec``; the headline ``value`` is the best
of them, with ``backend`` naming the winner — so a kernel-layer win shows up
without editing this harness.  The metric label and ``compute_precision``
name the winner's precision honestly: when an int8 engine wins, its
``mxu_utilization`` is judged against the int8 peak (2x bf16), and the best
bf16-only number is reported alongside as ``bf16_images_per_sec`` /
``bf16_mxu_utilization`` so both rooflines are visible in one line.

Latency is reported three ways (VERDICT r1 item 9 + r2 weak #7):
``p50_latency_ms`` / ``p99_latency_ms`` are full round trips as a serving
frontend sees them (tunnel RTT included on this host); ``device_latency_ms``
is the marginal on-device batch-1 cost from one chained-harness run (RTT
subtracted) — the number that tracks engine progress round over round; and
``local_p50_ms`` is the median of several independent chained-harness
samples — the engine-local p50 a local-process server would see per request.

Runs on whatever jax.devices() offers; on a CPU host it shrinks the workload
so the pipeline is still exercised end-to-end (numbers are then not
meaningful and the JSON says so via "platform").

On TPU the bench additionally SELF-TUNES the int8_chain backend
(``greedy_tune``): the round-3/4 kernel variants live behind default-off
fused.py flags pending on-chip validation, and the chip window may open only
for this very run — so the bench greedily A/Bs each armed flag on the spot,
accepts a flag only if it wins by >1% AND passes an argmax/rel-MAE parity
gate against the default engine's logits, and reports the tuned config as a
separate ``int8_chain_tuned`` backend entry (eligible for the headline).
Everything is budgeted (RESNETC_BENCH_TUNE_BUDGET_S, default 600 s — conservative
in case the caller's own timeout is tight; the battery passes 1800 s) and
failure-isolated: a flag that fails to compile is reverted and recorded, and
RESNETC_BENCH_TUNE=0 disables the whole phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models import resnet
from resnetc_tpu.serve import InferenceEngine, bench_latency, bench_throughput
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.flops import model_flops

# Peak MXU throughput per chip by compute precision. TPU v5e: 197 TFLOP/s
# bf16, 394 TOP/s int8 (the 2x is real on this part — measured ~308 TF/s
# chained int8 dots vs ~179 bf16, tools/probe_int8_mxu.py).  Utilization is
# judged against the peak of the engine that actually ran; the int8 engines
# must not be flattered by dividing by the smaller bf16 peak.
PEAK_FLOPS = {"tpu": {"bf16": 197e12, "int8": 394e12}}
#: Backends whose conv FLOPs ALL run on the int8 MXU path.  The plain
#: "int8" backend is mixed (1x1s int8, 3x3/stem bf16 — see
#: fused_forward_int8) and is judged conservatively against the bf16 peak
#: with an explicit mixed label.
INT8_BACKENDS = {"int8_chain", "int8_chain_tuned"}
MIXED_INT8_BACKENDS = {"int8"}
ROOFLINE_FRACTION = 0.8  # the BASELINE.json target (against the bf16 roofline)

#: Armed default-off fused.py flag candidates, in expected-impact order (the
#: same greedy order as tools/battery/auto_best.py).  BASIC_DS_INT8 is
#: omitted: it only affects the basic (resnet18/34) family, not the
#: resnet50 headline.
TUNE_CANDIDATES = [
    # CHAIN_PIPE_DMA is deliberately absent: closed NEGATIVE on chip
    # 2026-08-20 (~4% slower where it compiles; the proj form hits a
    # Mosaic 128-lane slice constraint) — see fused.py's flag comment.
    # L1_PIXEL_PAIR leads: ROOFLINE.json (2026-08-20) puts the L1 Pallas
    # kernels at 0.18-0.30 of the same-window floor — the largest measured
    # recoverable block of time in the whole engine — and the pp kernels
    # attack it from the kernel side (N=128 dots, dense kw slots).  The
    # HYBRID candidates follow: measured on top of pp if it wins, they
    # then ask whether XLA bf16 *still* beats the best int8 L1.
    ("L1_PIXEL_PAIR", True),
    ("HYBRID_XLA_STAGES", (0,)),
    ("HYBRID_XLA_STAGES", (0, 1)),
    ("STAGE_FUSE_PROJ", True),
    ("DS_CONV3_ONEDOT", True),
    # Per-stage pair gather: the 2026-08-20 isolated A/B showed the pair
    # DMA wins ONLY at the L2 transition (-13%; L3 neutral, L4 negative),
    # so the stage-selective flag is tried before the global bool.
    ("DS_PAIR_DMA_STAGES", (1,)),
    ("DS_PAIR_DMA", True),
    ("STEM_CIN_PAD", 4),
]


def logits_parity(
    ref,
    run_fn,
    x,
    *,
    argmax_thresh: float = 0.995,
    rel_mae_thresh: float = 0.05,
):
    """(ok, info): run_fn(x) logits under CURRENT flags vs the default-config
    reference.  One copy of the acceptance gate — bench.py's self-tune and
    the battery's auto_best.py must never desynchronize on what counts as
    parity (the thresholds here decide what becomes a serving default)."""
    lg = np.asarray(jax.device_get(jax.jit(run_fn)(x)).astype(np.float32))
    am = float(np.mean(np.argmax(lg, axis=-1) == np.argmax(ref, axis=-1)))
    rel = float(np.mean(np.abs(lg - ref)) / (np.mean(np.abs(ref)) + 1e-12))
    return (am >= argmax_thresh and rel <= rel_mae_thresh), {
        "argmax_match": round(am, 4),
        "rel_mae": round(rel, 5),
    }


def hybrid_shadows(name, value, accepted) -> str | None:
    """Reason a candidate is meaningless under the accepted flags, else None.

    An accepted HYBRID_XLA_STAGES prefix serves its stages as XLA bf16, so
    flags that only alter the int8 kernels of COVERED stages would A/B two
    identical programs — burning 4+ full e2e measures and able to persist a
    weather fluke to TUNED.json (ADVICE r4 #2).  STAGE_FUSE_PROJ only
    affects stage 0's run-fusion; the DS_* flags affect the ds kernels
    entering stages 1-3, which stay int8 unless the prefix covers all of
    them.  STEM_CIN_PAD stays live (the stem is XLA on every config)."""
    hyb = accepted.get("HYBRID_XLA_STAGES")
    if not hyb:
        return None
    if name in ("STAGE_FUSE_PROJ", "L1_PIXEL_PAIR") and 0 in hyb:
        return "stage 0 served by XLA under accepted HYBRID_XLA_STAGES"
    if name in ("DS_PAIR_DMA", "DS_CONV3_ONEDOT") and {1, 2, 3} <= set(hyb):
        return "all ds stages served by XLA under accepted HYBRID_XLA_STAGES"
    return None


def greedy_tune(
    target,
    candidates,
    measure,
    parity,
    *,
    budget_s: float,
    min_win: float = 0.01,
    shadow=hybrid_shadows,
    now=time.perf_counter,
    log=lambda s: print(s, file=sys.stderr),
):
    """Greedy on-the-spot flag search with parity gating and a time budget.

    ``target`` is the module/object holding the flags; ``candidates`` is an
    ordered list of (attr_name, trial_value).  ``measure()`` returns
    seconds/iter under the CURRENT flag settings; ``parity()`` returns
    (ok, info_dict) comparing the current config's outputs to the default
    config's.  Every candidate is judged against a PAIRED CONTROL: the
    incumbent config (accepted flags so far, candidate off) re-measured
    immediately after the candidate.  On this machine the effective HBM/MXU
    rates drift 20-60% over tens of minutes (PERF.md round 4), so a
    candidate compared to a baseline measured minutes earlier ranks the
    weather, not the flag — the adjacent pair shares one weather sample.
    A candidate is accepted only when it beats its control by ``min_win``
    AND passes parity; accepted flags STAY SET on ``target`` when this
    returns (so the caller's subsequent traces use them), rejected or
    failed ones are restored.  Candidates past the budget are skipped and
    recorded as such.  Returns (accepted, base_sec, best_sec, records).
    """
    defaults = {k: getattr(target, k) for k, _ in candidates}
    accepted: dict = {}
    records: list[dict] = []
    start = now()
    try:
        base = measure()
    except Exception as e:  # baseline must exist before any A/B
        log(f"tune: baseline measure failed: {type(e).__name__}: {e}")
        return {}, None, None, [{"flag": "<baseline>", "status": "fail",
                                 "error": f"{type(e).__name__}: {e}"}]
    best = base
    for name, value in candidates:
        # A flag may appear with several trial values (HYBRID_XLA_STAGES
        # (0,) then (0,1)): the incumbent for its control/restore is the
        # previously ACCEPTED value, not the pre-tune default — hill-climb,
        # don't judge the second value against a config already beaten.
        incumbent = accepted.get(name, defaults[name])
        if getattr(target, name) == value:
            # Already the live default (e.g. TUNED.json flipped it) — an
            # A/B against itself would waste a full-network compile.
            records.append({"flag": name, "status": "already-default"})
            continue
        reason = shadow(name, value, accepted) if shadow else None
        if reason:
            records.append({"flag": name, "status": "shadowed",
                            "reason": reason})
            log(f"tune: {name}={value}: [shadowed] {reason}")
            continue
        if now() - start > budget_s:
            records.append({"flag": name, "status": "skipped-budget"})
            continue
        try:
            setattr(target, name, value)
            sec = measure()
            # Paired control: incumbent config, measured adjacently.  The
            # program was already compiled for the baseline (or a prior
            # control), so this costs a retrace + one short device run,
            # not a Mosaic recompile.
            setattr(target, name, incumbent)
            ctrl = measure()
            rec = {"flag": name, "value": value, "ms": round(sec * 1e3, 3),
                   "control_ms": round(ctrl * 1e3, 3)}
            if sec < ctrl * (1.0 - min_win):
                # Confirmation pair: a transient weather spike on ONE side
                # of the A/B fakes a >1% win (measured: a 30 ms control vs
                # 23.4 everywhere else "accepted" STEM_CIN_PAD, 2026-08-19).
                # The win must reproduce on a second adjacent pair.
                setattr(target, name, value)
                sec2 = measure()
                setattr(target, name, incumbent)
                ctrl2 = measure()
                rec["confirm_ms"] = round(sec2 * 1e3, 3)
                rec["confirm_control_ms"] = round(ctrl2 * 1e3, 3)
                if sec2 >= ctrl2 * (1.0 - min_win):
                    rec["status"] = "rejected-unconfirmed"
                    records.append(rec)
                    log(f"tune: {name}={value}: {rec['ms']} ms (control"
                        f" {rec['control_ms']}) won, but confirm pair"
                        f" {rec['confirm_ms']} vs {rec['confirm_control_ms']}"
                        " did not reproduce [rejected-unconfirmed]")
                    continue
                setattr(target, name, value)
                ok, info = parity()
                rec["parity"] = info
                if ok:
                    rec["status"] = "accepted"
                    accepted[name] = value
                    best = min(sec, sec2)
                else:
                    rec["status"] = "parity-fail"
                    setattr(target, name, incumbent)
            else:
                rec["status"] = "rejected"  # flag already restored above
            records.append(rec)
            log(f"tune: {name}={value}: {rec['ms']} ms"
                f" (control {rec['control_ms']}) [{rec['status']}]")
        except Exception as e:  # a broken candidate must not kill the bench
            setattr(target, name, incumbent)
            records.append({"flag": name, "status": "fail",
                            "error": f"{type(e).__name__}: {e}"})
            log(f"tune: {name}={value}: FAIL {type(e).__name__}: {e}")
    # Restore every non-accepted flag (accepted ones stay live for the
    # caller's re-measure / latency traces).
    for k, v in defaults.items():
        if k not in accepted:
            setattr(target, k, v)
    return accepted, base, best, records


def main() -> None:
    # Persistent compile cache: the tuning phase re-traces the full network
    # per flag candidate, and the battery may already have compiled the same
    # programs — share one on-disk cache regardless of the caller's env.
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        try:
            jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        except Exception:
            pass  # older jax or read-only fs: cache is an optimization only
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    model = "resnet50"
    batch = 256 if on_tpu else 8
    steps = 30 if on_tpu else 3
    image_size = 224 if on_tpu else 64

    cfg = resnet.get_config(model)
    variables = resnet.init(cfg, jax.random.key(0))

    # Inputs are device-resident bf16 — the engine's compute dtype (the
    # serving contract: the host pipeline ships bf16, halving the transfer
    # and skipping a per-batch 154MB->77MB on-device cast that is not part
    # of the engine).  Calibration below uses the same distribution.
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, image_size, image_size, 3), dtype=np.float32
        ),
        jnp.bfloat16,
    )

    # Measure every backend; headline = the best. Pallas interpret mode on a
    # CPU host is far too slow to smoke here — tests cover it — so CPU runs
    # only exercise the XLA backend.  RESNETC_BENCH_TUNE=force additionally
    # runs int8_chain + the tuning phase off-TPU (slow interpret mode, tiny
    # workload) — the only way to execute the TPU-only glue below before the
    # unattended chip window does; pair with RESNETC_BENCH_TUNE_ITERS=2 and
    # a small RESNETC_BENCH_TUNE_BUDGET_S.
    tune_mode = os.environ.get("RESNETC_BENCH_TUNE", "1")
    backends = (
        ["xla", "pallas", "pallas_block", "int8", "int8_chain"]
        if on_tpu
        else (["xla", "int8_chain"] if tune_mode == "force" else ["xla"])
    )
    per_backend: dict[str, float | None] = {}
    engines: dict[str, InferenceEngine] = {}
    for b in backends:
        try:
            # int8 backends calibrate on the eval distribution itself (a
            # slice of the bench batch) — not the unit-normal fallback —
            # so the headline number's quantization matches its data.
            engines[b] = InferenceEngine(
                cfg, variables, policy=BF16, backend=b,
                calib_batch=images[: min(8, batch)],
            )
            tp = bench_throughput(
                engines[b], images, steps=steps, repeats=3 if on_tpu else 1
            )
            per_backend[b] = round(tp.images_per_sec, 2)
        except Exception as e:  # a broken backend must not kill the bench
            print(f"bench: backend {b} failed: {type(e).__name__}: {e}", file=sys.stderr)
            per_backend[b] = None

    # --- On-the-spot flag tuning (TPU only; see module docstring). -------
    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    tuning = None
    tuned_ctx = None  # (fused module, pre-tune flag values) while flags are live
    if (
        (on_tpu or tune_mode == "force")
        and engines.get("int8_chain") is not None
        and tune_mode != "0"
    ):
        from resnetc_tpu.ops.pallas import fused

        eng = engines["int8_chain"]
        pre_tune_flags = {k: getattr(fused, k) for k, _ in TUNE_CANDIDATES}
        tuned_ctx = (fused, pre_tune_flags)
        # Default-config logits are the parity reference: every armed flag is
        # bit-match pinned vs flag-off in interpret mode, so on-chip logits
        # must agree up to accumulation-order noise.
        ref = np.asarray(jax.device_get(eng.logits(images)).astype(jnp.float32))

        def _chain_call(x):
            # interpret covers the off-TPU force mode; on TPU it's False.
            return fused.fused_forward_int8_chain(
                cfg, eng.folded, eng._chain_scales, x, interpret=not on_tpu
            )

        measure_iters = int(os.environ.get("RESNETC_BENCH_TUNE_ITERS", "16"))

        def measure():
            # Median over 3 pairs on TPU: accept/reject sits at the 1% level
            # and one pair's diff carries ~1% of tunnel RTT jitter.
            return chained_seconds_per_iter(
                _chain_call, images, iters=measure_iters,
                repeats=3 if on_tpu else 1,
            )

        accepted, _, _, records = greedy_tune(
            fused,
            TUNE_CANDIDATES,
            measure,
            lambda: logits_parity(ref, _chain_call, images),
            budget_s=float(os.environ.get("RESNETC_BENCH_TUNE_BUDGET_S", "600")),
        )
        tuning = {
            "accepted_flags": accepted,
            "candidates": records,
            # Flags TUNED.json already flipped before this run (audit trail).
            "tuned_defaults": getattr(fused, "TUNED_DEFAULTS", {}),
        }
        if accepted:
            # Accepted flags are still set: clear the engine's per-shape
            # compile cache so throughput/latency re-trace under them, and
            # report the tuned config as its own headline-eligible entry.
            # Guarded: everything above is already measured, and the one
            # unattended JSON line must survive a re-measure failure.
            try:
                eng._compiled.clear()
                tp = bench_throughput(eng, images, steps=steps)
                per_backend["int8_chain_tuned"] = round(tp.images_per_sec, 2)
                backends = backends + ["int8_chain_tuned"]
                engines["int8_chain_tuned"] = eng
            except Exception as e:
                print(
                    f"bench: tuned re-measure failed: {type(e).__name__}: {e}",
                    file=sys.stderr,
                )
                tuning["remeasure_error"] = f"{type(e).__name__}: {e}"
                for k, v in pre_tune_flags.items():
                    setattr(fused, k, v)
                eng._compiled.clear()

    best_backend = max(
        (b for b in backends if per_backend[b] is not None),
        key=lambda b: per_backend[b],
    )
    best_ips = per_backend[best_backend]

    # Config consistency: accepted tune flags are module globals, so ANY
    # engine traced from here on would silently run the tuned config.  If
    # the labeled best is not the tuned entry (noise on the re-measure, or
    # a non-int8 winner), restore the pre-tune flags so the latency numbers
    # below measure exactly the config the headline names.
    if best_backend != "int8_chain_tuned" and tuned_ctx is not None:
        fused_mod, pre_flags = tuned_ctx
        if any(getattr(fused_mod, k) != v for k, v in pre_flags.items()):
            for k, v in pre_flags.items():
                setattr(fused_mod, k, v)
            engines["int8_chain"]._compiled.clear()

    # Latency: RTT-inclusive round trips (what a remote frontend waits for)
    # plus device-only marginal cost (what the engine itself costs).
    lat_engine = engines[best_backend]
    lat = bench_latency(
        lat_engine,
        images[:1],
        samples=50 if on_tpu else 5,
        warmup=5 if on_tpu else 1,
    )
    run = lat_engine._fn()
    folded = lat_engine.folded
    # batch-1 step is sub-ms: one pair's chain-length diff (~6 ms) is inside
    # the tunnel's RTT jitter — long chain + median over pairs.
    device_lat_s = chained_seconds_per_iter(
        lambda x: run(folded, x),
        images[:1],
        iters=64 if on_tpu else 4,
        repeats=7 if on_tpu else 1,
    )
    # Engine-local p50 (tunnel RTT excluded): median over independent
    # chained-harness samples — the VERDICT-r2 third latency field.
    from resnetc_tpu.serve import bench_local_latency

    local_lat = bench_local_latency(
        lat_engine,
        images[:1],
        runs=7 if on_tpu else 2,
        iters=32 if on_tpu else 4,
    )

    # Machine-weather stamp: the same-window bare-copy rate (GB/s).  The
    # tunneled chip's effective HBM rate drifts 1.7-3x over tens of minutes
    # (PERF.md round 4) and the DMA-bound int8_chain backend tracks it —
    # recording the rate alongside the headline lets a reader separate
    # engine regressions from machine weather (healthy windows measure
    # ~600+ GB/s on this pattern; degraded ones 250-350).
    window_copy_gbs = None
    if on_tpu:
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
            from roofline_attrib import measure_copy_rate_gbs

            window_copy_gbs = round(measure_copy_rate_gbs(batch), 1)
        except Exception as e:
            print(f"bench: weather stamp failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    flops = model_flops(cfg, image_size)
    peaks = PEAK_FLOPS.get(platform)
    if best_backend in INT8_BACKENDS:
        precision, peak_key = "int8", "int8"
    elif best_backend in MIXED_INT8_BACKENDS:
        precision, peak_key = "mixed-int8/bf16", "bf16"
    else:
        precision, peak_key = "bf16", "bf16"
    # Utilization against the precision the winning engine actually computes
    # in; vs_baseline stays defined against the bf16 roofline (the driver's
    # north-star target) regardless of which engine wins.
    mxu_util = best_ips * flops / peaks[peak_key] if peaks else None
    target = (peaks["bf16"] * ROOFLINE_FRACTION / flops) if peaks else None
    bf16_candidates = [
        b for b in backends
        if b not in INT8_BACKENDS
        and b not in MIXED_INT8_BACKENDS
        and per_backend[b] is not None
    ]
    bf16_ips = (
        max(per_backend[b] for b in bf16_candidates) if bf16_candidates else None
    )
    bf16_util = (
        bf16_ips * flops / peaks["bf16"] if (peaks and bf16_ips) else None
    )

    # Training throughput (fwd+bwd+SGD, BN batch stats), same model/batch.
    from resnetc_tpu import train as train_mod

    tcfg = train_mod.TrainConfig(lr=0.1, policy_name="bf16")
    ts = train_mod.init_train_state(cfg, jax.random.key(1))
    train_batch = batch if on_tpu else 8
    xt = images[:train_batch]
    yt = jnp.asarray(np.arange(train_batch, dtype=np.int32) % 1000)
    lr = jnp.float32(0.1)

    def run_steps(ts, n):
        """n chained steps (each consumes the previous state), then force
        completion with a host fetch — block_until_ready does not actually
        wait on this runtime (see utils/timing.py)."""
        for _ in range(n):
            ts, m = train_mod.train_step(cfg, tcfg, ts, xt, yt, lr)
        return ts, float(m["loss"])

    ts, _ = run_steps(ts, 1)  # compile + warm
    train_steps = 10 if on_tpu else 2
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, 1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    ts, _ = run_steps(ts, train_steps + 1)
    t_many = time.perf_counter() - t0
    train_ips = train_batch * train_steps / max(t_many - t_one, 1e-9)

    result = {
        "metric": f"{model} batch-{batch} inference throughput ({precision} engine)",
        "value": best_ips,
        "unit": "images/sec/chip",
        "vs_baseline": round(best_ips / target, 4) if target else None,
        "baseline": "0.8 x v5e bf16 roofline (BASELINE.json north star)",
        "platform": platform,
        "backend": best_backend,
        "compute_precision": precision,
        "backend_images_per_sec": per_backend,
        "bf16_images_per_sec": bf16_ips,
        "bf16_mxu_utilization": (
            round(bf16_util, 4) if bf16_util is not None else None
        ),
        "image_size": image_size,
        # Against the peak of the precision that ran (int8 peak = 2x bf16).
        "mxu_utilization": round(mxu_util, 4) if mxu_util is not None else None,
        "p50_latency_ms": round(lat.p50_ms, 3),
        "p99_latency_ms": round(lat.p99_ms, 3),
        "device_latency_ms": round(device_lat_s * 1e3, 3),
        "local_p50_ms": round(local_lat.p50_ms, 3),
        "gflops_per_image": round(flops / 1e9, 2),
        "window_copy_gbs": window_copy_gbs,
        "train_images_per_sec": round(train_ips, 2),
        # On-the-spot flag tuning record (None off-TPU / when disabled):
        # which armed fused.py flags won their A/B + parity gate this run.
        "tuning": tuning,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
