#!/usr/bin/env python
"""Per-phase roofline attribution of the int8_chain engine (VERDICT r3 #2).

The question this answers: where does the remaining time between the
measured e2e and the 0.8x-roofline target irreducibly sit?  For every
phase of fused_forward_int8_chain (stem / pool / pad / each block kernel)
it compares

  measured ms        -- prefix-diff attribution (profile_i8chain harness)
  DMA floor ms       -- phase HBM bytes / SAME-WINDOW measured copy rate
  MXU floor ms       -- phase MAC count / same-window measured MXU rate
  floor = max(both)  -- the roofline bound for that phase, at the rates
                        the machine is actually delivering in this window

and prints the per-phase efficiency (floor/measured).  A phase at ~1.0 is
at the machine's speed of light for its byte/FLOP mix — no kernel change
can improve it without changing the bytes or the math.  The summary also
prices the whole network at the v5e SPEC rates (819 GB/s HBM, 394 TOP/s
int8, 197 TF/s bf16) — the ceiling img/s IF the tunnel-attached part
delivered datasheet rates.

Rates are measured in the same process, adjacent to the phase runs,
because on this machine the effective HBM/MXU rates drift 20-60% over
tens of minutes (PERF.md round 4) — floors computed from stale or spec
rates would misattribute weather to code.

Byte model notes (documented approximations, all phase-local):
  * stem: the cin-pad materializes a padded copy of the input (write +
    read), then the conv reads it; quantize fuses into the conv epilogue
    so the output crosses HBM as int8.
  * prefix cuts materialize a bf16 NHWC tap; consecutive diffs inside a
    stage cancel it exactly, stage-boundary diffs absorb the size change
    (small vs the block traffic).
  * chain conv2 MACs count the PADDED dot (kw slots pad to 128 lanes at
    c=64, plus the hp/wp halo rows) — what the MXU actually executes.

Usage:
  python tools/roofline_attrib.py                # full on-chip run
  python tools/roofline_attrib.py --static       # byte/MAC table only (no device)
  python tools/roofline_attrib.py --batch 256 --out ROOFLINE.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# v5e datasheet peaks (BASELINE.md): the "perfect machine" reference rates.
SPEC = {"copy_gbs": 819.0, "int8_tops": 394.0, "bf16_tfs": 197.0}


def phase_model(cfg, batch: int, *, stem_cin: int = 4) -> list[dict]:
    """Per-phase HBM bytes and MAC counts for fused_forward_int8_chain,
    per-block attribution (same phase names as tools/profile_i8chain).

    Mirrors the kernel geometry exactly: chain rows are the PADDED
    (hp, wp) layout of block.chain_meta, conv2 counts the kw-slot-padded
    dot (slot = round_up(c, 128)), the s2-ds kernel counts its 4-plane
    conv1 and 3-tap conv2, and the tail block's emit_mean write is the
    pooled (B, 4c) f32 block, not the full activation.
    """
    from resnetc_tpu.ops.pallas.block import chain_meta

    B = batch
    widths = [64, 128, 256, 512]
    phases: list[dict] = []

    h0, h1 = 112, 56  # after stem / after pool (224px input)
    # stem (bf16 MXU): padded-input materialization (write+read) + padded
    # conv read + int8 quantized output (quantize fused into the epilogue).
    phases.append(dict(
        name="stem", kind="bf16",
        bytes=3 * B * 224 * 224 * stem_cin * 2 + B * h0 * h0 * 64,
        macs=B * h0 * h0 * 64 * 7 * 7 * stem_cin,
    ))
    # maxpool 3x3/2 on int8 (quantize commutes with max).
    phases.append(dict(
        name="maxpool", kind="bw",
        bytes=B * h0 * h0 * 64 + B * h1 * h1 * 64, macs=0,
    ))
    # pad_for_chain: int8 NHWC -> padded chain rows.
    hp, wp = chain_meta(0, h1, h1)
    phases.append(dict(
        name="quant+pad", kind="bw",
        bytes=B * h1 * h1 * 64 + B * hp * wp * 64, macs=0,
    ))

    h, cin = h1, 64
    n_stages = len(cfg.stage_blocks)
    for stage in range(n_stages):
        c, c4 = widths[stage], 4 * widths[stage]
        slot = max(128, c)  # kw slots pad to full 128 lanes (c=64 case)
        nb = cfg.stage_blocks[stage]
        for b in range(nb):
            last = stage == n_stages - 1 and b == nb - 1
            if b == 0 and stage > 0:
                # stride-2 phase-plane ds kernel.
                hp_in, wp_in = chain_meta(0, h, h)
                hq, wq = hp_in // 2, wp_in // 2
                h = (h + 1) // 2
                hp2, wp2 = chain_meta(0, h, h)
                rows_q = B * hq * wq
                macs = (
                    rows_q * 4 * cin * c      # conv1 over 4 phase planes
                    + rows_q * 9 * c * c      # conv2: 3 (M,3c)@(3c,c) dots
                    + rows_q * c * c4         # conv3 (onedot)
                    + rows_q * cin * c4       # stride-2 projection shortcut
                )
                byts = B * hp_in * wp_in * cin + B * hp2 * wp2 * c4
                name = f"L{stage + 1}b0 s2-ds"
            else:
                hp, wp = chain_meta(0, h, h)
                rows = B * hp * wp
                cin_b = cin if (b == 0 and stage == 0) else c4
                macs = (
                    rows * cin_b * c                        # conv1
                    + (rows + 2 * wp) * 3 * slot * 3 * c    # conv2 (padded)
                    + rows * c * c4                         # conv3
                )
                if b == 0 and stage == 0:
                    macs += rows * cin_b * c4  # layer1 projection shortcut
                out_bytes = B * c4 * 4 if last else rows * c4  # emit_mean tail
                byts = rows * cin_b + out_bytes
                name = (
                    f"L{stage + 1}b{b} "
                    + ("s1-ds" if (b == 0 and stage == 0) else "chain")
                )
            # int8 weights ride the auto-pipeline once per kernel (small).
            macs_w = cin * c + 9 * c * c + c * c4 + (cin * c4 if b == 0 else 0)
            phases.append(dict(name=name, kind="int8", bytes=byts + macs_w, macs=macs))
            cin = c4
    return phases


# --------------------------------------------------------------------------
# Same-window machine rates.
# --------------------------------------------------------------------------

def measure_copy_rate_gbs(batch: int) -> float:
    """Bare Pallas copy at the L1 chain geometry ((B*hp*wp, 256) int8 in,
    same out) — the measured DMA floor for the auto-pipelined window DMA
    every chain kernel rides (r4s3 measured the full L1 kernel EQUAL to
    this floor).  Returns GB/s over read+write bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from resnetc_tpu.ops.pallas.block import chain_meta
    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    hp, wp = chain_meta(0, 56, 56)
    bt = 4
    rows_bt = bt * hp * wp
    n = batch // bt
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (n * rows_bt, 256)),
        jnp.int8,
    )

    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]
        # Salt the first tile so no iteration can be elided or hoisted.
        o_ref[0:8, 0:128] = (
            x_ref[0:8, 0:128].astype(jnp.float32) + s_ref[0, 0]
        ).astype(jnp.int8)

    copy = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((rows_bt, 256), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows_bt, 256), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
    )

    def step(salt, xc):
        out = copy(salt * 1e-30, xc)
        return jax.lax.slice(out, (0, 0), (8, 128)).astype(jnp.float32)

    sec = chained_seconds_per_iter(
        step, jnp.zeros((8, 128), jnp.float32), iters=8, repeats=5, consts=(x,)
    )
    return 2 * x.size / sec / 1e9


def measure_mxu_rates() -> tuple[float, float]:
    """(int8 TOP/s, bf16 TF/s) from chained 4096^3 dots, salted via
    dynamic-update-slice and carrying a FULL reduction of y (the health.py
    pattern).  Both halves of that pattern are load-bearing: a scalar salt
    distributes and the dot hoists, and a SLICED return lets XLA narrow the
    dot to the consumed rows — the first version of this function returned
    y[0:8, 0:128] and read 11,024 "TF/s" on a 197 TF/s part (2026-08-20).
    The full-network reduce adds ~0.1 ms over the dot, so the returned rate
    is the deliverable chained rate (health reads ~172-179 TF/s healthy vs
    the 197 spec peak), which is exactly what phase floors should use."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    rng = np.random.default_rng(0)
    flops = 2 * 4096**3

    def rate(dtype, pet) -> float:
        if dtype == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 128, (4096, 4096)), jnp.int8)
            b = jnp.asarray(rng.integers(-127, 128, (4096, 4096)), jnp.int8)
        else:
            a = jnp.asarray(rng.standard_normal((4096, 4096), np.float32), dtype)
            b = jnp.asarray(rng.standard_normal((4096, 4096), np.float32), dtype)

        def step(salt, ac, bc):
            patch = jnp.full((8, 128), salt * 1e-30, jnp.float32).astype(dtype)
            a2 = jax.lax.dynamic_update_slice(ac, patch, (0, 0))
            y = jax.lax.dot_general(
                a2, bc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=pet,
            )
            return jnp.sum(y.astype(jnp.float32))

        sec = chained_seconds_per_iter(
            step, jnp.float32(0), iters=24, repeats=5, consts=(a, b),
        )
        return flops / sec / 1e12

    return rate(jnp.int8, jnp.int32), rate(jnp.bfloat16, jnp.float32)


# --------------------------------------------------------------------------


def floor_ms(ph: dict, copy_gbs: float, int8_tops: float, bf16_tfs: float):
    dma = ph["bytes"] / (copy_gbs * 1e9) * 1e3
    if ph["kind"] == "int8":
        mxu = 2 * ph["macs"] / (int8_tops * 1e12) * 1e3
    elif ph["kind"] == "bf16":
        mxu = 2 * ph["macs"] / (bf16_tfs * 1e12) * 1e3
    else:
        mxu = 0.0
    return dma, mxu


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--static", action="store_true",
                    help="print the byte/MAC model at spec rates; no device")
    ap.add_argument("--out", default=str(REPO / "ROOFLINE.json"))
    args = ap.parse_args()

    from resnetc_tpu.models import resnet

    cfg = resnet.get_config("resnet50")
    phases = phase_model(cfg, args.batch)

    tot_bytes = sum(p["bytes"] for p in phases)
    tot_int8 = sum(p["macs"] for p in phases if p["kind"] == "int8")
    tot_bf16 = sum(p["macs"] for p in phases if p["kind"] == "bf16")
    sol_spec = sum(
        max(floor_ms(p, SPEC["copy_gbs"], SPEC["int8_tops"], SPEC["bf16_tfs"]))
        for p in phases
    )
    print(f"model: resnet50 b{args.batch} int8_chain | "
          f"HBM {tot_bytes / 1e9:.2f} GB, int8 {2 * tot_int8 / 1e12:.2f} TOP, "
          f"bf16 {2 * tot_bf16 / 1e12:.3f} TF")
    print(f"speed of light at SPEC rates (819 GB/s, 394 TOP/s, 197 TF/s): "
          f"{sol_spec:.2f} ms -> {args.batch / sol_spec * 1e3:.0f} img/s")

    if args.static:
        hdr = f"  {'phase':<16} {'MB':>7} {'GMAC':>8} {'dma_ms':>7} {'mxu_ms':>7}"
        print(hdr)
        for p in phases:
            dma, mxu = floor_ms(p, SPEC["copy_gbs"], SPEC["int8_tops"], SPEC["bf16_tfs"])
            print(f"  {p['name']:<16} {p['bytes'] / 1e6:7.1f} "
                  f"{p['macs'] / 1e9:8.2f} {dma:7.3f} {mxu:7.3f}")
        return 0

    import jax

    assert jax.devices()[0].platform == "tpu", "full run needs the TPU (use --static)"

    # --- same-window machine rates (adjacent to the phase runs).  Rates are
    # re-measured AFTER the phase sweep too: the weather drifts on exactly
    # the timescale the sweep takes, and floors computed from a stale rate
    # would attribute the drift to kernels.  Floors use the mean; the JSON
    # records both samples so a drifted run is self-labeling.
    copy_gbs0 = measure_copy_rate_gbs(args.batch)
    int8_tops0, bf16_tfs0 = measure_mxu_rates()
    copy_gbs, int8_tops, bf16_tfs = copy_gbs0, int8_tops0, bf16_tfs0
    print(f"window rates (pre): copy {copy_gbs:.0f} GB/s, "
          f"int8 {int8_tops:.0f} TOP/s, bf16 {bf16_tfs:.0f} TF/s", flush=True)

    # --- measured per-phase times (prefix diffs) --------------------------
    sys.path.insert(0, str(REPO / "tools"))
    import profile_i8chain as prof

    import jax.numpy as jnp
    import numpy as np

    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.utils.timing import chained_seconds_per_iter

    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    calib = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 224, 224, 3), np.float32)
    )
    scales = fused.calibrate_chain_scales(cfg, folded, calib)
    qtree = fused.quantize_chain(cfg, folded)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 224, 224, 3), np.float32
        ),
        jnp.bfloat16,
    )

    # Prefix diffs resolve sub-ms phases only if each prefix's own noise is
    # well under the diff: repeats>=5 per timing.py's rule (r4's repeats=3
    # run recorded a NEGATIVE -0.196 ms quant+pad phase); when a diff still
    # comes out negative or tiny, re-measure the ADJACENT pair once and take
    # the better-resolved (larger-magnitude-consistent) sample.
    meas_ms: list[float] = []
    prefix_sec: list[float] = [0.0]
    prefix_fns = [prof.build_prefix(cfg, qtree, scales, cut)
                  for cut in range(1, len(phases) + 1)]
    for cut, ph in enumerate(phases, start=1):
        sec = chained_seconds_per_iter(
            prefix_fns[cut - 1], x, iters=args.iters, repeats=7)
        diff_ms = (sec - prefix_sec[-1]) * 1e3
        if diff_ms <= 0.02 and cut >= 2:
            # Under-resolved: re-sample both prefixes adjacently (shares one
            # weather sample) and use the re-paired diff.
            prev2 = chained_seconds_per_iter(
                prefix_fns[cut - 2], x, iters=args.iters, repeats=7)
            sec2 = chained_seconds_per_iter(
                prefix_fns[cut - 1], x, iters=args.iters, repeats=7)
            diff_ms = (sec2 - prev2) * 1e3
            sec = prefix_sec[-1] + diff_ms / 1e3
        meas_ms.append(diff_ms)
        prefix_sec.append(sec)
        print(f"  measured {ph['name']:<16} {meas_ms[-1]:8.3f} ms", flush=True)
    prev = prefix_sec[-1]

    # Post-sweep rates; floors at the mean of the two weather samples.
    copy_gbs1 = measure_copy_rate_gbs(args.batch)
    int8_tops1, bf16_tfs1 = measure_mxu_rates()
    print(f"window rates (post): copy {copy_gbs1:.0f} GB/s, "
          f"int8 {int8_tops1:.0f} TOP/s, bf16 {bf16_tfs1:.0f} TF/s", flush=True)
    copy_gbs = (copy_gbs0 + copy_gbs1) / 2
    int8_tops = (int8_tops0 + int8_tops1) / 2
    bf16_tfs = (bf16_tfs0 + bf16_tfs1) / 2

    rows = []
    hdr = (f"  {'phase':<16} {'meas_ms':>8} {'dma_fl':>7} {'mxu_fl':>7} "
           f"{'floor':>7} {'eff':>5}")
    print(hdr)
    for ph, meas in zip(phases, meas_ms):
        dma, mxu = floor_ms(ph, copy_gbs, int8_tops, bf16_tfs)
        fl = max(dma, mxu)
        row = dict(ph, measured_ms=round(meas, 3), dma_floor_ms=round(dma, 3),
                   mxu_floor_ms=round(mxu, 3))
        if meas <= 1e-6:
            # Still unresolved after the adjacent re-pair: no efficiency
            # claim (serialized as null — strict-JSON safe, ADVICE r4 #1).
            row["efficiency"] = None
            row["note"] = "phase under-resolved by prefix diffs in this window"
            eff_str = "  n/a"
        else:
            eff = fl / meas
            if eff > 1.0:
                # Measured beat the modeled floor: the phase BYTE MODEL
                # overcounts (e.g. the stem's cin-pad copy fuses into the
                # conv producer, so its write+read never crosses HBM).
                # Clamp the claim and say why, instead of recording >1.
                row["efficiency"] = 1.0
                row["note"] = (f"measured beat modeled floor ({round(eff, 3)}x):"
                               " phase byte model overcounts; clamped")
            else:
                row["efficiency"] = round(eff, 3)
            eff_str = f"{min(eff, 1.0):5.2f}"
        rows.append(row)
        print(f"  {ph['name']:<16} {meas:8.3f} {dma:7.3f} {mxu:7.3f} "
              f"{fl:7.3f} {eff_str}", flush=True)

    e2e_ms = prev * 1e3
    sol_window = sum(max(r["dma_floor_ms"], r["mxu_floor_ms"]) for r in rows)
    summary = {
        "batch": args.batch,
        "e2e_ms": round(e2e_ms, 3),
        "images_per_sec": round(args.batch / prev, 1),
        "window_rates": {
            "copy_gbs": round(copy_gbs, 1),
            "int8_tops": round(int8_tops, 1),
            "bf16_tfs": round(bf16_tfs, 1),
            "pre": [round(copy_gbs0, 1), round(int8_tops0, 1), round(bf16_tfs0, 1)],
            "post": [round(copy_gbs1, 1), round(int8_tops1, 1), round(bf16_tfs1, 1)],
        },
        "sol_ms_at_window_rates": round(sol_window, 3),
        "sol_ms_at_spec_rates": round(sol_spec, 3),
        "sol_img_s_at_spec_rates": round(args.batch / sol_spec * 1e3, 1),
        "e2e_vs_window_sol": round(e2e_ms / sol_window, 3),
        "phases": rows,
        "unix_time": int(time.time()),
    }
    print(f"e2e {e2e_ms:.2f} ms = {summary['images_per_sec']} img/s | "
          f"window speed-of-light {sol_window:.2f} ms "
          f"(ratio {summary['e2e_vs_window_sol']}) | "
          f"spec speed-of-light {sol_spec:.2f} ms")
    # allow_nan=False: the artifact must stay parseable by strict JSON
    # consumers (jq/JSON.parse rejected r4's literal NaN — ADVICE r4 #1).
    Path(args.out).write_text(json.dumps(summary, indent=1, allow_nan=False))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
