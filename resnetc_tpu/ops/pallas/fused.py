"""Whole-model Pallas forward: route every op to its best backend.

The serving-path counterpart of models.resnet.forward_folded, with the
BASELINE.json north-star fusion applied: every conv+BN(+residual)+ReLU group
runs as ONE fused MXU kernel —

- 1x1 convs (incl. strided downsamples) -> gemm.matmul via conv1x1_fused,
  with the residual add and ReLU in the epilogue;
- 3x3 stride-1 convs -> conv3x3_s1_fused (nine-shift implicit GEMM);
- 3x3 stride-2 convs -> conv3x3_s2_fused (phase-plane implicit GEMM);
- the 7x7 stem -> XLA conv (~3% of FLOPs, the one remaining fallback);
- max pool -> pool.max_pool2d; global avg pool + fc -> one matmul epilogue.

Consumes the same BN-folded tree as forward_folded, so the parity tests can
compare the two paths tile-for-tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from resnetc_tpu.models.resnet import ResNetConfig
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.ops.pallas.conv import conv1x1_fused, conv3x3_s1_fused, conv3x3_s2_fused
from resnetc_tpu.ops.pallas.gemm import matmul
from resnetc_tpu.ops.pallas.pool import max_pool2d
from resnetc_tpu.tensor import BF16, DtypePolicy

Pytree = dict

#: Stages (0-based) whose identity-block runs fuse into ONE
#: bottleneck_run_chained_int8 kernel in fused_forward_int8_chain.
#: Measurement-driven (v5e sweep, PERF.md round 3): L1 run-fuses at 1.14x
#: per-block (bt=2; the stage is DMA-heaviest so cutting the inter-block
#: HBM round trip pays); L2/L3/L4 measured 0.70-0.94x — per-block stays.
RUN_FUSE_STAGES: tuple = (0,)

#: When stage 0 run-fuses, also pull the PROJECTION block 0 into the run —
#: the whole layer1 stage as ONE kernel (x in at cin=64, out at c4=256;
#: the 208MB intermediate at ResNet-50 b256 never crosses HBM).  A/B flag.
#: MEASURED NEGATIVE in both forms: std whole-stage 24.56 vs 23.66 ms
#: control (r4, -3.8%); pp whole-stage (routed under L1_PIXEL_PAIR,
#: 2026-08-20 healthy window) 16.11 vs 15.20 ms control (-6%) — the
#: mega-run's scheduling cost exceeds the saved b0->run HBM round trip in
#: every configuration tried.  Kept as a bit-match-tested option only.
STAGE_FUSE_PROJ: bool = False

#: Zero-pad the stem conv's cin (3 -> this value) before the XLA 7x7 on
#: every fused path.  0 = off.  Mathematically exact; flips to the
#: tools/battery/stem_pad.py battery winner if padding beats cin=3.
STEM_CIN_PAD: int = 0

#: Gather the ds megakernels' stride-2 input as two ph-pair DMAs (coarse
#: 15-32 KB contiguous runs) instead of four fine-grained phase planes
#: (cin-byte runs), splitting pw in-kernel via 128-aligned lane slices.
#: A/B flag (interpret bit-match in tests/test_pallas.py).  Measured
#: per-stage 2026-08-20 (healthy window, clip-fixed kernels, two
#: interleaved pairs each — tools/battery/ds_pair_ab.py): the coarse pair
#: gather wins ONLY at the L2 transition (0.96 vs 1.12 ms, -13%,
#: reproduced; L3 neutral, L4 slightly negative) — hence the per-stage
#: DS_PAIR_DMA_STAGES below.  This global bool stays for whole-engine
#: A/Bs.
DS_PAIR_DMA: bool = False

#: Stage indices (1-based ds transitions: 1=L2, 2=L3, 3=L4) served with
#: the pair-DMA gather regardless of DS_PAIR_DMA.  e2e A/B of (1,)
#: (the isolated winner): 15.128 vs 15.096 ms control — REJECTED at the
#: 1%% bar (the 0.15 ms isolated L2 gain does not survive e2e overlap).
#: Kept as the per-stage knob with its measured disposition.
DS_PAIR_DMA_STAGES: tuple = ()

#: Emit the ds megakernels' trailing per-image loops (bottleneck: conv3 +
#: projection shortcut; basic: projection shortcut) as whole-block dots
#: with one vector epilogue (per-image stores only) instead of chunked
#: small dots with MXU-idle epilogues between them — ROADMAP lever 1 (the
#: conv1-over-planes half landed in round 3).  Bit-identical output (same
#: fp32 op order); A/B flag, default off until the on-chip battery
#: measures it.
DS_CONV3_ONEDOT: bool = False

#: Serve the ResNet-18/34 stride-2 stage transitions with the int8
#: basic-ds megakernel (ONE kernel per transition: pair-gathered 3x3/2 tap
#: dots + chain-scatter + kh-batched 3x3 + pair-wide projection shortcut)
#: instead of the bf16 XLA fallback (dequant -> 3 XLA convs -> requant ->
#: repad).  Default off until the on-chip battery validates the Mosaic
#: path (interpret bit-parity is test-pinned).
BASIC_DS_INT8: bool = False

#: Stages (0-based) whose consecutive stride-1 BASIC blocks fuse into ONE
#: basic_run_chained_int8 kernel (ResNet-18/34).  Mirrors RUN_FUSE_STAGES;
#: per-stage sweep TBD on chip (layer1 is the DMA-heaviest, same as the
#: bottleneck family where only stage 0 won).
BASIC_RUN_FUSE_STAGES: tuple = (0,)

#: Route the per-block chain kernels through the fully-manual pipe-DMA
#: variant (_chained_kernel_int8_pipe: BOTH the input and output row
#: streams as in-kernel double-buffered DMAs).  Targets the measured
#: per-grid-step DMA+compute serialization (PERF.md round 3: L1b1 1.53 ms
#: ≈ 0.6 copy + 0.9 compute serial; the input-only mdma variant was
#: neutral, so the remaining suspect is the auto-pipeline's output window
#: flush).  Interpret bit-match pinned.  CLOSED NEGATIVE on chip
#: 2026-08-20: where it compiles the pipe route is ~4% SLOWER than the
#: auto pipeline (L1b1 2.802 vs 2.782 ms), and the proj form does not
#: compile at all — Mosaic rejects the manual 64-lane HBM memref slice
#: ("must be aligned to tiling (128)"); the auto pipeline's BlockSpec
#: windows are exempt from that constraint.  Kept as an interpret-tested
#: reference implementation only; never enable on TPU.
CHAIN_PIPE_DMA: bool = False

#: Hybrid chain prefix: run these LEADING stages (contiguous from 0) on XLA
#: bf16 — stem and maxpool stay bf16, the listed stages run as plain XLA
#: convs from the folded fp entries quantize_chain keeps on stage-0/1
#: blocks, and the int8 megakernel chain starts at the first non-listed
#: stage via quantize + pad_for_chain (the same boundary glue the basic
#: family's XLA transitions use).  Motivated by ROOFLINE.json (2026-08-20):
#: the L1 Pallas kernels run at 0.18-0.30 of the machine's same-window
#: floor (c=64 dots waste half the MXU N-side; kw slots pad 192->384) while
#: L3/L4 sit at 0.6-0.96 — XLA's compiler-scheduled bf16 L1 should beat a
#: 0.2-efficiency int8 L1 despite the 2x rate and byte handicap.  A/B flag,
#: default off until the on-chip paired A/B (bench.py TUNE_CANDIDATES).
HYBRID_XLA_STAGES: tuple = ()

#: Serve stage 0 (c=64) with the PIXEL-PAIRED chain kernels: two W-adjacent
#: pixels per row (a free contiguous view), pairing carried by host-built
#: block-diagonal / pair-packed weights so every dot runs at N=128 instead
#: of N=64 and the kw slots are dense (no 64->128 lane padding).  Targets
#: ROOFLINE.json's L1 0.18-0.30 efficiency (VERDICT r4 #3) from the kernel
#: side, where HYBRID_XLA_STAGES concedes the stage to XLA bf16.  Honors
#: stage-0 run-fusion via the pp run kernel.  Interpret bit-match pinned in
#: tests/test_pallas.py; on-chip bitmatch gate-checked.
#:
#: Measured on chip 2026-08-20 (healthy window, after the clip-restore
#: fix): ISOLATED per-block pp LOSES (L1b1 std 1.402 ms vs pp 1.940;
#: PP_AB.json — the +30%% zero-block MACs outweigh the N-side recovery at
#: the single-kernel level), but E2E pp WINS +9%% confirmed-paired and
#: bit-exact (15.274/15.224 vs controls 16.636/16.549 ms — auto_best,
#: TUNED.json evidence): in context the pp RUN kernel serves stage 0 with
#: both identity activations VMEM-resident in pair form, and the
#: half-lane (rows, 64) entry/boundary buffers become full-lane views.
#: Code default stays False (isolated-negative); TUNED.json flips it ON
#: as the measured-best serving config.
L1_PIXEL_PAIR: bool = False

# --- Measured tuned defaults (TUNED.json) ---------------------------------
#: Flags the unattended battery may flip via TUNED.json at the repo root.
#: The file is written ONLY by tools/battery/auto_best.py after each flag
#: wins an on-chip A/B AND passes the logits parity gate (bench.greedy_tune);
#: every flag is additionally interpret-mode bit-match pinned in
#: tests/test_pallas.py.  This closes the "flip every winning default" loop
#: without a human in the one chip window.
_TUNABLE_FLAGS = (
    "STAGE_FUSE_PROJ",
    "STEM_CIN_PAD",
    "DS_PAIR_DMA",
    "DS_PAIR_DMA_STAGES",
    "DS_CONV3_ONEDOT",
    "BASIC_DS_INT8",
    "RUN_FUSE_STAGES",
    "BASIC_RUN_FUSE_STAGES",
    "CHAIN_PIPE_DMA",
    "HYBRID_XLA_STAGES",
    "L1_PIXEL_PAIR",
)


def _apply_tuned_defaults() -> dict:
    """Overlay TUNED.json's measured flag winners onto the code defaults.

    Resolution order: RESNETC_NO_TUNED=1 disables entirely (the CPU test
    suite sets it — tests pin code-default behavior and opt into flags
    explicitly); RESNETC_TUNED_JSON overrides the path; default is
    <repo>/TUNED.json.  Unknown keys and type-mismatched values are ignored
    (a malformed file must never break serving).  Returns what was applied.
    """
    import json as _json
    import os as _os
    from pathlib import Path as _Path

    if _os.environ.get("RESNETC_NO_TUNED") == "1":
        return {}
    path = _os.environ.get("RESNETC_TUNED_JSON") or str(
        _Path(__file__).resolve().parents[3] / "TUNED.json"
    )
    try:
        data = _json.loads(_Path(path).read_text())
        flags = data.get("flags") if isinstance(data, dict) else None
        if not isinstance(flags, dict):
            return {}
        applied = {}
        for k, v in flags.items():
            if k not in _TUNABLE_FLAGS:
                continue
            default = globals()[k]
            if isinstance(default, tuple) and isinstance(v, list):
                if not all(type(e) is int for e in v):
                    continue  # stage indices only — reject at load, not trace
                v = tuple(v)
            if type(v) is not type(default):  # exact: bool must not pass as int
                continue
            globals()[k] = v
            applied[k] = v
        return applied
    except Exception:
        # The contract is absolute: a bad TUNED.json (non-dict JSON, weird
        # types, IO races) must never break an import of the serving path.
        return {}


#: What TUNED.json actually flipped at import (empty when absent/disabled).
TUNED_DEFAULTS = _apply_tuned_defaults()


def _xla_conv(x, entry, *, k, stride, padding, relu, policy):
    """XLA fallback for shapes Pallas doesn't cover (stem, stride-2 3x3)."""
    y = lax_ops.conv2d(x, entry["weight"].astype(policy.compute), stride=stride, padding=padding)
    y = y + entry["bias"].astype(y.dtype)
    return lax_ops.relu(y) if relu else y


def _conv(x, entry, *, stride, relu, residual=None, policy, interpret):
    """Route one folded conv (+bias+residual+relu) to a kernel."""
    w = entry["weight"].astype(policy.compute)
    bias = entry["bias"]
    kh, kw_, _, _ = w.shape
    if (kh, kw_) == (1, 1):
        return conv1x1_fused(
            x, w, bias, residual, stride=stride, relu=relu, interpret=interpret
        )
    if (kh, kw_) == (3, 3) and stride == 1:
        return conv3x3_s1_fused(
            x, w, bias, residual, relu=relu, interpret=interpret
        )
    if (kh, kw_) == (3, 3) and stride == 2 and residual is None:
        return conv3x3_s2_fused(x, w, bias, relu=relu, interpret=interpret)
    # Stem 7x7/2 (the only remaining XLA conv on the fused path).
    # Gate the cin pad on kh == 7 so the flag affects only the stem conv it
    # was designed to A/B — any other conv falling through (e.g. a 3x3/2
    # with residual) would otherwise get exact-but-wasted pad FLOPs.
    pad = (STEM_CIN_PAD - w.shape[2]) if kh == 7 else 0
    if pad > 0:
        # Zero-pad cin so XLA's stem conv tiles a lane-friendlier minor dim
        # (mathematically exact: zero channels contribute zero).  A/B flag;
        # the entry experiment lives in tools/battery/stem_pad.py.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        entry = {
            "weight": jnp.pad(
                entry["weight"], ((0, 0), (0, 0), (0, pad), (0, 0))
            ),
            "bias": bias,
        }
    y = _xla_conv(
        x, entry, k=kh, stride=stride, padding=kh // 2, relu=False, policy=policy
    )
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return lax_ops.relu(y) if relu else y


def fused_forward(
    cfg: ResNetConfig,
    folded: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    block_fusion: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-fused inference over a BN-folded tree. Returns logits.

    ``block_fusion=True`` additionally routes every stride-1 bottleneck
    residual block through the single-kernel megakernel
    (ops.pallas.block.bottleneck_block_fused) — one HBM read and one write
    per block instead of six.
    """
    x = x.astype(policy.compute)

    y = _conv(x, folded["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
    y = max_pool2d(y, kernel_size=3, stride=2, padding=1, interpret=interpret)

    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        b = 0
        while b < cfg.stage_blocks[stage]:
            blk = blocks[str(b)]
            s = stage_stride if b == 0 else 1
            if (
                block_fusion
                and cfg.block == "bottleneck"
                and s == 1
                and "downsample" not in blk
            ):
                from resnetc_tpu.ops.pallas.block import (
                    bottleneck_block_chained,
                    pad_for_chain,
                    unpad_from_chain,
                )

                # Chain every consecutive eligible block through the
                # padded-row layout: ONE pad, N single-kernel blocks, ONE
                # unpad — the per-block XLA pad/relayout passes measured as
                # 25-40% of megakernel time (tools/probe_block_phases.py)
                # are paid once per run instead of once per block.
                bsz, h, w_sp, _ = y.shape
                yr = pad_for_chain(y)
                while (
                    b < cfg.stage_blocks[stage]
                    and "downsample" not in blocks[str(b)]
                ):
                    blk = blocks[str(b)]
                    yr = bottleneck_block_chained(
                        yr,
                        blk["conv1"]["weight"].astype(policy.compute), blk["conv1"]["bias"],
                        blk["conv2"]["weight"].astype(policy.compute), blk["conv2"]["bias"],
                        blk["conv3"]["weight"].astype(policy.compute), blk["conv3"]["bias"],
                        h=h, w_sp=w_sp, interpret=interpret,
                    )
                    b += 1
                y = unpad_from_chain(yr, bsz, h, w_sp)
                continue
            if "downsample" in blk:
                short = _conv(
                    y, blk["downsample"], stride=s, relu=False,
                    policy=policy, interpret=interpret,
                )
            else:
                short = y
            if cfg.block == "bottleneck":
                z = _conv(y, blk["conv1"], stride=1, relu=True, policy=policy, interpret=interpret)
                z = _conv(z, blk["conv2"], stride=s, relu=True, policy=policy, interpret=interpret)
                # Final 1x1: residual-add + ReLU fused into the GEMM epilogue.
                y = _conv(
                    z, blk["conv3"], stride=1, relu=True, residual=short,
                    policy=policy, interpret=interpret,
                )
            else:
                z = _conv(y, blk["conv1"], stride=s, relu=True, policy=policy, interpret=interpret)
                y = _conv(
                    z, blk["conv2"], stride=1, relu=True, residual=short,
                    policy=policy, interpret=interpret,
                )
            b += 1

    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2)).astype(policy.compute)
    logits = matmul(
        feats,
        jnp.transpose(folded["fc"]["weight"]).astype(policy.compute),
        folded["fc"]["bias"],
        out_dtype=policy.output,
        interpret=interpret,
    )
    return logits


def _conv_q(x, entry, *, stride, relu, residual=None, policy, interpret):
    """Like _conv but routes int8-quantized 1x1 entries to the int8 GEMM."""
    from resnetc_tpu.ops.pallas.quant import conv1x1_int8

    if "w_q" in entry:
        return conv1x1_int8(
            x, entry["w_q"], entry["scale_w"], entry["bias"], residual,
            stride=stride, relu=relu, out_dtype=policy.compute,
            interpret=interpret,
        )
    return _conv(
        x, entry, stride=stride, relu=relu, residual=residual,
        policy=policy, interpret=interpret,
    )


def fused_forward_int8(
    cfg: ResNetConfig,
    qfolded: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    interpret: bool = False,
) -> jax.Array:
    """Int8 serving variant: 1x1 convs + fc on the int8 MXU path (2x bf16
    peak on v5e), 3x3/7x7 convs bf16. Input tree from quant.quantize_folded."""
    from resnetc_tpu.ops.pallas.quant import int8_matmul, quantize_per_tensor

    x = x.astype(policy.compute)
    y = _conv(x, qfolded["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
    y = max_pool2d(y, kernel_size=3, stride=2, padding=1, interpret=interpret)

    for stage in range(4):
        blocks = qfolded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            s = stage_stride if b == 0 else 1
            if "downsample" in blk:
                short = _conv_q(
                    y, blk["downsample"], stride=s, relu=False,
                    policy=policy, interpret=interpret,
                )
            else:
                short = y
            if cfg.block == "bottleneck":
                z = _conv_q(y, blk["conv1"], stride=1, relu=True, policy=policy, interpret=interpret)
                z = _conv_q(z, blk["conv2"], stride=s, relu=True, policy=policy, interpret=interpret)
                y = _conv_q(
                    z, blk["conv3"], stride=1, relu=True, residual=short,
                    policy=policy, interpret=interpret,
                )
            else:
                z = _conv_q(y, blk["conv1"], stride=s, relu=True, policy=policy, interpret=interpret)
                y = _conv_q(
                    z, blk["conv2"], stride=1, relu=True, residual=short,
                    policy=policy, interpret=interpret,
                )

    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    fc = qfolded["fc"]
    fq, fscale = quantize_per_tensor(feats)
    logits = int8_matmul(
        fq, fc["w_q"], fscale, fc["scale_w"], fc["bias"],
        out_dtype=policy.output, interpret=interpret,
    )
    return logits


def calibrate_activation_scales(
    cfg: ResNetConfig,
    folded: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
) -> Pytree:
    """Record per-site activation scales (absmax/127) for static int8 serving.

    Runs the fp forward (plain XLA ops — backend-independent, works on CPU
    and TPU alike) over a representative batch and captures the input range
    of every op the int8 path quantizes (1x1 convs, downsamples, fc).
    Returned tree mirrors quantize_folded's structure; feed it to
    fused_forward_int8_static.  Scales are device scalars — fetch once and
    bake them in for serving.
    """
    scales: dict = {}

    def record(site: dict, key: str, act: jax.Array):
        absmax = jnp.max(jnp.abs(act.astype(jnp.float32)))
        site[key] = jnp.maximum(absmax / 127.0, 1e-8)

    def conv(xx, entry, *, stride, relu):
        w = entry["weight"].astype(policy.compute)
        k = w.shape[0]
        y = lax_ops.conv2d(xx, w, stride=stride, padding=k // 2)
        y = y + entry["bias"].astype(y.dtype)
        return lax_ops.relu(y) if relu else y

    x = x.astype(policy.compute)
    y = conv(x, folded["conv1"], stride=2, relu=True)
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)

    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        layer_scales: dict = {}
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            s = stage_stride if b == 0 else 1
            site: dict = {}
            if "downsample" in blk:
                record(site, "downsample", y)
                short = conv(y, blk["downsample"], stride=s, relu=False)
            else:
                short = y
            if cfg.block == "bottleneck":
                record(site, "conv1", y)
                z = conv(y, blk["conv1"], stride=1, relu=True)
                z = conv(z, blk["conv2"], stride=s, relu=True)
                record(site, "conv3", z)
                y = lax_ops.relu(conv(z, blk["conv3"], stride=1, relu=False) + short)
            else:
                z = conv(y, blk["conv1"], stride=s, relu=True)
                y = lax_ops.relu(conv(z, blk["conv2"], stride=1, relu=False) + short)
            if site:
                layer_scales[str(b)] = site
        if layer_scales:
            scales[f"layer{stage + 1}"] = layer_scales

    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    scales["fc"] = jnp.maximum(jnp.max(jnp.abs(feats)) / 127.0, 1e-8)
    return scales


# ---------------------------------------------------------------------------
# Int8 chained serving: producer-epilogue quantization through whole stages.
# Activations cross HBM as int8 (half the bf16 traffic) and every dot in the
# chained megakernel runs on the int8 MXU path (~1.8x bf16, measured).
# ---------------------------------------------------------------------------


def calibrate_chain_scales(
    cfg: ResNetConfig,
    folded: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    method: str = "absmax",
    pct: float = 99.9,
    per_channel_interior: bool = False,
) -> Pytree:
    """Static activation scales for the int8 block megakernels.

    Runs the fp folded forward over a representative batch and records a
    range statistic /127 at EVERY residual block: the block INPUT ("in"),
    conv1's post-ReLU output ("z1") and (bottleneck) conv2's post-ReLU
    output ("z2").  Consecutive blocks share boundaries (block k's output
    scale IS block k+1's "in" — across stage boundaries too), so the
    kernels' s_y always comes from the next block's record.

    ``method``: "absmax" (default — exact range, fragile to a single
    outlier activation), "percentile" (clip at the ``pct`` percentile of
    |act|; the kernels clamp to ±127 on every quantize, so values past the
    clip saturate instead of stretching the grid for everyone — the
    standard robust-calibration trade), or "mse" (pick the clip that
    minimizes the quantization mean-squared error over a candidate sweep —
    balances clipping error against grid resolution per site instead of
    using one fixed percentile everywhere).

    ``per_channel_interior``: the INTERIOR sites (z1, z2 — each consumed by
    exactly one conv) get per-channel scale VECTORS instead of scalars.
    These fold entirely into host-side constants (consumer weight rows
    pre-scaled before quantization, producer epilogue vectors divided —
    see bake_interior_scales), so the kernels are untouched; block-boundary
    scales ("in", which feed the identity-residual adds) stay scalar.
    """
    assert method in ("absmax", "percentile", "mse"), method
    assert cfg.groups == 1, (
        "int8 chain serving does not support grouped convolutions "
        "(ResNeXt); use the xla backend"
    )
    scales: dict = {}

    def mse_clip(a: jax.Array) -> jax.Array:
        """argmin over clip candidates of E[(quant(a; clip) - a)^2].

        Deterministic strided subsample caps the search tensor (the MSE
        estimate needs thousands of points, not millions); candidates
        sweep [0.25, 1.0] x absmax — below 0.25 the clipping error of a
        post-ReLU conv activation always dominates.
        """
        flat = a.reshape(-1)
        step = max(1, flat.shape[0] // (1 << 18))
        sample = flat[::step]
        hi = jnp.max(sample)
        cands = hi * jnp.linspace(0.25, 1.0, 24)[:, None]  # (24, 1)
        s = jnp.maximum(cands / 127.0, 1e-8)
        q = jnp.clip(jnp.round(sample[None, :] / s), -127.0, 127.0) * s
        err = jnp.mean(jnp.square(q - sample[None, :]), axis=1)
        return cands[jnp.argmin(err), 0]

    def s_of(act):
        a = jnp.abs(act.astype(jnp.float32))
        if method == "absmax":
            stat = jnp.max(a)
        elif method == "percentile":
            stat = jnp.percentile(a.reshape(-1), pct)
        else:
            stat = mse_clip(a)
        return jnp.maximum(stat / 127.0, 1e-8)

    def mse_clip_perchan(a2: jax.Array) -> jax.Array:
        """Per-channel mse_clip: a2 is (rows, C) |act|; returns (C,)."""
        C = a2.shape[1]
        step = max(1, a2.shape[0] // max(1, (1 << 18) // C))
        sample = a2[::step]  # (S, C)
        hi = jnp.max(sample, axis=0)  # (C,)
        cands = hi[None, :] * jnp.linspace(0.25, 1.0, 24)[:, None]  # (24, C)
        s = jnp.maximum(cands / 127.0, 1e-8)[:, None, :]  # (24, 1, C)
        q = jnp.clip(jnp.round(sample[None] / s), -127.0, 127.0) * s
        err = jnp.mean(jnp.square(q - sample[None]), axis=1)  # (24, C)
        return jnp.take_along_axis(
            cands, jnp.argmin(err, axis=0)[None, :], axis=0
        )[0]

    def s_interior(act):
        """Scale for an interior site: per-channel vector when requested."""
        if not per_channel_interior:
            return s_of(act)
        a = jnp.abs(act.astype(jnp.float32)).reshape(-1, act.shape[-1])
        if method == "absmax":
            stat = jnp.max(a, axis=0)
        elif method == "percentile":
            stat = jnp.percentile(a, pct, axis=0)
        else:
            stat = mse_clip_perchan(a)
        return jnp.maximum(stat / 127.0, 1e-8)

    def conv(xx, entry, *, stride, relu):
        w = entry["weight"].astype(policy.compute)
        k = w.shape[0]
        y = lax_ops.conv2d(xx, w, stride=stride, padding=k // 2)
        y = y + entry["bias"].astype(y.dtype)
        return lax_ops.relu(y) if relu else y

    x = x.astype(policy.compute)
    y = conv(x, folded["conv1"], stride=2, relu=True)
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)

    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        layer_scales: dict = {}
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            s = stage_stride if b == 0 else 1
            short = (
                conv(y, blk["downsample"], stride=s, relu=False)
                if "downsample" in blk
                else y
            )
            if cfg.block == "bottleneck":
                z1 = conv(y, blk["conv1"], stride=1, relu=True)
                z2 = conv(z1, blk["conv2"], stride=s, relu=True)
                layer_scales[str(b)] = {
                    "in": s_of(y), "z1": s_interior(z1), "z2": s_interior(z2),
                }
                y = lax_ops.relu(conv(z2, blk["conv3"], stride=1, relu=False) + short)
            else:
                z = conv(y, blk["conv1"], stride=s, relu=True)
                # Basic blocks record (in, z1) — the two quantization points
                # of the basic chain kernel.  Stride-2 blocks are served
                # bf16 (XLA) but their "in" is still the re-quantize scale
                # at the stage boundary.
                layer_scales[str(b)] = {"in": s_of(y), "z1": s_interior(z)}
                y = lax_ops.relu(conv(z, blk["conv2"], stride=1, relu=False) + short)
        if layer_scales:
            scales[f"layer{stage + 1}"] = layer_scales
    return scales


def quantize_chain(cfg: ResNetConfig, folded: Pytree) -> Pytree:
    """Quantize every residual block for the int8 megakernels.

    Bottleneck: stride-1 blocks (incl. layer1's projection block) for the
    chained kernel, stride-2 downsample blocks for the s2 phase-plane
    kernel.  Basic (ResNet-18/34): stride-1 blocks for the basic chain
    kernel; the stride-2 transition blocks keep their folded fp entries
    (served bf16 by XLA between chains)."""
    assert cfg.groups == 1, (
        "int8 chain serving does not support grouped convolutions "
        "(ResNeXt); use the xla backend"
    )
    from resnetc_tpu.ops.pallas.block import quantize_chain_block, quantize_ds_block

    out = {k: v for k, v in folded.items() if not k.startswith("layer")}
    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        qblocks = {}
        for b_str, blk in blocks.items():
            if cfg.block != "bottleneck":
                # Basic blocks: stride-1 blocks quantize for the basic chain
                # kernel; the stride-2 stage-transition blocks quantize for
                # the basic-ds megakernel AND keep their folded fp entries
                # (the BASIC_DS_INT8=False path serves them bf16 via XLA).
                if b_str == "0" and stage_stride == 2:
                    if "downsample" in blk:
                        from resnetc_tpu.ops.pallas.block import (
                            quantize_basic_ds_block,
                        )

                        qblocks[b_str] = quantize_basic_ds_block(blk)
                    else:
                        qblocks[b_str] = blk
                else:
                    from resnetc_tpu.ops.pallas.block import (
                        quantize_basic_block,
                    )

                    qblocks[b_str] = quantize_basic_block(blk)
            elif b_str == "0" and stage_stride == 2:
                qblocks[b_str] = quantize_ds_block(blk)
            else:
                q = quantize_chain_block(blk)
                if "downsample" in blk:  # layer1 block 0: stride-1 projection
                    from resnetc_tpu.ops.pallas.quant import quantize_per_channel

                    wd = blk["downsample"]["weight"]
                    if wd.ndim == 4:
                        wd = wd[0, 0]
                    q["wdq"], q["swd"] = quantize_per_channel(wd)
                    q["bd"] = blk["downsample"]["bias"]
                qblocks[b_str] = q
            if cfg.block == "bottleneck" and stage <= 1:
                # Keep bf16 copies of the folded fp entries on the early
                # stages (~4 MB total): the HYBRID_XLA_STAGES prefix serves
                # them as plain XLA convs (same pattern as the basic
                # family's fp transition entries above).
                for k in ("conv1", "conv2", "conv3", "downsample"):
                    if k in blk:
                        qblocks[b_str][k] = {
                            "weight": blk[k]["weight"].astype(jnp.bfloat16),
                            "bias": blk[k]["bias"],
                        }
        out[f"layer{stage + 1}"] = qblocks
    return out


def bake_interior_scales(
    cfg: ResNetConfig, folded: Pytree, scales_pc: Pytree
) -> tuple[Pytree, Pytree]:
    """Bake per-channel INTERIOR activation scales into host constants.

    ``scales_pc`` comes from calibrate_chain_scales(per_channel_interior=
    True): z1/z2 are per-channel vectors, "in" scalars.  Each interior site
    has exactly one producer and one consumer, so the vectors fold away
    entirely on the host:

      - consumer weights are pre-scaled along their INPUT-channel axis by
        the site vector BEFORE quantization (the scale rides inside the
        int8 weight values + their per-output-channel dequant scales),
      - the producer's epilogue vectors (sw*, b*) are divided by the site
        vector per OUTPUT channel (they were per-channel already),
      - the runtime scales tree records 1.0 at the baked sites.

    Returns (qtree, runtime_scales); the kernels and wrappers are entirely
    unchanged — this is strictly a different set of folded constants.
    Block-boundary scales ("in") stay scalar: they feed the kernels'
    identity-residual SMEM scalar and the chaining contract.
    """
    one = jnp.float32(1.0)

    def prescale(entry, vec):
        # Input-channel axis is -2 for both (cin, cout) and HWIO weights.
        return {
            "weight": entry["weight"] * vec[..., :, None],
            "bias": entry["bias"],
        }

    folded2 = {k: v for k, v in folded.items() if not k.startswith("layer")}
    runtime: dict = {}
    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        sites = scales_pc[f"layer{stage + 1}"]
        f2b: dict = {}
        rb: dict = {}
        for b_str, blk in blocks.items():
            st = sites[b_str]
            blk2 = dict(blk)
            if cfg.block == "bottleneck":
                blk2["conv2"] = prescale(blk["conv2"], st["z1"])
                blk2["conv3"] = prescale(blk["conv3"], st["z2"])
                rb[b_str] = {"in": st["in"], "z1": one, "z2": one}
            else:
                blk2["conv2"] = prescale(blk["conv2"], st["z1"])
                rb[b_str] = {"in": st["in"], "z1": one}
            f2b[b_str] = blk2
        folded2[f"layer{stage + 1}"] = f2b
        runtime[f"layer{stage + 1}"] = rb

    qtree = quantize_chain(cfg, folded2)

    # Producer-epilogue divisions (+ restore fp entries the bf16 XLA
    # transition branch reads — those must stay UN-prescaled).
    for stage in range(4):
        for b_str, q in qtree[f"layer{stage + 1}"].items():
            st = scales_pc[f"layer{stage + 1}"][b_str]
            orig = folded[f"layer{stage + 1}"][b_str]
            if cfg.block == "bottleneck":
                s_z1, s_z2 = st["z1"], st["z2"]
                q["sw1"] = q["sw1"] / s_z1
                q["b1"] = q["b1"] / s_z1
                if "sw2p" in q:  # chain block: conv2 scales per (kh, j)
                    q["sw2p"] = q["sw2p"] / jnp.tile(s_z2, 3)
                else:  # ds block: joint per-j scales across the nine taps
                    q["sw2"] = q["sw2"] / s_z2
                q["b2"] = q["b2"] / s_z2
                # The hybrid-prefix fp entries came from the PRESCALED
                # folded2 — restore the un-prescaled originals (XLA serves
                # them in bf16; the bake must not leak into that path).
                for k in ("conv1", "conv2", "conv3", "downsample"):
                    if k in q and k in orig:
                        q[k] = {
                            "weight": orig[k]["weight"].astype(jnp.bfloat16),
                            "bias": orig[k]["bias"],
                        }
            elif "wdq" in q and "w1pq" in q:
                # basic-ds transition: conv1 (3x3/2 pair-packed) produces
                # z1 with JOINT per-output-channel scales.
                q["sw1"] = q["sw1"] / st["z1"]
                q["b1"] = q["b1"] / st["z1"]
                for k in ("conv1", "conv2", "downsample"):
                    if k in orig:
                        q[k] = orig[k]
            elif "sw1p" in q:
                # basic stride-1 block: conv1 scales per (kh, j).
                q["sw1p"] = q["sw1p"] / jnp.tile(st["z1"], 3)
                q["b1"] = q["b1"] / st["z1"]
            else:
                # Transition kept as plain folded fp (no downsample case):
                # restore the un-prescaled original wholesale.
                qtree[f"layer{stage + 1}"][b_str] = orig
    return qtree, runtime


def _chain_scale_lookups(cfg: ResNetConfig, chain_scales: Pytree):
    """(site, s_after) for the per-block calibration records: block k's
    output scale IS block k+1's "in" — across stage boundaries too; None at
    the network tail (the last block emits bf16).  Shared by the bottleneck
    and basic int8_chain forwards so the chaining contract lives once."""

    def site(stage, b):
        return chain_scales[f"layer{stage + 1}"][str(b)]

    def s_after(stage, b):
        if b + 1 < cfg.stage_blocks[stage]:
            return site(stage, b + 1)["in"]
        if stage + 1 < 4:
            return site(stage + 1, 0)["in"]
        return None

    return site, s_after


def _basic_int8_chain_forward(
    cfg: ResNetConfig,
    qtree: Pytree,
    chain_scales: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    interpret: bool = False,
    stage_taps: list | None = None,
) -> jax.Array:
    """int8_chain serving forward for BASIC configs (ResNet-18/34).

    Every stride-1 BasicBlock is ONE int8 megakernel
    (basic_block_chained_int8); the three stride-2 stage-transition blocks
    run bf16 in XLA between chains (dequantize -> fp block -> requantize;
    their activations are the network's smallest, so the boundary passes
    are cheap).  Same per-block calibration contract as the bottleneck
    path: block k's output scale is block k+1's "in"."""
    from resnetc_tpu.ops.pallas.block import (
        basic_block_chained_int8,
        basic_block_chained_int8_pp,
        basic_run_chained_int8_pp,
        pad_for_chain,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    site, s_after = _chain_scale_lookups(cfg, chain_scales)

    def scale_row(stage, b):
        st = site(stage, b)
        s_y = s_after(stage, b)
        return jnp.stack(
            [st["in"], st["z1"], s_y if s_y is not None else jnp.float32(1.0)]
        ).astype(jnp.float32)

    x = x.astype(policy.compute)
    y = _conv(x, qtree["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
    yq = quantize_with_scale(y, site(0, 0)["in"])
    yq = lax_ops.max_pool2d(yq, kernel_size=3, stride=2, padding=1)

    bsz, h, w_sp, _ = yq.shape
    yr = pad_for_chain(yq)

    for stage in range(4):
        blocks = qtree[f"layer{stage + 1}"]
        nb = cfg.stage_blocks[stage]
        start = 0
        if stage > 0:
            blk = blocks["0"]
            use_ds = BASIC_DS_INT8 and "w1pq" in blk and "wdq" in blk
            if use_ds:
                # VMEM-fit guard (mirrors the run-fusion guard): degrade to
                # the XLA branch rather than assert inside the kernel.
                from resnetc_tpu.ops.pallas.block import (
                    _pick_bt_basic_ds, basic_ds_block_s2_int8,
                    basic_ds_geometry, chain_meta,
                )

                hp, wp = chain_meta(0, h, w_sp)
                hq_, wq_, hp2, wp2, _ = basic_ds_geometry(h, w_sp)
                c_out = blk["sw1"].shape[-1]
                use_ds = _pick_bt_basic_ds(
                    yr.shape[0] // (hp * wp), hq_, wq_, hp2, wp2,
                    yr.shape[1], c_out,
                ) > 0
            if use_ds:
                # Stride-2 transition as ONE int8 megakernel, chain to
                # chain — no dequant/requant/pad glue.
                last0 = s_after(stage, 0) is None
                yr = basic_ds_block_s2_int8(
                    yr,
                    blk["w1pq"], blk["sw1"], blk["b1"],
                    blk["w2pq"], blk["sw2p"], blk["b2"],
                    blk["wdq"], blk["swd"], blk["bd"],
                    scale_row(stage, 0),
                    h=h, w_sp=w_sp, emit_i8=not last0,
                    onedot=DS_CONV3_ONEDOT, interpret=interpret,
                )
                h, w_sp = (h + 1) // 2, (w_sp + 1) // 2
                start = 1
                yr_transitioned = True
            else:
                yr_transitioned = False
        if stage > 0 and not yr_transitioned:
            # Stride-2 transition block, bf16 XLA: dequantize the chain
            # buffer, run the fp block, requantize at the next block's "in".
            blk = blocks["0"]
            y = unpad_from_chain(yr, bsz, h, w_sp)
            y = (y.astype(jnp.float32) * site(stage, 0)["in"]).astype(
                policy.compute
            )
            short = (
                _conv(
                    y, blk["downsample"], stride=2, relu=False,
                    policy=policy, interpret=interpret,
                )
                if "downsample" in blk
                else y  # same rule as resnet._block_forward / calibration
            )
            z = _conv(y, blk["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
            y = _conv(
                z, blk["conv2"], stride=1, relu=True, residual=short,
                policy=policy, interpret=interpret,
            )
            h, w_sp = (h + 1) // 2, (w_sp + 1) // 2
            s_out0 = s_after(stage, 0)
            last0 = s_out0 is None
            if not last0:
                yr = pad_for_chain(quantize_with_scale(y, s_out0))
            else:  # nb == 1 tail (not a torchvision config; completeness)
                yr = pad_for_chain(y)
            start = 1

        use_run = False
        # Pixel-paired stage 0 (c=64): same flag/construction as the
        # bottleneck family (see block.py's pp section).
        from resnetc_tpu.ops.pallas.block import chain_meta as _cm

        pp_stage = (
            stage == 0 and L1_PIXEL_PAIR
            and blocks[str(start)]["sw1p"].shape[-1] // 3 == 64
            and _cm(0, h, w_sp)[1] % 2 == 0
        )
        if nb - start > 1 and stage in BASIC_RUN_FUSE_STAGES:
            from resnetc_tpu.ops.pallas.block import (
                _pick_bt_basic_run_int8, _pick_bt_basic_run_int8_pp,
                basic_run_chained_int8, chain_meta,
            )

            hp, wp = chain_meta(0, h, w_sp)
            c = blocks[str(start)]["sw1p"].shape[-1] // 3
            # VMEM-fit guard: degrade to per-block kernels, same contract
            # as the bottleneck run fusion.
            if pp_stage:
                use_run = _pick_bt_basic_run_int8_pp(
                    yr.shape[0] // (hp * wp), hp, wp // 2, 2 * c, nb - start
                ) > 0
            else:
                use_run = _pick_bt_basic_run_int8(
                    yr.shape[0] // (hp * wp), hp, wp, c, nb - start
                ) > 0
        if use_run:
            run = [blocks[str(i)] for i in range(start, nb)]
            stk = lambda key: jnp.stack([r[key] for r in run])
            last = s_after(stage, nb - 1) is None
            run_fn = basic_run_chained_int8_pp if pp_stage else basic_run_chained_int8
            yr = run_fn(
                yr,
                stk("w1pq"), stk("sw1p"), stk("b1"),
                stk("w2pq"), stk("sw2p"), stk("b2"),
                jnp.stack([scale_row(stage, i) for i in range(start, nb)]),
                h=h, w_sp=w_sp, emit_i8=not last, interpret=interpret,
            )
        else:
            blk_fn = basic_block_chained_int8_pp if pp_stage else basic_block_chained_int8
            for i in range(start, nb):
                blk = blocks[str(i)]
                last_i = s_after(stage, i) is None
                yr = blk_fn(
                    yr,
                    blk["w1pq"], blk["sw1p"], blk["b1"],
                    blk["w2pq"], blk["sw2p"], blk["b2"],
                    scale_row(stage, i),
                    h=h, w_sp=w_sp, emit_i8=not last_i, interpret=interpret,
                )

        if stage_taps is not None:
            s_out = s_after(stage, nb - 1)
            tap = unpad_from_chain(yr, bsz, h, w_sp).astype(jnp.float32)
            stage_taps.append(tap * s_out if s_out is not None else tap)

    y = unpad_from_chain(yr, bsz, h, w_sp)
    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2)).astype(policy.compute)
    logits = matmul(
        feats,
        jnp.transpose(qtree["fc"]["weight"]).astype(policy.compute),
        qtree["fc"]["bias"],
        out_dtype=policy.output,
        interpret=interpret,
    )
    return logits


def _xla_bottleneck_stage(y, blocks, nb, *, stride, policy):
    """One bottleneck stage as plain XLA bf16 convs over the folded fp
    entries quantize_chain keeps on stage-0/1 blocks (the
    HYBRID_XLA_STAGES prefix; same math as resnet.forward_folded's loop)."""
    for b in range(nb):
        blk = blocks[str(b)]
        s = stride if b == 0 else 1
        z = _xla_conv(y, blk["conv1"], k=1, stride=1, padding=0, relu=True, policy=policy)
        z = _xla_conv(z, blk["conv2"], k=3, stride=s, padding=1, relu=True, policy=policy)
        z = _xla_conv(z, blk["conv3"], k=1, stride=1, padding=0, relu=False, policy=policy)
        if "downsample" in blk:
            short = _xla_conv(
                y, blk["downsample"], k=1, stride=s, padding=0, relu=False, policy=policy
            )
        else:
            short = y
        y = lax_ops.relu(lax_ops.add(z, short))
    return y


def fused_forward_int8_chain(
    cfg: ResNetConfig,
    qtree: Pytree,
    chain_scales: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    interpret: bool = False,
    stage_taps: list | None = None,
) -> jax.Array:
    """Serving forward with every bottleneck block as ONE int8 megakernel.

    ``stage_taps``: pass a list to receive the dequantized fp32 NHWC
    activation after each stage (layer1..layer4) — the int8-vs-fp error
    decomposition hook used by tests/verify (reference parallel: the
    check_out per-stage dump loop, pytorch_inference.py:8-11).

    Quantization happens BEFORE the maxpool: max commutes with the monotone
    round/clip quantizer, so pooling the int8 stem output (XLA reduce_window,
    int-min padding) is bit-identical to quantizing the pooled bf16 — and
    halves the pool's HBM traffic while the quantize fuses into the stem
    conv's epilogue.  From the pool to the head, activations cross HBM
    exclusively as int8 — stride-1 blocks via bottleneck_block_chained_int8
    (layer1's projection block included), stage transitions via
    downsample_block_s2_int8 (which reads the previous stage's int8 output
    as phase planes and emits the new stage's chain layout directly).  The
    very last block emits bf16 rows for the head.  Basic configs
    (ResNet-18/34) route to _basic_int8_chain_forward — same contract,
    basic megakernels.
    """
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8,
        bottleneck_block_chained_int8_pp,
        bottleneck_run_chained_int8,
        bottleneck_run_chained_int8_pp,
        downsample_block_s2_int8,
        pad_for_chain,
        unpad_from_chain,
    )
    from resnetc_tpu.ops.pallas.quant import quantize_with_scale

    if cfg.block != "bottleneck":
        return _basic_int8_chain_forward(
            cfg, qtree, chain_scales, x,
            policy=policy, interpret=interpret, stage_taps=stage_taps,
        )

    site, s_after = _chain_scale_lookups(cfg, chain_scales)

    xla_stages = HYBRID_XLA_STAGES
    if xla_stages:
        if tuple(xla_stages) != tuple(range(len(xla_stages))):
            raise ValueError(
                f"HYBRID_XLA_STAGES must be a contiguous prefix, got {xla_stages}"
            )
        if any(
            "conv1" not in qtree[f"layer{s + 1}"]["0"] for s in xla_stages
        ):
            raise ValueError(
                "HYBRID_XLA_STAGES needs the folded fp entries quantize_chain "
                f"keeps on stages 0-1; got stages {xla_stages}"
            )

    x = x.astype(policy.compute)
    y = _conv(x, qtree["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
    if xla_stages:
        # Hybrid prefix: pool and the listed stages stay bf16 on XLA; the
        # int8 chain starts at the first non-listed stage's input scale.
        y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)
        for stage in xla_stages:
            y = _xla_bottleneck_stage(
                y, qtree[f"layer{stage + 1}"], cfg.stage_blocks[stage],
                stride=1 if stage == 0 else 2, policy=policy,
            )
            if stage_taps is not None:
                stage_taps.append(y.astype(jnp.float32))
        yq = quantize_with_scale(y, site(len(xla_stages), 0)["in"])
    else:
        yq = quantize_with_scale(y, site(0, 0)["in"])
        yq = lax_ops.max_pool2d(yq, kernel_size=3, stride=2, padding=1)

    # One pad entry pass; everything after is int8 in HBM.
    bsz, h, w_sp, _ = yq.shape
    yr = pad_for_chain(yq)

    def scale_row(stage, b):
        st = site(stage, b)
        s_y = s_after(stage, b)
        return jnp.stack(
            [st["in"], st["z1"], st["z2"],
             s_y if s_y is not None else jnp.float32(1.0)]
        ).astype(jnp.float32)

    head_folded = False
    for stage in range(4):
        if stage in xla_stages:
            continue  # already served by the XLA bf16 hybrid prefix
        blocks = qtree[f"layer{stage + 1}"]
        nb = cfg.stage_blocks[stage]

        # Whole-stage fusion (stage 0 only): the projection block 0 joins
        # the identity run — ALL of layer1 is ONE kernel, and the stage's
        # (rows, 4c) activation never crosses HBM (its x is the pool
        # output at cin = c, 4x narrower).  Stage 0's blocks are all
        # stride-1, which is what the run kernel's proj form supports.
        stage_fused = False
        if (
            stage == 0 and nb > 1 and stage in RUN_FUSE_STAGES
            and STAGE_FUSE_PROJ
        ):
            from resnetc_tpu.ops.pallas.block import (
                _pick_bt_run_int8, _pick_bt_run_int8_pp, chain_meta,
            )

            blk0 = blocks["0"]
            if "wdq" in blk0:
                hp, wp = chain_meta(0, h, w_sp)
                c4, c = blocks["1"]["w1q"].shape
                cin = blk0["w1q"].shape[0]
                # Whole stage as ONE kernel, pp form under L1_PIXEL_PAIR
                # (the pp run wrapper's proj form): x in paired at cin=64.
                use_pp = L1_PIXEL_PAIR and c == 64 and wp % 2 == 0
                if use_pp:
                    fits = _pick_bt_run_int8_pp(
                        yr.shape[0] // (hp * wp), hp, wp // 2,
                        2 * c, 2 * cin, 2 * c4, nb
                    ) > 0
                else:
                    fits = _pick_bt_run_int8(
                        yr.shape[0] // (hp * wp), hp, wp, c, c4, nb, cin=cin
                    ) > 0
                if fits:
                    run = [blocks[str(i)] for i in range(nb)]
                    stk = lambda key, frm=0: jnp.stack(
                        [r[key] for r in run[frm:]]
                    )
                    last = s_after(stage, nb - 1) is None
                    common = dict(
                        h=h, w_sp=w_sp, emit_i8=not last, interpret=interpret,
                        w1q0=blk0["w1q"], wdq=blk0["wdq"],
                        swd=blk0["swd"], bd=blk0["bd"],
                    )
                    run_fn = (bottleneck_run_chained_int8_pp if use_pp
                              else bottleneck_run_chained_int8)
                    if not use_pp:
                        common["pipe_dma"] = CHAIN_PIPE_DMA
                    yr = run_fn(
                        yr,
                        stk("w1q", frm=1), stk("sw1"), stk("b1"),
                        stk("w2pq"), stk("sw2p"), stk("b2"),
                        stk("w3q"), stk("sw3"), stk("b3"),
                        jnp.stack([scale_row(stage, i) for i in range(nb)]),
                        **common,
                    )
                    stage_fused = True

        if not stage_fused:
            # Block 0: stride-1 projection (stage 0) or stride-2 ds
            # megakernel.
            blk = blocks["0"]
            last0 = s_after(stage, 0) is None
            if stage > 0:
                yr = downsample_block_s2_int8(
                    yr,
                    blk["w1q"], blk["sw1"], blk["b1"],
                    blk["w2q"], blk["sw2"], blk["b2"],
                    blk["w3q"], blk["sw3"], blk["b3"],
                    blk["wdq"], blk["swd"], blk["bd"],
                    scale_row(stage, 0),
                    h=h, w_sp=w_sp, emit_i8=not last0,
                    pair_dma=DS_PAIR_DMA or stage in DS_PAIR_DMA_STAGES,
                    onedot=DS_CONV3_ONEDOT,
                    pipe_out=CHAIN_PIPE_DMA,
                    interpret=interpret,
                )
                h, w_sp = (h + 1) // 2, (w_sp + 1) // 2
            elif L1_PIXEL_PAIR and blk["w1q"].shape[-1] == 64:
                # Pixel-paired stage 0 (projection block included): see
                # block.py's pp section comment / the L1_PIXEL_PAIR flag.
                # Guarded on c=64: wide/resnext bottleneck variants run
                # stage 0 at c>=128 where the standard kernel's dots
                # already fill the MXU N-side.
                yr = bottleneck_block_chained_int8_pp(
                    yr,
                    blk["w1q"], blk["sw1"], blk["b1"],
                    blk["w2pq"], blk["sw2p"], blk["b2"],
                    blk["w3q"], blk["sw3"], blk["b3"],
                    scale_row(stage, 0),
                    h=h, w_sp=w_sp, emit_i8=not last0, interpret=interpret,
                    wdq=blk.get("wdq"), swd=blk.get("swd"), bd=blk.get("bd"),
                )
            else:
                yr = bottleneck_block_chained_int8(
                    yr,
                    blk["w1q"], blk["sw1"], blk["b1"],
                    blk["w2pq"], blk["sw2p"], blk["b2"],
                    blk["w3q"], blk["sw3"], blk["b3"],
                    scale_row(stage, 0),
                    h=h, w_sp=w_sp, emit_i8=not last0, interpret=interpret,
                    pipe_dma=CHAIN_PIPE_DMA,
                    wdq=blk.get("wdq"), swd=blk.get("swd"), bd=blk.get("bd"),
                )

            # Blocks 1..nb-1.  bottleneck_run_chained_int8 can fuse a whole
            # identity run into one kernel (activations ping-pong in VMEM).
            # Round-2 measured it LOSING e2e (18.12 all-fused / 17.49
            # per-block) — but under the old 16MB VMEM cap that forced bt=1
            # (M-starved dots); the cap is 100MB now and RUN_FUSE_STAGES is
            # module-level so the choice follows measurement (see PERF.md).
            use_run = False
            pp_stage = stage == 0 and L1_PIXEL_PAIR
            if nb > 1 and stage in RUN_FUSE_STAGES:
                from resnetc_tpu.ops.pallas.block import (
                    _pick_bt_run_int8, chain_meta,
                )

                hp, wp = chain_meta(0, h, w_sp)
                c4, c = blocks["1"]["w1q"].shape
                # VMEM-fit guard: degrade to per-block kernels rather than
                # tripping the run kernel's fit assert on tight shapes.
                if pp_stage:
                    from resnetc_tpu.ops.pallas.block import (
                        _pick_bt_run_int8_pp,
                    )

                    use_run = c == 64 and wp % 2 == 0 and _pick_bt_run_int8_pp(
                        yr.shape[0] // (hp * wp), hp, wp // 2,
                        2 * c, 2 * c4, 2 * c4, nb - 1
                    ) > 0
                else:
                    use_run = _pick_bt_run_int8(
                        yr.shape[0] // (hp * wp), hp, wp, c, c4, nb - 1
                    ) > 0
            if use_run:
                run = [blocks[str(i)] for i in range(1, nb)]
                stk = lambda key: jnp.stack([r[key] for r in run])
                last = s_after(stage, nb - 1) is None
                if pp_stage:
                    yr = bottleneck_run_chained_int8_pp(
                        yr,
                        stk("w1q"), stk("sw1"), stk("b1"),
                        stk("w2pq"), stk("sw2p"), stk("b2"),
                        stk("w3q"), stk("sw3"), stk("b3"),
                        jnp.stack([scale_row(stage, i) for i in range(1, nb)]),
                        h=h, w_sp=w_sp, emit_i8=not last, interpret=interpret,
                    )
                else:
                    yr = bottleneck_run_chained_int8(
                        yr,
                        stk("w1q"), stk("sw1"), stk("b1"),
                        stk("w2pq"), stk("sw2p"), stk("b2"),
                        stk("w3q"), stk("sw3"), stk("b3"),
                        jnp.stack([scale_row(stage, i) for i in range(1, nb)]),
                        h=h, w_sp=w_sp, emit_i8=not last, interpret=interpret,
                        pipe_dma=CHAIN_PIPE_DMA,
                    )
            elif nb > 1:
                for i in range(1, nb):
                    blk = blocks[str(i)]
                    last_i = s_after(stage, i) is None
                    # Head fold (tail block only, not when per-stage taps
                    # are requested): the kernel emits (B, 4c) pooled
                    # features directly — the 84MB tail activation never
                    # crosses HBM.
                    fold_head = last_i and stage_taps is None
                    if (stage == 0 and L1_PIXEL_PAIR and not fold_head
                            and blk["w1q"].shape[-1] == 64):
                        yr = bottleneck_block_chained_int8_pp(
                            yr,
                            blk["w1q"], blk["sw1"], blk["b1"],
                            blk["w2pq"], blk["sw2p"], blk["b2"],
                            blk["w3q"], blk["sw3"], blk["b3"],
                            scale_row(stage, i),
                            h=h, w_sp=w_sp, emit_i8=not last_i,
                            interpret=interpret,
                        )
                        continue
                    yr = bottleneck_block_chained_int8(
                        yr,
                        blk["w1q"], blk["sw1"], blk["b1"],
                        blk["w2pq"], blk["sw2p"], blk["b2"],
                        blk["w3q"], blk["sw3"], blk["b3"],
                        scale_row(stage, i),
                        h=h, w_sp=w_sp, emit_i8=not last_i,
                        interpret=interpret,
                        emit_mean=fold_head,
                        # pipe_dma excludes the emit_mean head-fold tail.
                        pipe_dma=CHAIN_PIPE_DMA and not fold_head,
                    )
                    head_folded = head_folded or fold_head

        if stage_taps is not None:
            s_out = s_after(stage, nb - 1)
            tap = unpad_from_chain(yr, bsz, h, w_sp).astype(jnp.float32)
            stage_taps.append(tap * s_out if s_out is not None else tap)

    if head_folded:
        feats = yr.astype(policy.compute)  # (B, 4c): already pooled in-kernel
    else:
        y = unpad_from_chain(yr, bsz, h, w_sp)
        feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2)).astype(policy.compute)
    logits = matmul(
        feats,
        jnp.transpose(qtree["fc"]["weight"]).astype(policy.compute),
        qtree["fc"]["bias"],
        out_dtype=policy.output,
        interpret=interpret,
    )
    return logits


def fused_forward_int8_chain_sharded(
    cfg: ResNetConfig,
    qtree: Pytree,
    chain_scales: Pytree,
    x: jax.Array,
    mesh,
    *,
    axis: str = "data",
    policy: DtypePolicy = BF16,
    interpret: bool = False,
) -> jax.Array:
    """Data-parallel int8_chain serving over a device mesh.

    Pallas custom calls are opaque to XLA's SPMD partitioner, so the DP
    route is explicit ``shard_map``: the batch shards over ``axis``, the
    quantized weights and calibration scales replicate, and every device
    runs the full megakernel pipeline on its batch slice — zero collectives
    (inference is embarrassingly data-parallel; logits come back sharded
    the same way).  The multi-chip twin of the reference's single-GPU
    serving loop (main.cu:228-254), scaled the shard_map way instead of a
    comm library.  Requires batch % mesh.shape[axis] == 0.
    """
    from jax.sharding import PartitionSpec as P

    def body(q, s, xx):
        return fused_forward_int8_chain(
            cfg, q, s, xx, policy=policy, interpret=interpret
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(qtree, chain_scales, x)


def _conv_q_static(x, entry, scale_x, *, stride, relu, residual=None, policy, interpret):
    """int8 1x1 conv with a pre-calibrated activation scale (no absmax)."""
    from resnetc_tpu.ops.pallas.quant import int8_matmul, quantize_with_scale

    if "w_q" not in entry or scale_x is None:
        return _conv_q(
            x, entry, stride=stride, relu=relu, residual=residual,
            policy=policy, interpret=interpret,
        )
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    b, h, w_sp, cin = x.shape
    cout = entry["w_q"].shape[-1]
    x_q = quantize_with_scale(x, scale_x)
    res2d = residual.reshape(b * h * w_sp, cout) if residual is not None else None
    out = int8_matmul(
        x_q.reshape(b * h * w_sp, cin), entry["w_q"], scale_x, entry["scale_w"],
        entry["bias"], res2d, relu=relu, out_dtype=policy.compute,
        interpret=interpret,
    )
    return out.reshape(b, h, w_sp, cout)


def fused_forward_int8_static(
    cfg: ResNetConfig,
    qfolded: Pytree,
    act_scales: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
    interpret: bool = False,
) -> jax.Array:
    """Int8 serving with calibrated static activation scales — the dynamic
    per-batch absmax reductions of fused_forward_int8 disappear."""
    from resnetc_tpu.ops.pallas.quant import int8_matmul, quantize_with_scale

    x = x.astype(policy.compute)
    y = _conv(x, qfolded["conv1"], stride=2, relu=True, policy=policy, interpret=interpret)
    y = max_pool2d(y, kernel_size=3, stride=2, padding=1, interpret=interpret)

    for stage in range(4):
        blocks = qfolded[f"layer{stage + 1}"]
        sscales = act_scales.get(f"layer{stage + 1}", {})
        stage_stride = 1 if stage == 0 else 2
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            site = sscales.get(str(b), {})
            s = stage_stride if b == 0 else 1
            if "downsample" in blk:
                short = _conv_q_static(
                    y, blk["downsample"], site.get("downsample"), stride=s,
                    relu=False, policy=policy, interpret=interpret,
                )
            else:
                short = y
            if cfg.block == "bottleneck":
                z = _conv_q_static(y, blk["conv1"], site.get("conv1"), stride=1, relu=True, policy=policy, interpret=interpret)
                z = _conv_q(z, blk["conv2"], stride=s, relu=True, policy=policy, interpret=interpret)
                y = _conv_q_static(
                    z, blk["conv3"], site.get("conv3"), stride=1, relu=True,
                    residual=short, policy=policy, interpret=interpret,
                )
            else:
                z = _conv_q(y, blk["conv1"], stride=s, relu=True, policy=policy, interpret=interpret)
                y = _conv_q(
                    z, blk["conv2"], stride=1, relu=True, residual=short,
                    policy=policy, interpret=interpret,
                )

    feats = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    fc = qfolded["fc"]
    fq = quantize_with_scale(feats, act_scales["fc"])
    logits = int8_matmul(
        fq, fc["w_q"], act_scales["fc"], fc["scale_w"], fc["bias"],
        out_dtype=policy.output, interpret=interpret,
    )
    return logits
