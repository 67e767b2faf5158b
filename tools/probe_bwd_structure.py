#!/usr/bin/env python
"""Structural probe of the training backward: what does XLA actually emit?

The round-3 argument against a custom-VJP fused block backward was "BN's
batch reductions force two passes per BN" — a paragraph, not a probe
(VERDICT r3 #7).  This counts the ops in the OPTIMIZED HLO of one train
step: convolution count (fwd + dgrad + wgrad), reduce count (BN stats fwd
+ BN-bwd sums), fusion count, and — the decisive number — how many
DISTINCT fusions consume each large activation, i.e. whether the
elementwise BN-bwd chains are already fused into the conv backwards or
materialize extra full-size passes over HBM.

Op STRUCTURE is platform-independent (the CPU and TPU pipelines share
XLA's fusion passes for this level of analysis), so this runs in the
outage; the TIMING attribution stays with tools/probe_train_bwd.py on
chip.  Usage: python tools/probe_bwd_structure.py [model] [batch] [size]
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax

# ALWAYS force CPU: op structure is what this probe reads (timing lives in
# probe_train_bwd.py on chip), and merely ASKING for the default backend
# (jax.default_backend()) initializes it — which hangs forever when the
# axon tunnel is down (the exact trap tests/conftest.py documents).
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass  # backend already initialized by an embedding process

import jax.numpy as jnp
import numpy as np

from resnetc_tpu import train as train_mod
from resnetc_tpu.models import resnet


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = resnet.get_config(model, num_classes=1000)
    tcfg = train_mod.TrainConfig(lr=0.1, policy_name="bf16")
    ts = train_mod.init_train_state(cfg, jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, size, size, 3), dtype=np.float32
        )
    )
    y = jnp.asarray(np.arange(batch, dtype=np.int32) % 1000)

    lowered = jax.jit(
        lambda ts_, x_, y_: train_mod.train_step(
            cfg, tcfg, ts_, x_, y_, jnp.float32(0.1)
        )
    ).lower(ts, x, y)
    hlo = lowered.compile().as_text()

    counts = collections.Counter()
    for line in hlo.splitlines():
        # Truncate before regexing: HLO text embeds multi-MB constant
        # literals on single lines and the op name sits in the first few
        # hundred chars — unbounded search backtracks for minutes.
        m = re.search(r"=\s+\S+\s+([a-z][\w-]*)\(", line[:400])
        if m:
            counts[m.group(1)] += 1
    n_conv = counts.get("convolution", 0)
    n_fusion = sum(v for k, v in counts.items() if k.startswith("fusion"))
    n_reduce = counts.get("reduce", 0)

    # Reference expectations for a ResNet: ~1 conv per layer forward; dgrad
    # + wgrad each ~1 conv per layer backward -> total ≈ 3x layer count.
    n_layers = {
        "resnet18": 20, "resnet34": 36, "resnet50": 53,
        "resnet101": 104, "resnet152": 155,
    }.get(model, None)
    print(f"model={model} batch={batch} size={size}")
    print(f"convolutions: {n_conv}"
          + (f"  (≈3 x {n_layers} layers = {3*n_layers} expected if every"
             " conv lowers to exactly fwd+dgrad+wgrad)" if n_layers else ""))
    print(f"reduces: {n_reduce}   fusions: {n_fusion}")
    top = ", ".join(f"{k}:{v}" for k, v in counts.most_common(12))
    print(f"op histogram (top): {top}")

    # The decisive structural check: count full-activation-size buffers
    # produced by more than one pass.  Proxy: number of fusion outputs at
    # the largest activation shapes.
    shape_re = re.compile(r"(bf16|f32)\[(\d+),(\d+),(\d+),(\d+)\]")
    big = collections.Counter()
    for line in hlo.splitlines():
        line = line[:400]
        if "= fusion" in line or "fusion(" in line:
            m = shape_re.search(line)
            if m:
                n, h, w, c = map(int, m.groups()[1:])
                big[(h, w, c)] += 1
    rows = sorted(big.items(), key=lambda kv: -kv[0][0] * kv[0][1] * kv[0][2])
    print("fusion outputs per 4-D shape (both weight-grad and activation "
          "shapes appear; count = separate fused passes producing that size):")
    for (h, w, c), n in rows[:8]:
        print(f"  [*,{h},{w},{c}]: {n} fusions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
