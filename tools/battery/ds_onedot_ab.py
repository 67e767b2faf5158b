"""A/B: ds megakernels with conv3 onedot x pair_dma — isolated + e2e.

onedot replaces the per-image chunked conv3+shortcut loop (2*bt*chunks
small dots with MXU-idle epilogues between them) with two whole-block dots
and one epilogue (ROADMAP lever 1's second half).  Bit-match is test-pinned
(tests/test_pallas.py); this measures it on chip at every ds stage shape
and e2e, in all four flag combinations so the winner can be flipped jointly
with DS_PAIR_DMA.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import ab, bench_batch, build_int8_chain, time_forward  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from resnetc_tpu.ops.pallas.block import (  # noqa: E402
    chain_meta, downsample_block_s2_int8, quantize_ds_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

rng = np.random.default_rng(0)
B = 256
for name, (h, cin, c) in {"L2": (56, 256, 128), "L3": (28, 512, 256),
                          "L4": (14, 1024, 512)}.items():
    c4 = 4 * c
    g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
    q = quantize_ds_block({
        "conv1": {"weight": g(cin, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
        "downsample": {"weight": g(cin, c4), "bias": g(c4)},
    })
    hp, wp = chain_meta(0, h, h)
    xr = jnp.asarray(rng.integers(-127, 128, (B * hp * wp, cin)), jnp.int8)
    sc = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
    for pair in (False, True):
        for onedot in (False, True):
            def fn(salt, pair=pair, onedot=onedot):
                s = sc + jnp.sum(salt) * 1e-30
                out = downsample_block_s2_int8(
                    xr, q["w1q"], q["sw1"], q["b1"],
                    q["w2q"], q["sw2"], q["b2"],
                    q["w3q"], q["sw3"], q["b3"],
                    q["wdq"], q["swd"], q["bd"],
                    s, h=h, w_sp=h, emit_i8=True,
                    pair_dma=pair, onedot=onedot)
                return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)
            try:
                sec = chained_seconds_per_iter(
                    fn, jnp.zeros((8, 8), jnp.float32), iters=16)
                print(f"{name}ds pair={pair} onedot={onedot}: "
                      f"{sec*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"{name}ds pair={pair} onedot={onedot}: "
                      f"FAIL {type(e).__name__}: {e}", flush=True)

# e2e A/B (resnet50 int8_chain), onedot off/on at current DS_PAIR_DMA default
x = bench_batch()
cfg50, _, q50, s50 = build_int8_chain("resnet50")
for flag in (False, True):
    ab(
        f"e2e int8_chain DS_CONV3_ONEDOT={flag}",
        {"DS_CONV3_ONEDOT": flag},
        lambda: time_forward(cfg50, q50, s50, x),
    )

# basic-family e2e (resnet18, transitions on the basic-ds megakernel):
# onedot also covers the basic-ds shortcut loop.
cfg18, _, q18, s18 = build_int8_chain("resnet18")
for flag in (False, True):
    ab(
        f"e2e resnet18 BASIC_DS_INT8 onedot={flag}",
        {"BASIC_DS_INT8": True, "DS_CONV3_ONEDOT": flag},
        lambda: time_forward(cfg18, q18, s18, x),
    )
