"""A/B: ds megakernels with pair_dma True/False — isolated (salted) + e2e."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from resnetc_tpu.ops.pallas.block import (
    chain_meta, downsample_block_s2_int8, quantize_ds_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter

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
    # Two interleaved pairs per shape, long chains + repeats (the ds
    # kernels are sub-ms where single-pair two-point diffs are RTT noise).
    for pair in (False, True, False, True):
        def fn(salt, xq, pair=pair):
            s = sc + jnp.sum(salt) * 1e-30
            out = downsample_block_s2_int8(
                xq, q["w1q"], q["sw1"], q["b1"], q["w2q"], q["sw2"], q["b2"],
                q["w3q"], q["sw3"], q["b3"], q["wdq"], q["swd"], q["bd"],
                s, h=h, w_sp=h, emit_i8=True, pair_dma=pair)
            return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)
        try:
            sec = chained_seconds_per_iter(
                fn, jnp.zeros((8, 8), jnp.float32), iters=32, repeats=7,
                consts=(xr,))
            print(f"{name}ds pair_dma={pair}: {sec*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}ds pair_dma={pair}: FAIL {type(e).__name__}: {e}", flush=True)

# e2e A/B
from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import fused
cfg = resnet.get_config("resnet50")
variables = resnet.init(cfg, jax.random.key(0))
folded = resnet.fold_inference_params(cfg, variables)
calib = jnp.asarray(np.random.default_rng(1).standard_normal((8, 224, 224, 3), dtype=np.float32))
scales = fused.calibrate_chain_scales(cfg, folded, calib)
qtree = fused.quantize_chain(cfg, folded)
x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
for flag in (False, True):
    try:
        fused.DS_PAIR_DMA = flag
        fn = lambda xx: fused.fused_forward_int8_chain(cfg, qtree, scales, xx)
        sec = chained_seconds_per_iter(fn, x, iters=12)
        print(f"e2e int8_chain DS_PAIR_DMA={flag}: {sec*1e3:.2f} ms -> {256/sec:.0f} img/s", flush=True)
    except Exception as e:
        print(f"e2e DS_PAIR_DMA={flag}: FAIL {type(e).__name__}: {e}", flush=True)
    finally:
        fused.DS_PAIR_DMA = False
