"""A/B: whole-stage L1 fusion (STAGE_FUSE_PROJ) vs per-block b0 + identity run.

Also sweeps bt for the whole-stage run kernel in isolation (salted harness).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import fused
from resnetc_tpu.utils.timing import chained_seconds_per_iter

cfg = resnet.get_config("resnet50")
variables = resnet.init(cfg, jax.random.key(0))
folded = resnet.fold_inference_params(cfg, variables)
calib = jnp.asarray(
    np.random.default_rng(1).standard_normal((8, 224, 224, 3), dtype=np.float32)
)
scales = fused.calibrate_chain_scales(cfg, folded, calib)
qtree = fused.quantize_chain(cfg, folded)
x = jnp.asarray(
    np.random.default_rng(0).standard_normal((256, 224, 224, 3), dtype=np.float32),
    jnp.bfloat16,
)

# --- isolated whole-stage kernel bt sweep (salted harness) -----------------
from resnetc_tpu.ops.pallas.block import (
    bottleneck_run_chained_int8, chain_meta, quantize_chain_block,
)

rng = np.random.default_rng(0)
h, cin, c = 56, 64, 64
c4 = 4 * c
g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)


def mk(cin_n):
    return quantize_chain_block({
        "conv1": {"weight": g(cin_n, c), "bias": g(c)},
        "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
        "conv3": {"weight": g(c, c4), "bias": g(c4)},
    })


qs = [mk(cin), mk(c4), mk(c4)]
from resnetc_tpu.ops.pallas.quant import quantize_per_channel

wdq, swd = quantize_per_channel(g(cin, c4))
bd = g(c4)
sc = jnp.asarray(
    [[0.03, 0.02, 0.03, 0.02], [0.02, 0.02, 0.03, 0.025], [0.025, 0.02, 0.03, 0.02]],
    jnp.float32,
)
hp, wp = chain_meta(0, h, h)
xr = jnp.asarray(rng.integers(-127, 128, (256 * hp * wp, cin)), jnp.int8)
stk = lambda key, qq: jnp.stack([q[key] for q in qq])

for bt in (2, 4, 8):
    def fn(salt, bt=bt):
        s = sc + jnp.sum(salt) * 1e-30
        out = bottleneck_run_chained_int8(
            xr,
            stk("w1q", qs[1:]), stk("sw1", qs), stk("b1", qs),
            stk("w2pq", qs), stk("sw2p", qs), stk("b2", qs),
            stk("w3q", qs), stk("sw3", qs), stk("b3", qs),
            s, h=h, w_sp=h, emit_i8=True, bt=bt,
            w1q0=qs[0]["w1q"], wdq=wdq, swd=swd, bd=bd,
        )
        return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

    try:
        sec = chained_seconds_per_iter(fn, jnp.zeros((8, 8), jnp.float32), iters=16)
        print(f"whole-stage L1 run kernel bt={bt}: {sec*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"whole-stage L1 run kernel bt={bt}: FAIL {type(e).__name__}: {e}",
              flush=True)

# reference: per-block b0 + 2-block identity run (current production at flag off)
# measured via e2e A/B below instead of re-isolating.

# --- e2e A/B ----------------------------------------------------------------
for flag in (False, True):
    try:
        fused.STAGE_FUSE_PROJ = flag
        fn = lambda xx: fused.fused_forward_int8_chain(cfg, qtree, scales, xx)
        sec = chained_seconds_per_iter(fn, x, iters=12)
        print(
            f"e2e int8_chain STAGE_FUSE_PROJ={flag}: {sec*1e3:.2f} ms/batch "
            f"-> {256/sec:.0f} img/s",
            flush=True,
        )
    except Exception as e:
        print(f"e2e STAGE_FUSE_PROJ={flag}: FAIL {type(e).__name__}: {e}", flush=True)
    finally:
        fused.STAGE_FUSE_PROJ = False
