"""Stem XLA experiments: does zero-padding cin 3->4/8 speed the 7x7 stem?

Measures stem+quantize+pool (the real entry, with its consumer) per variant.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from resnetc_tpu.models import resnet
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.ops.pallas.quant import quantize_with_scale
from resnetc_tpu.utils.timing import chained_seconds_per_iter

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((256, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((7, 7, 3, 64), dtype=np.float32) * 0.05, jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((64,), dtype=np.float32) * 0.05, jnp.bfloat16)
s = jnp.float32(0.05)

def entry(xx, ww, cpad):
    if cpad:
        xx = jnp.pad(xx, ((0, 0), (0, 0), (0, 0), (0, cpad - 3)))
        ww = jnp.pad(ww, ((0, 0), (0, 0), (0, cpad - 3), (0, 0)))
    y = lax_ops.conv2d(xx, ww, stride=2, padding=3)
    y = lax_ops.relu(y + b)
    yq = quantize_with_scale(y, s)
    return lax_ops.max_pool2d(yq, kernel_size=3, stride=2, padding=1)

# Salt by dynamic-update-slice and feed back a FULL |sum| over the output:
# a scalar-add salt distributes through the linear conv and XLA hoists the
# loop-invariant conv out of the timing loop, and a sliced return lets XLA
# narrow the conv to the consumed window (both traps measured on this
# machine — see probe_train_bwd.py / health.py).
for cpad in (0, 4, 8, 16):
    def fn(salt, cpad=cpad):
        upd = (salt * 1e-30).astype(x.dtype).reshape(1, 8, 8, 1)
        xx = jax.lax.dynamic_update_slice(x, upd, (0, 0, 0, 0))
        out = entry(xx, w, cpad)
        return jnp.full((8, 8), jnp.sum(jnp.abs(out.astype(jnp.float32))))
    try:
        sec = chained_seconds_per_iter(
            fn, jnp.zeros((8, 8), jnp.float32), iters=16, repeats=5
        )
        print(f"stem+q+pool cin_pad={cpad or 3}: {sec*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"stem cin_pad={cpad}: FAIL {type(e).__name__}: {e}", flush=True)

# precision=HIGHEST on bf16 operands: confirm it is a no-op on the MXU
# (lax_ops comment asserts it; if HIGHEST forces multi-pass, every conv in
# the xla backend and train step pays 3-6x).
from jax import lax
a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)
bm = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)
for prec in ("default", "highest"):
    p = lax.Precision.DEFAULT if prec == "default" else lax.Precision.HIGHEST
    def fn(salt, p=p):
        bm2 = jax.lax.dynamic_update_slice(
            bm, (salt * 1e-30).astype(jnp.bfloat16), (0, 0)
        )
        y = lax.dot_general(a, bm2, (((1,), (0,)), ((), ())), precision=p)
        return jnp.full((8, 8), jnp.sum(jnp.abs(y.astype(jnp.float32))))
    sec = chained_seconds_per_iter(
        fn, jnp.zeros((8, 8), jnp.float32), iters=48, repeats=5
    )
    print(f"bf16 dot4096 precision={prec}: {sec*1e3:.3f} ms {2*4096**3/sec/1e12:.0f} TF/s", flush=True)
