"""Machine-health probe: the L1b1 chain kernel (cache-hit) + raw dot.

Known-good (healthy machine): L1b1 ~1.53 ms; degraded (2026-08-17 ~11:00):
~2.7 ms.  Run before trusting any absolute number.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.block import (
    bottleneck_block_chained_int8, chain_meta, quantize_chain_block,
)
from resnetc_tpu.utils.timing import chained_seconds_per_iter

rng = np.random.default_rng(0)
h, cin, c = 56, 256, 64
c4 = 4 * c
g = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.1)
q = quantize_chain_block({
    "conv1": {"weight": g(cin, c), "bias": g(c)},
    "conv2": {"weight": g(3, 3, c, c), "bias": g(c)},
    "conv3": {"weight": g(c, c4), "bias": g(c4)},
})
scales = jnp.asarray([0.03, 0.02, 0.03, 0.02], jnp.float32)
hp, wp = chain_meta(0, h, h)
xr = jnp.asarray(rng.integers(-127, 128, (256 * hp * wp, cin)), jnp.int8)

def fn(salt):
    s = scales + jnp.sum(salt) * 1e-30
    out = bottleneck_block_chained_int8(
        xr, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
        q["w3q"], q["sw3"], q["b3"], s, h=h, w_sp=h, emit_i8=True)
    return jax.lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

sec = chained_seconds_per_iter(
    fn, jnp.zeros((8, 8), jnp.float32), iters=16, repeats=5
)
print(f"health L1b1: {sec*1e3:.3f} ms ({'HEALTHY' if sec < 1.9e-3 else 'DEGRADED'})")

# raw bf16 dot as a second, kernel-independent reference (~179 TF/s healthy).
# Two measurement traps fixed here (the r4 battery read 0.000 ms): a scalar
# operand perturbation distributes and the dot hoists out of the loop, and a
# sliced return lets XLA narrow the dot to the consumed rows — so perturb by
# dynamic-update-slice and carry a FULL reduction of y.
a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32), jnp.bfloat16)

def dot_chain(salt):
    a2 = jax.lax.dynamic_update_slice(
        a, jnp.full((8, 8), salt * 1e-30, jnp.bfloat16), (0, 0)
    )
    return jnp.sum((a2 @ b).astype(jnp.float32))

# Sub-ms step: a single two-point pair is inside the tunnel's RTT jitter
# (two 0.000 ms readings on 2026-08-19) — median over repeated pairs at a
# longer chain.
sec2 = chained_seconds_per_iter(dot_chain, jnp.float32(0), iters=48, repeats=5)
tf = 2 * 4096**3 / sec2 / 1e12
print(f"health dot4096: {sec2*1e3:.3f} ms  {tf:.0f} TF/s ({'HEALTHY' if tf > 140 else 'DEGRADED'})")
