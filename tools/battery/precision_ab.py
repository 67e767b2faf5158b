"""On-chip A/B: lax_ops.BF16_PRECISION DEFAULT vs HIGHEST on the bf16 paths.

The stem_pad precision probe (2026-08-19) measured a bare 4096^3 bf16 dot
at 227 TF/s under Precision.DEFAULT vs 188 TF/s under HIGHEST (-17%),
refuting the "HIGHEST is free on bf16" assumption lax_ops carried since
round 1.  This measures what actually ships: the xla-backend folded
forward (the best bf16 serving number) and the train fwd+bwd, interleaved
A/B/A/B so the weather is shared, plus a logits-parity check between the
two precisions.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _common  # noqa: F401  (repo sys.path bootstrap)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from resnetc_tpu import train as train_mod
from resnetc_tpu.models import resnet
from resnetc_tpu.ops import lax_ops
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.timing import chained_seconds_per_iter

cfg = resnet.get_config("resnet50")
variables = resnet.init(cfg, jax.random.key(0))
folded = resnet.fold_inference_params(cfg, variables)
rng = np.random.default_rng(0)
x = jnp.asarray(
    rng.standard_normal((256, 224, 224, 3), dtype=np.float32), jnp.bfloat16
)
y = jnp.asarray(np.arange(256, dtype=np.int32) % 1000)
ts = train_mod.init_train_state(cfg, jax.random.key(1))
salt0 = jnp.zeros((8, 8), jnp.float32)


def fwd_step(prec):
    # Distinct closure per precision -> distinct jit cache entry; the flag
    # is read at trace time.
    def step(salt, fc, xc):
        lax_ops.BF16_PRECISION = prec
        upd = (salt * 1e-30).astype(xc.dtype).reshape(1, 8, 8, 1)
        xx = jax.lax.dynamic_update_slice(xc, upd, (0, 0, 0, 0))
        out = resnet.forward_folded(cfg, fc, xx)
        return jnp.full((8, 8), jnp.sum(jnp.abs(out.astype(jnp.float32))))

    return step


def train_step(prec):
    def step(salt, pc, xc):
        lax_ops.BF16_PRECISION = prec
        upd = (salt * 1e-30).astype(xc.dtype).reshape(1, 8, 8, 1)
        xx = jax.lax.dynamic_update_slice(xc, upd, (0, 0, 0, 0))
        (loss, _), grads = jax.value_and_grad(
            lambda p: train_mod.loss_fn(
                cfg, p, ts.bn_state, xx, y, policy=BF16
            ),
            has_aux=True,
        )(pc)
        g0 = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return jnp.full((8, 8), loss + g0 * 1e-30)

    return step


def measure(step, consts, iters):
    return chained_seconds_per_iter(
        step, salt0, iters=iters, repeats=3, consts=consts
    )


for label, mk, consts, iters, batch in (
    ("xla fwd b256", fwd_step, (folded, x), 16, 256),
    ("train f+b b256", train_step, (ts.params, x), 8, 256),
):
    try:
        rows = []
        for rnd in range(3):  # interleaved A/B rounds share the weather
            sd = measure(mk(lax.Precision.DEFAULT), consts, iters)
            sh = measure(mk(lax.Precision.HIGHEST), consts, iters)
            rows.append((sd, sh))
            print(
                f"{label} round {rnd}: DEFAULT {sd*1e3:.3f} ms"
                f" ({batch/sd:.0f} img/s) vs HIGHEST {sh*1e3:.3f} ms"
                f" ({batch/sh:.0f} img/s)  ratio {sh/sd:.3f}",
                flush=True,
            )
        med = sorted(h / d for d, h in rows)[1]
        print(f"{label}: median HIGHEST/DEFAULT = {med:.3f}", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {e}", flush=True)

# Parity between the two precisions on the folded forward (bf16 policy is
# approximate by contract; this bounds the numerics delta of the flip).
lax_ops.BF16_PRECISION = lax.Precision.DEFAULT
got_d = np.asarray(
    jax.jit(lambda f, xx: resnet.forward_folded(cfg, f, xx))(folded, x),
    np.float32,
)


def _fwd_h(f, xx):
    lax_ops.BF16_PRECISION = lax.Precision.HIGHEST
    return resnet.forward_folded(cfg, f, xx)


got_h = np.asarray(jax.jit(_fwd_h)(folded, x), np.float32)
rel = float(np.abs(got_d - got_h).mean() / (np.abs(got_h).mean() + 1e-12))
agree = float((got_d.argmax(-1) == got_h.argmax(-1)).mean())
print(f"parity DEFAULT vs HIGHEST: rel_mae={rel:.5f} argmax_agree={agree:.4f}",
      flush=True)
lax_ops.BF16_PRECISION = lax.Precision.DEFAULT
