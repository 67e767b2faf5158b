"""Version-agnostic measurement worker for the int8_chain regression A/B.

VERDICT r4 weak #1: round-2 measured int8_chain e2e at 17.49 ms (L1b1
~1.53 ms) while every round-4 window measured ~23.4 ms (L1b1 2.4-2.8 ms)
— yet ROOFLINE.json recorded *healthy-class* bare-copy rates (667 GB/s) in
the same window.  Either the weather model measures the wrong thing, or a
round-3/4 code change regressed the kernels ~30%.

This worker runs against an ARBITRARY checkout of the package (HEAD, or a
git worktree of fad97d7 / any round-2/3 commit) so tools/battery/regress_ab.py
can interleave old-code and new-code measurements inside one chip window.
The timing harness is therefore SELF-CONTAINED here (a copy of
resnetc_tpu/utils/timing.py's two-point chained design, consts-as-jit-args,
median over pairs) — the measurement must be identical regardless of which
package version is under test.

Prints ONE JSON line: {"repo": ..., "config": ..., "copy_gbs_pre": ...,
"l1b1_ms": ..., "e2e_ms": ..., "copy_gbs_post": ..., "ts": ...}.

Usage:
  python regress_worker.py --repo /root/repo --what copy,l1b1,e2e \
      [--bt-table r3|r4] [--flags-off] [--iters 16] [--repeats 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse():
    p = argparse.ArgumentParser()
    p.add_argument("--repo", required=True)
    p.add_argument("--what", default="copy,l1b1,e2e")
    p.add_argument("--bt-table", default=None, choices=[None, "r3", "r4"])
    p.add_argument("--flags-off", action="store_true",
                   help="zero every tunable fused.py flag that exists")
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--l1-bt", type=int, default=None,
                   help="force the L1b1 probe's bt (default: repo's picker)")
    p.add_argument("--tag", default="")
    return p.parse_args()


ARGS = _parse()
sys.path.insert(0, ARGS.repo)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


# --- self-contained two-point chained timing (timing.py semantics) --------
def chained_sec(step_fn, carry0, *, iters, repeats, consts=()):
    @jax.jit
    def run(carry, n, *cs):
        def body(_, c):
            out = step_fn(c, *cs)
            eps = (jnp.sum(out.astype(jnp.float32)) * 1e-20).astype(
                jax.tree.leaves(c)[0].dtype)
            return jax.tree.map(lambda v: v + eps, c)

        final = lax.fori_loop(0, n, body, carry)
        return jnp.sum(jax.tree.leaves(final)[0].astype(jnp.float32))

    iters = max(iters, 2)
    nb, nf = jnp.int32(max(1, iters // 8)), jnp.int32(iters)
    float(run(carry0, nb, *consts))
    float(run(carry0, nf, *consts))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(run(carry0, nb, *consts))
        tb = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(carry0, nf, *consts))
        diffs.append(time.perf_counter() - t0 - tb)
    diffs.sort()
    n = len(diffs)
    med = diffs[n // 2] if n % 2 else (diffs[n // 2 - 1] + diffs[n // 2]) / 2
    return max(med / (int(nf) - int(nb)), 1e-9)


def copy_gbs(rng):
    """Bare Pallas copy at the L1 chain geometry — the same window-rate
    canary bench.py/ROOFLINE stamp (Pallas is opaque to XLA, so the copy
    cannot be narrowed away; an earlier XLA version of this probe was).
    Implemented inline (not imported from tools/roofline_attrib) because
    this worker must run against round-2 worktrees that predate that tool;
    jax/pallas itself is the same interpreter-wide install either way."""
    from jax.experimental import pallas as pl

    hp, wp, bt = 58, 64, 4
    rows_bt = bt * hp * wp
    n = 256 // bt
    x = jnp.asarray(rng.integers(-127, 128, (n * rows_bt, 256)), jnp.int8)

    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]
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
        y = copy(salt.astype(jnp.float32), xc)
        return lax.slice(y, (0, 0), (8, 128)).astype(jnp.float32)

    sec = chained_sec(step, jnp.zeros((8, 128), jnp.float32),
                      iters=8, repeats=ARGS.repeats, consts=(x,))
    return 2 * x.size / sec / 1e9


def bf16_tfs(rng):
    """Raw bf16 MXU rate (4096^3 chained dots, dus-salted) — separates a
    compute-rate degradation from the DMA-rate story."""
    a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32),
                    jnp.bfloat16)

    def step(salt, aa, bb):
        a2 = jax.lax.dynamic_update_slice(
            aa, (salt[:8, :8] * 1e-30).astype(jnp.bfloat16), (0, 0))
        return jnp.sum((a2 @ bb).astype(jnp.float32))[None, None] * jnp.ones(
            (8, 8), jnp.float32)

    sec = chained_sec(step, jnp.zeros((8, 8), jnp.float32),
                      iters=32, repeats=ARGS.repeats, consts=(a, b))
    return 2 * 4096**3 / sec / 1e12


def l1b1_ms(rng):
    """The health.py canary: one stride-1 c=64 chain kernel, b256 56x56."""
    from resnetc_tpu.ops.pallas.block import (
        bottleneck_block_chained_int8, chain_meta, quantize_chain_block)
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

    def step(salt, xq, *w):
        s = scales + jnp.sum(salt) * 1e-30
        out = bottleneck_block_chained_int8(
            xq, q["w1q"], q["sw1"], q["b1"], q["w2pq"], q["sw2p"], q["b2"],
            q["w3q"], q["sw3"], q["b3"], s, h=h, w_sp=h, emit_i8=True,
            bt=ARGS.l1_bt)
        return lax.slice(out, (0, 0), (8, 8)).astype(jnp.float32)

    sec = chained_sec(step, jnp.zeros((8, 8), jnp.float32),
                      iters=ARGS.iters, repeats=ARGS.repeats, consts=(xr,))
    return sec * 1e3


def e2e_ms(rng):
    """resnet50 b256 int8_chain end to end (bench.py's tune-measure shape)."""
    from resnetc_tpu.models import resnet
    from resnetc_tpu.ops.pallas import fused
    from resnetc_tpu.serve import InferenceEngine
    from resnetc_tpu.tensor import BF16

    cfg = resnet.get_config("resnet50")
    variables = resnet.init(cfg, jax.random.key(0))
    images = jnp.asarray(
        rng.standard_normal((256, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
    eng = InferenceEngine(cfg, variables, policy=BF16, backend="int8_chain",
                          calib_batch=images[:8])

    def step(x, imgs, *rest):
        return fused.fused_forward_int8_chain(cfg, eng.folded,
                                              eng._chain_scales, imgs + x)

    # imgs as a const jit arg (the r2 harness's closure-ship trap); the
    # carry is a tiny bf16 perturbation image.
    sec = chained_sec(step, jnp.zeros_like(images[:1]),
                      iters=ARGS.iters, repeats=ARGS.repeats, consts=(images,))
    return sec * 1e3


def main():
    out = {"repo": ARGS.repo, "tag": ARGS.tag, "ts": time.time(),
           "pid": os.getpid()}
    # Config mutations (best-effort: attributes may not exist in old trees).
    if ARGS.flags_off:
        try:
            from resnetc_tpu.ops.pallas import fused
            for k in getattr(fused, "_TUNABLE_FLAGS", ()):
                d = getattr(fused, k)
                off = () if isinstance(d, tuple) else (0 if isinstance(d, int)
                      and not isinstance(d, bool) else False)
                setattr(fused, k, off)
            out["flags_off"] = True
        except Exception as e:
            out["flags_off"] = f"unavailable: {e}"
    if ARGS.bt_table:
        try:
            from resnetc_tpu.ops.pallas import block
            tables = {"r3": {64: 4, 128: 8, 256: 8, 512: 16},
                      "r4": {64: 4, 128: 8, 256: 16, 512: 32}}
            block._MEASURED_BT_CHAIN.clear()
            block._MEASURED_BT_CHAIN.update(tables[ARGS.bt_table])
            out["bt_table"] = ARGS.bt_table
        except Exception as e:
            out["bt_table"] = f"unavailable: {e}"

    rng = np.random.default_rng(0)
    what = ARGS.what.split(",")
    # Emit a cumulative JSON line after EVERY probe: if the caller's
    # timeout kills us mid-e2e-compile, the completed probes survive (the
    # orchestrator takes the last JSON line).
    if "copy" in what:
        out["copy_gbs_pre"] = round(copy_gbs(rng), 1)
        print(json.dumps(out), flush=True)
    if "dot" in what:
        out["bf16_tfs"] = round(bf16_tfs(rng), 1)
        print(json.dumps(out), flush=True)
    if "l1b1" in what:
        out["l1b1_ms"] = round(l1b1_ms(rng), 3)
        print(json.dumps(out), flush=True)
    if "e2e" in what:
        out["e2e_ms"] = round(e2e_ms(rng), 3)
        print(json.dumps(out), flush=True)
    if "copy" in what:
        out["copy_gbs_post"] = round(copy_gbs(np.random.default_rng(1)), 1)
    out["ts_end"] = time.time()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
