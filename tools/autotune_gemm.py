#!/usr/bin/env python
"""Tile autotuner for ops.pallas.gemm.matmul (VERDICT r1 item 5 / r2 item 5).

Sweeps (tm, tn, tk) at the five ResNet-50 GEMM shapes with the salted
chained harness (see PERF.md: the default harness feedback inflates small
kernels; the |out| reduction is paid symmetrically so RATIOS are honest).
Prints one ranked table per shape plus a final best-tile summary in the
format `gemm._BEST_TILES` consumes.

Machine-health note: the axon-tunneled chip's absolute rate wanders
(PERF.md round-3); rankings between configs measured back-to-back in one
run are stable.  Re-validate the winner against XLA on a healthy machine
before updating PERF.md numbers.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/autotune_gemm.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.ops.pallas.gemm import matmul
from resnetc_tpu.utils.timing import chained_seconds_per_iter

# (name, M, K, N) — the 1x1 convs of each stage as GEMMs at batch 256 + head.
SHAPES = [
    ("L1", 256 * 56 * 56, 64, 256),
    ("L2", 256 * 28 * 28, 128, 512),
    ("L3", 256 * 14 * 14, 256, 1024),
    ("L4", 256 * 7 * 7, 512, 2048),
    ("fc", 256, 2048, 1000),
]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def candidates(m, k, n):
    """Tile grids worth trying: MXU-aligned, VMEM-bounded (~12 MB/step with
    pallas's double buffering), K whole when it fits (kills the scratch
    accumulator round trips)."""
    out = []
    for tm in (256, 512, 1024, 2048, 4096):
        if tm > _round_up(m, 128):
            continue
        for tn in (128, 256, 512):
            if tn > _round_up(n, 128):
                continue
            for tk in (256, 512, 1024, 2048):
                if tk > _round_up(k, 128):
                    continue
                # double-buffered x/w blocks + fp32 acc + out block
                vmem = 2 * (tm * tk + tk * tn) * 2 + tm * tn * 4 + tm * tn * 2
                if vmem > 12 * 2**20:
                    continue
                out.append((tm, tn, tk))
    # always include the full-K variant for small K
    if _round_up(k, 128) <= 2048:
        for tm in (512, 1024, 2048):
            if tm <= _round_up(m, 128):
                cand = (tm, min(512, _round_up(n, 128)), _round_up(k, 128))
                if cand not in out:
                    out.append(cand)
    return out


def main() -> int:
    rng = np.random.default_rng(0)
    best = {}
    for name, m, k, n in SHAPES:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
        salt0 = jnp.zeros((1, 1), jnp.float32)
        tf = lambda s: 2 * m * k * n / s / 1e12

        # Chain length sized so the two-point diff is ~50+ ms even at MXU
        # peak — the fc shape is ~10 us/iter and a 16-iter chain's diff is
        # far inside tunnel RTT jitter (the r4 run printed 0.000 ms rows
        # and 6e5x ratios).  Median over repeated pairs on top.
        est = 2 * m * k * n / 60e12
        iters = max(16, min(4096, int(0.06 / est)))

        def xla_fn(salt):
            # dynamic-update-slice salt: a scalar add distributes through
            # the dot and XLA hoists the loop-invariant x@w entirely.
            xx = jax.lax.dynamic_update_slice(
                x, (salt * 1e-30).astype(x.dtype), (0, 0)
            )
            out = jax.lax.dot_general(
                xx, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(jnp.abs(out)).reshape(1, 1)

        sec_x = chained_seconds_per_iter(xla_fn, salt0, iters=iters, repeats=3)
        print(f"== {name} ({m},{k})x({k},{n})  xla {sec_x*1e3:7.3f} ms "
              f"({tf(sec_x):6.1f} TF/s)", flush=True)

        results = []
        for tm, tn, tk in candidates(m, k, n):
            def pallas_fn(salt, tm=tm, tn=tn, tk=tk):
                xx = jax.lax.dynamic_update_slice(
                    x, (salt * 1e-30).astype(x.dtype), (0, 0)
                )
                out = matmul(xx, w, tm=tm, tn=tn, tk=tk)
                return jnp.sum(jnp.abs(out.astype(jnp.float32))).reshape(1, 1)

            try:
                sec = chained_seconds_per_iter(
                    pallas_fn, salt0, iters=iters, repeats=3
                )
            except Exception as e:
                print(f"   ({tm:5d},{tn:4d},{tk:4d})  FAIL {type(e).__name__}",
                      flush=True)
                continue
            results.append((sec, (tm, tn, tk)))
            print(f"   ({tm:5d},{tn:4d},{tk:4d})  {sec*1e3:7.3f} ms "
                  f"({tf(sec):6.1f} TF/s)  vs xla {sec_x/sec:4.2f}x", flush=True)
        if results:
            results.sort()
            sec, tiles = results[0]
            best[name] = (m, k, n, tiles, sec, sec_x)
            print(f"   BEST {tiles}  {sec*1e3:.3f} ms  ratio {sec_x/sec:.2f}",
                  flush=True)

    print("\n# best-tile table ((M,K,N) -> (tm,tn,tk), ratio = xla/pallas):")
    for name, (m, k, n, tiles, sec, sec_x) in best.items():
        print(f"#  {name}: ({m},{k},{n}): {tiles},  # {sec_x/sec:.2f}x xla")

    # Persist the winners: gemm._BEST_TILES loads GEMM_TILES.json at import
    # (the TUNED.json pattern) — an unattended chip window populates the
    # table without a human copying a printed dict (VERDICT r4 #8b).
    if best:
        import json
        import time

        out_path = REPO / "GEMM_TILES.json"
        out_path.write_text(json.dumps({
            "tiles": [
                {"name": name, "shape": [m, k, n], "tiles": list(tiles),
                 "pallas_ms": round(sec * 1e3, 4),
                 "xla_ms": round(sec_x * 1e3, 4),
                 "vs_xla": round(sec_x / sec, 3)}
                for name, (m, k, n, tiles, sec, sec_x) in best.items()
            ],
            "written_by": "tools/autotune_gemm.py",
            "unix_time": int(time.time()),
        }, indent=1) + "\n")
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
