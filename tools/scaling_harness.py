#!/usr/bin/env python
"""DP scaling shape on a virtual CPU mesh: partitioning overhead vs n_devices.

Real multi-chip hardware is not reachable from this host (one v5e chip via
the axon tunnel), so absolute speedup cannot be measured here.  What CAN be
measured — and what this harness records — is the *partitioning overhead*
of the DP program: with the GLOBAL batch held fixed, a 1-core CPU host does
the same total FLOPs whether the array is sharded over 1 or 8 virtual
devices, so ideal scaling is a flat time curve and any rise is the cost of
the partitioned program (halo/collective/reshard logic XLA inserted).

Numbers are RELATIVE (CPU, virtual devices sharing one core) — they say
nothing about absolute img/s on TPU; they bound the overhead the SPMD
program adds on top of the math.  On real ICI-connected chips the same
program's collectives ride ICI (see parallel/mesh.py), and per-chip work
drops as 1/n.

Covers BASELINE.json config #5's two DP claims:
  - serving: the XLA backend's sharded folded tree (SPMD partitioner)
  - training: sharded_train_step (gradient psum over the data axis)

Each device count runs in a fresh subprocess (device count is fixed at
backend init).  Usage:  python tools/scaling_harness.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[1]))
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models import resnet
from resnetc_tpu.parallel import batch_sharding, create_mesh, param_shardings
from resnetc_tpu.serve import InferenceEngine
from resnetc_tpu.tensor import BF16
from resnetc_tpu import train as train_mod
from resnetc_tpu.utils.timing import chained_seconds_per_iter

n = int(sys.argv[1])
GLOBAL_BATCH = 16          # fixed: same total FLOPs at every n (1-core host)
SIZE = 64
cfg = resnet.get_config("resnet18")
variables = resnet.init(cfg, jax.random.key(0))
x_np = np.random.default_rng(0).standard_normal(
    (GLOBAL_BATCH, SIZE, SIZE, 3), dtype=np.float32
)

mesh = create_mesh(n, 1)
folded_like = resnet.fold_inference_params(cfg, variables)
engine = InferenceEngine(
    cfg, variables, policy=BF16, backend="xla",
    sharding=param_shardings(mesh, folded_like), mesh=mesh,
)
x = jax.device_put(jnp.asarray(x_np, jnp.bfloat16), batch_sharding(mesh))
run = engine._fn()
folded = engine.folded
serve_s = chained_seconds_per_iter(lambda xx: run(folded, xx), x, iters=8)

tcfg = train_mod.TrainConfig(lr=0.1, policy_name="bf16")
ts = train_mod.init_train_state(cfg, jax.random.key(1))
step_fn, shard_state, _ = train_mod.sharded_train_step(cfg, tcfg, mesh)
ts = shard_state(ts)
y = jax.device_put(
    jnp.asarray(np.arange(GLOBAL_BATCH, dtype=np.int32) % 1000),
    batch_sharding(mesh),
)
lr = jnp.float32(0.1)
import time
ts, _ = step_fn(ts, x.astype(jnp.float32), y, lr)   # compile + warm
jax.block_until_ready(ts.params)
t0 = time.perf_counter()
STEPS = 4
for _ in range(STEPS):
    ts, m = step_fn(ts, x.astype(jnp.float32), y, lr)
float(m["loss"])  # host fetch forces completion of the chain
train_s = (time.perf_counter() - t0) / STEPS

print(json.dumps({
    "n_devices": n,
    "serve_ms": round(serve_s * 1e3, 2),
    "train_ms": round(train_s * 1e3, 2),
}))
"""


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    parser.add_argument("--json", action="store_true", help="JSON lines only")
    args = parser.parse_args()

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    rows = []
    for n in args.devices:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(n)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        if out.returncode != 0:
            print(f"n={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        if args.json:
            print(json.dumps(row))
    if args.json or not rows:
        return
    base = rows[0]
    print(
        "# DP partitioning overhead, virtual CPU mesh (relative — fixed "
        "global batch 16, resnet18@64, 1 physical core; flat = zero overhead)"
    )
    print("| n_devices | serve ms/batch | overhead | train ms/step | overhead |")
    print("|---|---|---|---|---|")
    for r in rows:
        so = r["serve_ms"] / base["serve_ms"] - 1
        to = r["train_ms"] / base["train_ms"] - 1
        print(
            f"| {r['n_devices']} | {r['serve_ms']} | {so:+.1%} "
            f"| {r['train_ms']} | {to:+.1%} |"
        )


if __name__ == "__main__":
    main()
