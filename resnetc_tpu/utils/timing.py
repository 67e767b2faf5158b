"""Trustworthy device timing on asynchronous/tunneled runtimes.

On this machine the TPU is reached through a tunnel whose
``block_until_ready`` resolves without waiting for device execution, so the
naive dispatch-loop-then-block benchmark measures RPC overhead, not compute
(discovered the hard way; see PERF.md).  The only reliable clock is a
device->host fetch of a value that data-depends on ALL the work.

``chained_seconds_per_iter`` therefore:

1. builds one jitted program that runs the step function ``iters`` times in
   a ``lax.fori_loop``, each iteration feeding a reduction of its output
   back into the carry (so no iteration can be elided, narrowed, or
   hoisted),
2. reduces the final carry to one scalar and fetches it (forces completion),
3. measures at two iteration counts and reports the marginal cost per
   iteration — subtracting the RTT + dispatch constant exactly.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _build(step_fn: Callable, feedback: Callable):
    @jax.jit
    def run(carry, iters, *consts):
        def body(_, c):
            out = step_fn(c, *consts)
            return feedback(c, out)

        # Dynamic trip count: ONE compiled program serves both the base and
        # full iteration counts (halves the harness's compile cost; the loop
        # body lowering is identical either way).
        final = lax.fori_loop(0, iters, body, carry)
        return jnp.sum(
            jax.tree.leaves(final)[0].astype(jnp.float32)
        )

    return run


def default_feedback(carry, out):
    """Perturb the carry by a full reduction of the output — every element
    of ``out`` is live, and the perturbation (1e-20 scale) cannot change
    the measured computation's cost."""
    eps = (jnp.sum(out.astype(jnp.float32)) * 1e-20).astype(
        jax.tree.leaves(carry)[0].dtype
    )
    return jax.tree.map(lambda c: c + eps, carry)


def chained_seconds_per_iter(
    step_fn: Callable,
    carry0,
    *,
    iters: int = 20,
    feedback: Callable = default_feedback,
    warmup_runs: int = 1,
    repeats: int = 1,
    consts: tuple = (),
) -> float:
    """Marginal device seconds per execution of ``step_fn``.

    step_fn: (carry, *consts) -> output (pure, jittable); carry0: initial
    carry (e.g. a device-resident input batch).  Cost of ``feedback`` (one
    reduction over the output + one add over the carry) is included — keep
    the carry small relative to the step's own traffic or account for it.

    ``consts``: loop-invariant device arrays (weights, input batches)
    passed as jit ARGUMENTS rather than closed over.  A closed-over
    jax.Array is shipped inside the serialized compile request on this
    tunneled runtime — a b384 image batch + resnet50 params exceeded the
    axon remote_compile body limit (HTTP 413, 2026-08-19).  Anything
    bigger than a few MB belongs here, not in a closure.

    ``repeats``: number of (base, full) sample pairs; the reported value is
    the MEDIAN of the per-pair marginal costs.  One pair is fine when the
    chain-length difference is tens of ms, but for sub-ms step costs the
    difference (iters_delta * cost) can be smaller than the tunnel's RTT
    jitter — a single pair then returns garbage, including negative diffs
    (health.py printed 0.000 ms twice on 2026-08-19 this way).  Use
    repeats>=5 for any probe whose step cost is under ~1 ms.
    """
    # The marginal cost needs two distinct chain lengths; iters=1 would
    # divide by zero below.
    iters = max(int(iters), 2)
    base_iters = max(1, iters // 8)
    run = _build(step_fn, feedback)
    nb = jnp.int32(base_iters)
    nf = jnp.int32(iters)

    for _ in range(warmup_runs):
        float(run(carry0, nb, *consts))
        float(run(carry0, nf, *consts))

    diffs = []
    for _ in range(max(int(repeats), 1)):
        t0 = time.perf_counter()
        float(run(carry0, nb, *consts))
        t_base = time.perf_counter() - t0

        t0 = time.perf_counter()
        float(run(carry0, nf, *consts))
        t_full = time.perf_counter() - t0
        diffs.append(t_full - t_base)

    diffs.sort()
    med = diffs[len(diffs) // 2] if len(diffs) % 2 else (
        (diffs[len(diffs) // 2 - 1] + diffs[len(diffs) // 2]) / 2
    )
    return max(med / (iters - base_iters), 1e-9)


def fetch_seconds(fn: Callable, *args, samples: int = 20) -> list[float]:
    """End-to-end request latencies: each sample dispatches one call and
    fetches one scalar of the result to host (the time a serving frontend
    actually waits, RTT included)."""
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(jfn(*args))  # compile
    out = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(jfn(*args))
        out.append(time.perf_counter() - t0)
    return out
