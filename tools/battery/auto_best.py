"""Unattended greedy flag search: find, gate, and PERSIST the best config.

The per-flag A/B legs give attribution; this leg gives the ANSWER even if
nobody is watching the one chip window: it reuses bench.greedy_tune (the
same engine the official bench self-tunes with) to greedily accept each
candidate fused.py flag (resnet50 int8_chain e2e, honest chained harness)
when it wins by >1% AND passes the logits parity gate vs the default
config, then writes the winning combination to <repo>/TUNED.json — which
fused.py overlays onto its code defaults at import, so serving, the CLI,
and subsequent bench runs all start from the measured-best config without
a human in the loop.  Every candidate flag is additionally interpret-mode
bit-match pinned in tests/test_pallas.py, and the battery runs the full
on-chip Mosaic gate (tools/verify_tpu.py) before this leg.

Greedy order is the expected-impact ranking (whole-stage first); each
candidate is evaluated on top of the already-accepted set, so interactions
with earlier winners are captured (a full 2^n sweep is not worth the chip
time at n=4).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import REPO, bench_batch, build_int8_chain, fused, time_forward  # noqa: E402

sys.path.insert(0, REPO)
import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import TUNE_CANDIDATES, greedy_tune, logits_parity  # noqa: E402

def tune_model(model: str, candidates, *, budget_s: float):
    """One greedy pass: (accepted, records) for ``model``'s int8_chain e2e.
    Accepted flags stay set on fused (later passes tune on top of them)."""
    x = bench_batch()
    cfg, _, qtree, scales = build_int8_chain(model)

    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret

    def fwd(xx):
        return fused.fused_forward_int8_chain(
            cfg, qtree, scales, xx, interpret=interp
        )

    # Default-config logits: the parity reference for every candidate.  The
    # acceptance gate itself (thresholds included) is bench.logits_parity —
    # ONE copy shared with the official bench's self-tune, so what this leg
    # persists as serving defaults can never drift from what bench accepts.
    ref = np.asarray(jax.device_get(jax.jit(fwd)(x)).astype(np.float32))

    def measure():
        return time_forward(cfg, qtree, scales, x, iters=16)

    accepted, base, best, records = greedy_tune(
        fused, candidates, measure, lambda: logits_parity(ref, fwd, x),
        budget_s=budget_s,
        log=lambda s: print(f"[{model}] {s}", flush=True),
    )
    summary = {
        "metric": f"{model} b256 int8_chain e2e, greedy-best flags",
        "images_per_sec": round(256 / best, 1) if best else None,
        "ms_per_batch": round(best * 1e3, 3) if best else None,
        "accepted_flags": accepted,
        "vs_defaults": round(base / best, 4) if base and best else None,
        "candidates": records,
    }
    EVIDENCE.append(summary)
    print(json.dumps(summary), flush=True)
    return accepted


EVIDENCE: list = []


# RESNETC_AUTOBEST_ONLY=FLAG[,FLAG...] restricts the resnet50 pass to the
# named candidates — a cheap re-run lane for a single new flag (e.g. the
# session-6 CHAIN_PIPE_DMA A/B) without re-A/B-ing the dispositioned set.
import os as _os

_only = _os.environ.get("RESNETC_AUTOBEST_ONLY")
R50_CANDIDATES = (
    [c for c in TUNE_CANDIDATES if c[0] in _only.split(",")]
    if _only
    else TUNE_CANDIDATES
)

# Each pass is exception-isolated: a setup failure in pass 2 (model build,
# parity-reference compile under pass 1's still-set flags) must not discard
# pass 1's measured winners before the TUNED.json write below.
accepted: dict = {}
for model, candidates, budget in (
    # Pass 1: the headline model, the full candidate set.
    ("resnet50", R50_CANDIDATES, 2700.0),
    # Pass 2: the basic family's own flag (no effect on bottleneck models),
    # on top of pass 1's winners — resnet18 shares the stem/ds machinery,
    # so the already-accepted flags apply to it too.
    ("resnet18", [("BASIC_DS_INT8", True)], 900.0),
):
    if _only and not any(c[0] in _only.split(",") for c in candidates):
        continue  # restricted run: skip passes with no requested candidate
    try:
        accepted.update(tune_model(model, candidates, budget_s=budget))
    except Exception as e:
        print(f"[{model}] pass FAILED: {type(e).__name__}: {e}", flush=True)

# Persist: merge with whatever TUNED.json already flipped (those candidates
# were skipped as already-default above) so earlier wins survive.
combined = {**dict(fused.TUNED_DEFAULTS), **accepted}
if combined:
    import os

    # Symmetric with the loader: RESNETC_TUNED_JSON redirects the output
    # (the CPU smoke must not write flags accepted on meaningless CPU
    # timings into the repo's real TUNED.json).
    out = Path(os.environ.get("RESNETC_TUNED_JSON") or (Path(REPO) / "TUNED.json"))
    # A RESTRICTED run (RESNETC_AUTOBEST_ONLY) must not clobber the
    # acceptance evidence of flags it did not re-judge — append its passes
    # to the existing evidence instead (a round-5 restricted A/B silently
    # replaced the L1_PIXEL_PAIR/BASIC_DS_INT8 evidence block).
    passes = list(EVIDENCE)
    if _only:
        try:
            old = json.loads(out.read_text())
            passes = old["evidence"]["passes"] + passes
        except Exception:
            pass
    out.write_text(json.dumps({
        "flags": combined,
        "evidence": {
            "harness": "int8_chain e2e, chained harness, 16 iters, b256",
            "passes": passes,
            "written_by": "tools/battery/auto_best.py",
            "unix_time": int(time.time()),
        },
    }, indent=1) + "\n")
    print(f"TUNED.json written: {combined}", flush=True)
