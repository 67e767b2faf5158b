"""Settle VERDICT r4 weak #1: did int8_chain regress, or is it weather?

Interleaves regress_worker.py subprocess invocations of OLD code (a git
worktree at the round-2 commit fad97d7, e2e 17.49 ms / L1b1 ~1.53 ms
healthy) against HEAD configurations, inside one chip window, each
invocation self-stamped with pre/post bare-copy weather.  If old code also
measures ~2.4 ms L1b1 now, the slowdown is a machine-mode shift the copy
canary does not see; if old code hits ~1.5 ms while HEAD measures 2.4 in
the same minutes, a round-3/4 change regressed the kernels and the configs
(r3 bt table, flags-off) bisect which one.

Writes REGRESS_AB.json at the repo root and prints a verdict line.

Usage: python tools/battery/regress_ab.py [--rounds 3] [--worktree /tmp/r2repo]
       [--what copy,l1b1,e2e] [--budget-s 5400]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
WORKER = Path(__file__).resolve().parent / "regress_worker.py"


def run_worker(repo: str, extra: list[str], what: str, timeout_s: int):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    cmd = [sys.executable, str(WORKER), "--repo", repo, "--what", what] + extra
    t0 = time.time()
    rc, stdout, stderr, timed_out = None, "", "", False
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, env=env)
        rc, stdout, stderr = p.returncode, p.stdout or "", p.stderr or ""
    except subprocess.TimeoutExpired as e:
        # The worker prints cumulative JSON after every probe — keep
        # whatever completed before the kill.
        timed_out = True
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
    line = None
    for ln in stdout.strip().splitlines()[::-1]:
        if ln.startswith("{"):
            line = ln
            break
    if line is None:
        return {"error": "timeout" if timed_out else f"rc={rc}", "cmd": cmd,
                "stderr_tail": stderr[-800:], "wall_s": time.time() - t0}
    out = json.loads(line)
    if timed_out:
        out["partial"] = "timeout"
    elif rc != 0:
        out["partial"] = f"rc={rc}"
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--worktree", default="/tmp/r2repo")
    ap.add_argument("--what", default="copy,l1b1,e2e")
    ap.add_argument("--budget-s", type=float, default=5400)
    ap.add_argument("--per-call-timeout", type=int, default=1500)
    ap.add_argument("--out", default=str(REPO / "REGRESS_AB.json"))
    args = ap.parse_args()

    configs = [
        # (name, repo, worker extra args)
        ("r2-code", args.worktree, []),
        ("head", str(REPO), []),
        ("head-r3bt", str(REPO), ["--bt-table", "r3"]),
        ("head-noflags", str(REPO), ["--flags-off"]),
    ]
    results: list[dict] = []
    start = time.time()
    stopped = None
    for rnd in range(args.rounds):
        for name, repo, extra in configs:
            if time.time() - start > args.budget_s:
                stopped = f"budget after round {rnd}"
                break
            rec = run_worker(repo, extra + ["--tag", f"{name}/{rnd}"],
                             args.what, args.per_call_timeout)
            rec["config"] = name
            rec["round"] = rnd
            results.append(rec)
            msg = {k: rec.get(k) for k in
                   ("config", "round", "copy_gbs_pre", "l1b1_ms", "e2e_ms",
                    "copy_gbs_post", "error", "wall_s")}
            print(json.dumps(msg), flush=True)
            # persist incrementally: the window may close mid-run
            Path(args.out).write_text(json.dumps(
                {"results": results, "stopped": stopped}, indent=1))
        if stopped:
            break

    # verdict: median per config per metric
    def med(vals):
        vals = sorted(v for v in vals if isinstance(v, (int, float)))
        n = len(vals)
        if not n:
            return None
        return vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2

    summary = {}
    for name, _, _ in configs:
        rows = [r for r in results if r.get("config") == name and "error" not in r]
        summary[name] = {
            "n": len(rows),
            "l1b1_ms": med([r.get("l1b1_ms") for r in rows]),
            "e2e_ms": med([r.get("e2e_ms") for r in rows]),
            "copy_gbs": med([r.get("copy_gbs_pre") for r in rows]
                            + [r.get("copy_gbs_post") for r in rows]),
        }
    verdict = None
    r2, head = summary.get("r2-code", {}), summary.get("head", {})
    if r2.get("l1b1_ms") and head.get("l1b1_ms"):
        ratio = head["l1b1_ms"] / r2["l1b1_ms"]
        if ratio > 1.15:
            verdict = (f"CODE REGRESSION: HEAD L1b1 {head['l1b1_ms']:.3f} ms vs "
                       f"r2-code {r2['l1b1_ms']:.3f} in the same window "
                       f"({ratio:.2f}x) — bisect via head-r3bt/head-noflags rows")
        elif r2["l1b1_ms"] > 1.9:
            verdict = (f"MACHINE MODE: r2 code also measures {r2['l1b1_ms']:.3f} ms "
                       f"(healthy-era 1.53) at copy {r2.get('copy_gbs')} GB/s — "
                       "the degradation is real and the copy canary does not see it")
        else:
            verdict = (f"HEALTHY + NO REGRESSION: r2 {r2['l1b1_ms']:.3f} / HEAD "
                       f"{head['l1b1_ms']:.3f} ms — round-4's numbers were weather")
    out = {"results": results, "summary": summary, "verdict": verdict,
           "stopped": stopped, "unix_time": int(time.time())}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print("VERDICT:", verdict)


if __name__ == "__main__":
    main()
