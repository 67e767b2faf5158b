"""Unit tests for bench.greedy_tune — the bench's on-the-spot flag search.

The on-chip tuning phase itself only runs on TPU (it A/Bs Mosaic kernels);
what must be correct REGARDLESS of hardware is the decision logic: accept
only on >1% win + parity pass, revert on reject/parity-fail/exception, skip
past the budget, and leave accepted flags SET (and everything else restored)
when it returns.  Scripted measure/parity functions exercise every branch.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def scripted(values):
    """measure() stub: returns (or raises) the next scripted value."""
    it = iter(values)

    def fn():
        v = next(it)
        if isinstance(v, Exception):
            raise v
        return v

    return fn


def flags(**kw):
    return types.SimpleNamespace(**kw)


def quiet(_msg):
    pass


def test_accepts_winner_and_keeps_it_set():
    t = flags(A=False, B=False)
    # baseline 10s; A wins its pair (8 vs control 10), REPRODUCES on the
    # confirmation pair (8 vs 10), parity ok; B loses its pair (8.5 vs
    # control 8.0).  A measured candidate consumes candidate+control, and a
    # would-accept consumes a second confirmation pair.
    accepted, base, best, recs = bench.greedy_tune(
        t,
        [("A", True), ("B", True)],
        scripted([10.0, 8.0, 10.0, 8.0, 10.0, 8.5, 8.0]),
        lambda: (True, {"argmax_match": 1.0}),
        budget_s=1e9,
        log=quiet,
    )
    assert accepted == {"A": True}
    assert (base, best) == (10.0, 8.0)
    assert t.A is True  # accepted flag stays live for the caller's re-trace
    assert t.B is False  # rejected flag restored
    assert [r["status"] for r in recs] == ["accepted", "rejected"]
    assert recs[0]["control_ms"] == 10000.0
    assert recs[1]["control_ms"] == 8000.0


def test_marginal_win_below_threshold_is_rejected():
    t = flags(A=False)
    # 9.95 vs its adjacent control 10.0 is <1% — must not accept.
    accepted, _, best, recs = bench.greedy_tune(
        t, [("A", True)], scripted([10.0, 9.95, 10.0]),
        lambda: (True, {}), budget_s=1e9, log=quiet,
    )
    assert accepted == {} and best == 10.0 and t.A is False
    assert recs[0]["status"] == "rejected"


def test_parity_failure_reverts_even_on_speed_win():
    t = flags(A=False)
    accepted, _, best, recs = bench.greedy_tune(
        t, [("A", True)], scripted([10.0, 5.0, 10.0, 5.0, 10.0]),
        lambda: (False, {"argmax_match": 0.5}), budget_s=1e9, log=quiet,
    )
    assert accepted == {} and best == 10.0 and t.A is False
    assert recs[0]["status"] == "parity-fail"
    assert recs[0]["parity"] == {"argmax_match": 0.5}


def test_candidate_exception_is_isolated_and_reverted():
    t = flags(A=False, B=False)
    # A's measure blows up (e.g. Mosaic compile failure); B still runs + wins.
    accepted, _, best, recs = bench.greedy_tune(
        t,
        [("A", True), ("B", True)],
        scripted([10.0, RuntimeError("mosaic"), 7.0, 10.0, 7.0, 10.0]),
        lambda: (True, {}),
        budget_s=1e9,
        log=quiet,
    )
    assert t.A is False and t.B is True
    assert accepted == {"B": True} and best == 7.0
    assert recs[0]["status"] == "fail" and "mosaic" in recs[0]["error"]


def test_budget_exhaustion_skips_remaining_candidates():
    t = flags(A=False, B=False)
    clock = iter([0.0, 100.0, 2000.0])  # start, A's check (in), B's (out)
    accepted, _, best, recs = bench.greedy_tune(
        t,
        [("A", True), ("B", True)],
        scripted([10.0, 9.0, 10.2, 9.0, 10.2]),
        lambda: (True, {}),
        budget_s=1000.0,
        now=lambda: next(clock),
        log=quiet,
    )
    assert accepted == {"A": True} and t.A is True
    assert recs[1] == {"flag": "B", "status": "skipped-budget"}
    assert t.B is False


def test_already_default_candidate_is_skipped_without_measuring():
    t = flags(A=True, B=False)  # A already live (e.g. TUNED.json flipped it)
    accepted, _, best, recs = bench.greedy_tune(
        t,
        [("A", True), ("B", True)],
        scripted([10.0, 7.0, 10.0, 7.0, 10.0]),  # baseline + B's pairs — A must not burn a compile
        lambda: (True, {}),
        budget_s=1e9,
        log=quiet,
    )
    assert recs[0] == {"flag": "A", "status": "already-default"}
    assert accepted == {"B": True} and best == 7.0


def test_baseline_failure_returns_empty_and_touches_nothing():
    t = flags(A=False)
    accepted, base, best, recs = bench.greedy_tune(
        t, [("A", True)], scripted([RuntimeError("dead chip")]),
        lambda: (True, {}), budget_s=1e9, log=quiet,
    )
    assert accepted == {} and base is None and best is None
    assert t.A is False
    assert recs[0]["status"] == "fail"


def test_control_measure_exception_is_isolated():
    t = flags(A=False)
    # Candidate measures fine but the adjacent control measure dies — the
    # candidate must be reverted and recorded as a failure.
    accepted, _, best, recs = bench.greedy_tune(
        t, [("A", True)], scripted([10.0, 8.0, RuntimeError("tunnel")]),
        lambda: (True, {}), budget_s=1e9, log=quiet,
    )
    assert accepted == {} and t.A is False
    assert recs[0]["status"] == "fail" and "tunnel" in recs[0]["error"]


def test_tune_candidates_exist_on_fused_module():
    """Every armed candidate must name a real fused.py flag (a rename would
    otherwise silently no-op the one unattended chip window)."""
    from resnetc_tpu.ops.pallas import fused

    for name, value in bench.TUNE_CANDIDATES:
        assert hasattr(fused, name), name
        default = getattr(fused, name)
        assert value != default, (
            f"candidate {name}={value} equals the default — dead A/B"
        )


def test_unconfirmed_win_is_rejected():
    """A transient weather spike on one side of the first pair fakes a win
    (measured: a 30 ms control vs ~23.4 everywhere else "accepted"
    STEM_CIN_PAD on 2026-08-19); the confirmation pair must catch it."""
    t = flags(A=False)
    accepted, _, best, recs = bench.greedy_tune(
        t, [("A", True)], scripted([10.0, 8.0, 10.0, 10.0, 10.0]),
        lambda: (True, {}), budget_s=1e9, log=quiet,
    )
    assert accepted == {} and t.A is False
    assert recs[0]["status"] == "rejected-unconfirmed"
    assert recs[0]["confirm_ms"] == 10000.0
    assert recs[0]["confirm_control_ms"] == 10000.0


def test_repeated_flag_hill_climbs_against_incumbent():
    """A flag listed with several trial values (HYBRID_XLA_STAGES (0,) then
    (0,1)) must judge each later value against the previously ACCEPTED one,
    not the pre-tune default — and a loss must restore the incumbent."""
    t = flags(A=())
    # baseline 10; (0,) wins (8 vs 10) + confirms (8 vs 10); (0,1) measures
    # 9 vs an incumbent control that must read the (0,)-config time (8) —
    # rejected, flag stays at (0,).
    accepted, base, best, recs = bench.greedy_tune(
        t,
        [("A", (0,)), ("A", (0, 1))],
        scripted([10.0, 8.0, 10.0, 8.0, 10.0, 9.0, 8.0]),
        lambda: (True, {"argmax_match": 1.0}),
        budget_s=1e9,
        log=quiet,
    )
    assert accepted == {"A": (0,)}
    assert t.A == (0,)  # incumbent survives the losing second value
    assert [r["status"] for r in recs] == ["accepted", "rejected"]
    assert recs[1]["control_ms"] == 8000.0  # control = incumbent, not ()


def test_repeated_flag_second_value_can_beat_first():
    """If the later trial value beats the incumbent too, it takes over."""
    t = flags(A=())
    accepted, _, best, recs = bench.greedy_tune(
        t,
        [("A", (0,)), ("A", (0, 1))],
        scripted([10.0, 8.0, 10.0, 8.0, 10.0, 6.0, 8.0, 6.0, 8.0]),
        lambda: (True, {"argmax_match": 1.0}),
        budget_s=1e9,
        log=quiet,
    )
    assert accepted == {"A": (0, 1)} and t.A == (0, 1) and best == 6.0


def test_greedy_tune_shadows_covered_candidates():
    """A candidate that only affects stages covered by an accepted
    HYBRID_XLA_STAGES prefix must be skipped (ADVICE r4 #2) — no measure
    calls burned, recorded as 'shadowed'."""
    import bench

    class T:
        HYBRID_XLA_STAGES = ()
        STAGE_FUSE_PROJ = False
        L1_PIXEL_PAIR = False

    t = T()
    times = iter([10.0, 8.0, 10.0, 8.0, 10.0])  # base, cand, ctrl, confirm...

    def measure():
        return next(times, 8.0)

    accepted, _, _, records = bench.greedy_tune(
        t,
        [("HYBRID_XLA_STAGES", (0,)), ("STAGE_FUSE_PROJ", True),
         ("L1_PIXEL_PAIR", True)],
        measure,
        lambda: (True, {"argmax_match": 1.0}),
        budget_s=60,
        log=lambda s: None,
    )
    assert accepted == {"HYBRID_XLA_STAGES": (0,)}
    by_flag = {r["flag"]: r for r in records}
    assert by_flag["STAGE_FUSE_PROJ"]["status"] == "shadowed"
    assert by_flag["L1_PIXEL_PAIR"]["status"] == "shadowed"
