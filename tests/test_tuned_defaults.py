"""TUNED.json overlay: the battery's measured flag winners become defaults.

fused._apply_tuned_defaults() runs at import (disabled in this suite via
RESNETC_NO_TUNED — conftest pins code defaults); these tests call it
directly against temp files to pin the loader's contract: known flags with
exact-type values apply, everything else is ignored, and a malformed or
missing file is a silent no-op (serving must never break on a bad file).
"""

from __future__ import annotations

import json

import pytest

from resnetc_tpu.ops.pallas import fused


@pytest.fixture()
def restore_flags():
    saved = {k: getattr(fused, k) for k in fused._TUNABLE_FLAGS}
    yield
    for k, v in saved.items():
        setattr(fused, k, v)


def apply_from(tmp_path, monkeypatch, payload) -> dict:
    p = tmp_path / "TUNED.json"
    p.write_text(payload if isinstance(payload, str) else json.dumps(payload))
    monkeypatch.delenv("RESNETC_NO_TUNED", raising=False)
    monkeypatch.setenv("RESNETC_TUNED_JSON", str(p))
    return fused._apply_tuned_defaults()


def test_known_flags_apply(tmp_path, monkeypatch, restore_flags):
    applied = apply_from(
        tmp_path,
        monkeypatch,
        {"flags": {"STAGE_FUSE_PROJ": True, "STEM_CIN_PAD": 4}},
    )
    assert applied == {"STAGE_FUSE_PROJ": True, "STEM_CIN_PAD": 4}
    assert fused.STAGE_FUSE_PROJ is True
    assert fused.STEM_CIN_PAD == 4


def test_tuple_flags_coerce_from_json_lists(tmp_path, monkeypatch, restore_flags):
    applied = apply_from(tmp_path, monkeypatch, {"flags": {"RUN_FUSE_STAGES": [0, 1]}})
    assert applied == {"RUN_FUSE_STAGES": (0, 1)}
    assert fused.RUN_FUSE_STAGES == (0, 1)


def test_unknown_and_mistyped_keys_ignored(tmp_path, monkeypatch, restore_flags):
    applied = apply_from(
        tmp_path,
        monkeypatch,
        {"flags": {
            "NOT_A_FLAG": True,          # unknown name
            "STAGE_FUSE_PROJ": 1,        # int is not bool (exact-type rule)
            "STEM_CIN_PAD": True,        # bool is not int
            "DS_PAIR_DMA": True,         # valid — must still apply
        }},
    )
    assert applied == {"DS_PAIR_DMA": True}
    assert fused.STAGE_FUSE_PROJ is False
    assert fused.STEM_CIN_PAD == 0


def test_malformed_file_is_a_noop(tmp_path, monkeypatch, restore_flags):
    assert apply_from(tmp_path, monkeypatch, "{not json") == {}


@pytest.mark.parametrize(
    "payload",
    [
        "[1, 2, 3]",                      # valid JSON, not a dict
        '{"flags": [1, 2]}',              # flags not a dict
        '{"flags": "STAGE_FUSE_PROJ"}',   # flags a string
        "null",
        "3",
    ],
)
def test_valid_json_wrong_shape_is_a_noop(tmp_path, monkeypatch, restore_flags, payload):
    """The never-break-serving contract covers valid-but-wrong-shaped JSON,
    not just parse errors (r4s2 review: .items() on a list crashed import)."""
    assert apply_from(tmp_path, monkeypatch, payload) == {}


def test_tuple_flag_with_non_int_elements_rejected(tmp_path, monkeypatch, restore_flags):
    applied = apply_from(
        tmp_path, monkeypatch,
        {"flags": {"RUN_FUSE_STAGES": [[0]], "BASIC_RUN_FUSE_STAGES": ["a"]}},
    )
    assert applied == {}
    assert fused.RUN_FUSE_STAGES == (0,)


def test_missing_file_is_a_noop(tmp_path, monkeypatch, restore_flags):
    monkeypatch.delenv("RESNETC_NO_TUNED", raising=False)
    monkeypatch.setenv("RESNETC_TUNED_JSON", str(tmp_path / "absent.json"))
    assert fused._apply_tuned_defaults() == {}


def test_no_tuned_env_disables(tmp_path, monkeypatch, restore_flags):
    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({"flags": {"STAGE_FUSE_PROJ": True}}))
    monkeypatch.setenv("RESNETC_NO_TUNED", "1")
    monkeypatch.setenv("RESNETC_TUNED_JSON", str(p))
    assert fused._apply_tuned_defaults() == {}
    assert fused.STAGE_FUSE_PROJ is False


def test_suite_runs_on_code_defaults():
    """conftest must have pinned code defaults for the whole suite."""
    assert fused.TUNED_DEFAULTS == {}


def test_gemm_tile_table_loader(tmp_path, monkeypatch):
    """GEMM_TILES.json populates gemm._BEST_TILES at load; malformed rows
    and RESNETC_NO_TUNED=1 are ignored (the TUNED.json contract)."""
    from resnetc_tpu.ops.pallas import gemm

    good = {"tiles": [
        {"name": "fc", "shape": [256, 2048, 1000], "tiles": [256, 256, 512]},
        {"name": "bad", "shape": [1, 2, 3], "tiles": [0, 1, 1]},  # rejected
    ]}
    p = tmp_path / "tiles.json"
    p.write_text(__import__("json").dumps(good))

    monkeypatch.setenv("RESNETC_GEMM_TILES_JSON", str(p))
    monkeypatch.delenv("RESNETC_NO_TUNED", raising=False)
    table = {}
    monkeypatch.setattr(gemm, "_BEST_TILES", table)
    gemm._load_tile_table()
    assert table == {(256, 2048, 1000): (256, 256, 512)}

    # NO_TUNED pins the code default.
    monkeypatch.setenv("RESNETC_NO_TUNED", "1")
    table2 = {}
    monkeypatch.setattr(gemm, "_BEST_TILES", table2)
    gemm._load_tile_table()
    assert table2 == {}

    # Malformed file must never raise.
    p.write_text("{not json")
    monkeypatch.delenv("RESNETC_NO_TUNED")
    gemm._load_tile_table()
