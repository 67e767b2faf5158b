"""Every tool / battery leg must at least byte-compile.

The measurement battery (tools/battery/battery.sh) runs UNATTENDED the
moment the TPU tunnel returns; a stale import or syntax error in any leg
would silently burn the one chip window.  Full execution needs the chip —
but parse errors are catchable here, on CPU, for free.  (Import-time
side effects make importlib too heavy: most legs build models at module
scope by design, so this checks compilation, not import.)
"""

from __future__ import annotations

import py_compile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SCRIPTS = sorted(
    p
    for d in ("tools", "tools/battery")
    for p in (REPO / d).glob("*.py")
)


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO)))
def test_tool_compiles(path, tmp_path):
    py_compile.compile(str(path), cfile=str(tmp_path / "out.pyc"), doraise=True)


@pytest.mark.parametrize("script", ["battery.sh", "battery2.sh"])
def test_battery_script_legs_exist(script):
    """Every .py file a battery script invokes must exist at the stated path."""
    sh = (REPO / "tools/battery" / script).read_text()
    missing = []
    for tok in sh.split():
        tok = tok.strip("()'\",;:")
        if tok.endswith(".py"):
            p = Path(tok)
            if not p.is_absolute():
                p = REPO / tok
            if not p.exists():
                missing.append(tok)
    assert not missing, f"{script} references missing scripts: {missing}"
