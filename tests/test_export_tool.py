"""tools/export_stablehlo.py — all three weight branches, on CPU.

Guards the tool against API drift (round-2 verdict: the ``.pth`` branch
called a function that did not exist).  Each branch must produce a loadable
artifact trio (model.mlir bytecode + compile_options.pb + meta.json).
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import export_stablehlo  # noqa: E402


def _run(tmp_path, extra):
    out = tmp_path / "export"
    argv = [
        "export_stablehlo.py", "--model", "resnet18",
        "--batch", "1", "--image-size", "32", "--out", str(out),
    ] + extra
    old = sys.argv
    sys.argv = argv
    try:
        assert export_stablehlo.main() == 0
    finally:
        sys.argv = old
    assert (out / "model.mlir").stat().st_size > 0
    assert (out / "compile_options.pb").stat().st_size > 0
    meta = json.loads((out / "meta.json").read_text())
    assert meta["input"] == [1, 32, 32, 3]
    return meta


def test_export_random_init(tmp_path):
    _run(tmp_path, [])


def test_export_torch_pth(tmp_path):
    import torch

    from resnetc_tpu import checkpoint
    from resnetc_tpu.models import resnet
    from resnetc_tpu.verify.twin import build_twin

    cfg = resnet.get_config("resnet18")
    twin = build_twin(cfg, seed=0)
    pth = tmp_path / "weights.pth"
    torch.save(twin.state_dict(), pth)
    meta = _run(tmp_path, ["--weights", str(pth)])
    assert meta["weights"].endswith("weights.pth")
    # sanity: the loader actually parses this file
    checkpoint.variables_from_torch_file(pth)


def test_export_reference_dir(tmp_path):
    import jax

    from resnetc_tpu import checkpoint
    from resnetc_tpu.models import resnet

    cfg = resnet.get_config("resnet18")
    variables = resnet.init(cfg, jax.random.key(0))
    wdir = tmp_path / "weights_bin"
    checkpoint.save_reference_format(variables, wdir)
    _run(tmp_path, ["--weights", str(wdir)])


def test_export_int8_chain_requires_tpu(tmp_path):
    """The megakernel export needs Mosaic lowering (TPU target); on CPU the
    tool must refuse with a clear error, not crash deep in the stack."""
    if not hasattr(export_stablehlo, "BACKENDS"):
        pytest.skip("exporter not yet multi-backend")
    out = tmp_path / "export"
    argv = ["export_stablehlo.py", "--model", "resnet50",
            "--backend", "int8_chain", "--out", str(out)]
    old = sys.argv
    sys.argv = argv
    try:
        rc = export_stablehlo.main()
    except SystemExit as e:  # argparse or tool-level error path
        rc = e.code
    finally:
        sys.argv = old
    assert rc != 0
