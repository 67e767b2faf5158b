"""Checkpoint format tests: the reference's raw-f32-per-param contract.

Verifies byte-level compatibility with save_weights.py's output (one
headerless little-endian float32 file per state_dict key) and the
torch <-> JAX layout conversions.
"""

import struct

import jax
import numpy as np
import pytest

from resnetc_tpu import checkpoint
from resnetc_tpu.models import resnet
from resnetc_tpu.verify.twin import build_twin


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = checkpoint.flatten_tree(tree)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert checkpoint.unflatten_tree(flat) == tree


def test_reference_format_roundtrip(tmp_path):
    cfg = resnet.get_config("resnet18", num_classes=13)
    variables = resnet.init(cfg, jax.random.key(0))
    n = checkpoint.save_reference_format(variables, tmp_path)
    assert n == len(checkpoint.flatten_tree(variables))
    loaded = checkpoint.load_reference_format(cfg, tmp_path)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), loaded, variables)
    )


def test_reference_format_bytes_match_save_weights_contract(tmp_path):
    """File bytes must equal struct.pack('<f') of the OIHW torch tensor —
    exactly what save_weights.py:9-12 writes."""
    cfg = resnet.get_config("resnet18", num_classes=4)
    twin = build_twin(cfg, seed=1)
    variables = checkpoint.variables_from_torch_state_dict(twin.state_dict())
    checkpoint.save_reference_format(variables, tmp_path)

    for key in ("conv1.weight", "bn1.weight", "layer1.0.conv2.weight", "fc.bias"):
        torch_tensor = twin.state_dict()[key]
        expected = b"".join(
            struct.pack("<f", v) for v in torch_tensor.flatten().tolist()
        )
        assert (tmp_path / key).read_bytes() == expected, key


def test_load_missing_file_raises(tmp_path):
    cfg = resnet.get_config("resnet18")
    with pytest.raises(FileNotFoundError):
        checkpoint.load_reference_format(cfg, tmp_path)


def test_load_wrong_size_raises(tmp_path):
    cfg = resnet.get_config("resnet18", num_classes=3)
    variables = resnet.init(cfg, jax.random.key(0))
    checkpoint.save_reference_format(variables, tmp_path)
    (tmp_path / "conv1.weight").write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        checkpoint.load_reference_format(cfg, tmp_path)


def test_torch_state_dict_roundtrip():
    cfg = resnet.get_config("resnet18", num_classes=7)
    twin = build_twin(cfg, seed=2)
    variables = checkpoint.variables_from_torch_state_dict(twin.state_dict())
    back = checkpoint.torch_state_dict_from_variables(variables)
    for key, t in twin.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[key].numpy(), t.numpy(), err_msg=key)


def test_conv_weight_layout_is_hwio():
    cfg = resnet.get_config("resnet18")
    shapes = checkpoint.param_shapes(cfg)
    assert shapes["conv1.weight"] == (7, 7, 3, 64)  # HWIO
    assert shapes["fc.weight"] == (1000, 512)  # torch [out, in]
    assert shapes["layer1.0.conv1.weight"] == (3, 3, 64, 64)


def test_orbax_train_state_roundtrip(tmp_path):
    state = {
        "step": np.int32(7),
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
    }
    checkpoint.save_train_state(tmp_path / "ckpt", state)
    like = jax.tree.map(lambda a: np.zeros_like(a), state)
    restored = checkpoint.load_train_state(tmp_path / "ckpt", like)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7


def test_variables_from_torch_file(tmp_path):
    """A torch-saved checkpoint (raw state_dict and wrapped) must import."""
    import torch

    from resnetc_tpu.checkpoint import variables_from_torch_file

    cfg = resnet.get_config("resnet18", num_classes=5)
    twin = build_twin(cfg, seed=4)
    raw = tmp_path / "raw.pth"
    torch.save(twin.state_dict(), raw)
    wrapped = tmp_path / "wrapped.pth"
    torch.save({"epoch": 3, "state_dict": twin.state_dict()}, wrapped)

    for path in (raw, wrapped):
        variables = variables_from_torch_file(path)
        np.testing.assert_array_equal(
            np.asarray(variables["conv1"]["weight"]),
            twin.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        )
