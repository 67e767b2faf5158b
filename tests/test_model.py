"""Model-family tests: shapes, params/state split, BN folding, twin parity.

End-to-end parity vs the pure-torch twin is the framework's acceptance test
(the automated version of the reference's argmax comparison, main.cu:250 <->
pytorch_inference.py:172, and its allclose workflow, pytorch_inference.py:8-11).
Gates: fp32 logit MAE <= 1e-3 and 100% argmax agreement (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnetc_tpu.checkpoint import flatten_tree, variables_from_torch_state_dict
from resnetc_tpu.models import resnet
from resnetc_tpu.tensor import FP32, nchw_to_nhwc
from resnetc_tpu.verify.harness import LOGIT_MAE_GATE, logit_report
from resnetc_tpu.verify.twin import build_twin


def test_config_table_matches_reference_models():
    r152 = resnet.get_config("resnet152")
    assert r152.stage_blocks == (3, 8, 36, 3)  # main.cu:116-119
    assert r152.feature_dim == 2048
    assert resnet.get_config("resnet50").stage_blocks == (3, 4, 6, 3)
    assert resnet.get_config("resnet18").feature_dim == 512


def test_param_names_match_torch_twin_exactly():
    """Our pytree's flat keys must be exactly the twin's state_dict keys
    (minus num_batches_tracked) — the weight-file naming contract
    (save_weights.py:9-10 <-> main.cu:59-75)."""
    for name in ("resnet18", "resnet50"):
        cfg = resnet.get_config(name)
        ours = set(flatten_tree(jax.eval_shape(lambda c=cfg: resnet.init(c, jax.random.key(0)))))
        twin_keys = {
            k for k in build_twin(cfg).state_dict() if not k.endswith("num_batches_tracked")
        }
        assert ours == twin_keys, (ours ^ twin_keys)


def test_param_count_resnet152():
    cfg = resnet.get_config("resnet152")
    shapes = jax.eval_shape(lambda: resnet.init(cfg, jax.random.key(0)))
    params, _state = resnet.split_params_state(shapes)
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert n == 60_192_808  # torchvision resnet152 trainable params


def test_split_merge_roundtrip():
    cfg = resnet.get_config("resnet18", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(0))
    params, state = resnet.split_params_state(variables)
    # state holds only running stats
    for k in flatten_tree(state):
        assert k.endswith(("running_mean", "running_var"))
    for k in flatten_tree(params):
        assert not k.endswith(("running_mean", "running_var"))
    merged = resnet.merge_params_state(params, state)
    assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, variables))


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_forward_shapes_and_dtypes(name):
    cfg = resnet.get_config(name, num_classes=37)
    variables = resnet.init(cfg, jax.random.key(1))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    logits, new_state = jax.jit(
        lambda v, xx: resnet.forward(cfg, v, xx, train=False)
    )(variables, x)
    assert logits.shape == (2, 37)
    assert logits.dtype == jnp.float32
    assert new_state == {}


def test_forward_train_updates_all_bn_stats():
    cfg = resnet.get_config("resnet18", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (4, 32, 32, 3), jnp.float32)
    _, new_state = jax.jit(
        lambda v, xx: resnet.forward(cfg, v, xx, train=True)
    )(variables, x)
    _, old_state = resnet.split_params_state(variables)
    assert set(flatten_tree(new_state)) == set(flatten_tree(old_state))


@pytest.mark.parametrize(
    "name",
    ["resnet18", "resnet34", "resnet50", "resnet101", "wide_resnet50_2"],
)
def test_logit_parity_vs_torch_twin(name):
    """fp32 end-to-end parity on random weights + random input."""
    cfg = resnet.get_config(name)
    twin = build_twin(cfg, seed=3)
    # Randomise BN running stats so inference-mode BN is non-trivial.
    import torch

    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    x = np.random.default_rng(7).standard_normal((2, 3, 64, 64), dtype=np.float32)
    report = logit_report(cfg, twin, x, policy=FP32)
    assert report.argmax_match, (report.top1_ours, report.top1_ref)
    assert report.mae <= LOGIT_MAE_GATE, report


def test_folded_forward_matches_unfolded():
    cfg = resnet.get_config("resnet50", num_classes=100)
    variables = resnet.init(cfg, jax.random.key(5))
    x = jax.random.normal(jax.random.key(6), (2, 64, 64, 3), jnp.float32)
    ref, _ = jax.jit(lambda v, xx: resnet.forward(cfg, v, xx, train=False, policy=FP32))(
        variables, x
    )
    folded = resnet.fold_inference_params(cfg, variables)
    got = jax.jit(lambda f, xx: resnet.forward_folded(cfg, f, xx, policy=FP32))(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-4)


def test_nchw_nhwc_shims():
    x = np.arange(24).reshape(1, 2, 3, 4).astype(np.float32)
    back = np.asarray(
        jax.numpy.transpose(nchw_to_nhwc(jnp.asarray(x)), (0, 3, 1, 2))
    )
    np.testing.assert_array_equal(back, x)


def test_stage_parity_report():
    """Per-stage taps vs torch must all sit at fp32-noise level (the
    automated check_out workflow, pytorch_inference.py:8-11)."""
    from resnetc_tpu.verify import stage_parity_report

    cfg = resnet.get_config("resnet18", num_classes=10)
    twin = build_twin(cfg, seed=6)
    x = np.random.default_rng(11).standard_normal((1, 3, 32, 32), dtype=np.float32)
    report = stage_parity_report(cfg, twin, x)
    assert set(report) == {"stem", "layer1", "layer2", "layer3", "layer4", "logits"}
    for stage, stats in report.items():
        assert stats["mae"] < 1e-4, (stage, stats)


def test_wide_resnet50_2_param_count_and_int8_chain():
    """wide_resnet50_2: torchvision-exact parameter count (68.88M) and the
    int8_chain megakernel pipeline accepts the non-4x inner widths
    (c4 != 4c) end to end."""
    cfg = resnet.get_config("wide_resnet50_2", num_classes=11)
    full = resnet.get_config("wide_resnet50_2")
    params, _ = resnet.split_params_state(resnet.init(full, jax.random.key(0)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 68_883_240  # torchvision wide_resnet50_2 trainable params

    from resnetc_tpu.ops.pallas import fused

    variables = resnet.init(cfg, jax.random.key(2))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3), dtype=np.float32)
    )
    ref = np.asarray(resnet.forward_folded(cfg, folded, x), np.float32)
    s = fused.calibrate_chain_scales(cfg, folded, x, per_channel_interior=True)
    q, srt = fused.bake_interior_scales(cfg, folded, s)
    got = np.asarray(
        fused.fused_forward_int8_chain(cfg, q, srt, x, interpret=True),
        np.float32,
    )
    rel = np.mean(np.abs(got - ref)) / np.mean(np.abs(ref))
    assert rel < 0.05, rel
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_resnext50_32x4d_parity_and_backend_guard():
    """resnext50_32x4d: torchvision-exact params (25.03M), fp32 twin parity
    through the grouped 3x3 (train and folded paths), and the non-XLA
    serving backends must reject grouped configs with guidance."""
    full = resnet.get_config("resnext50_32x4d")
    params, _ = resnet.split_params_state(
        jax.eval_shape(lambda: resnet.init(full, jax.random.key(0)))
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 25_028_904  # torchvision resnext50_32x4d trainable params

    cfg = resnet.get_config("resnext50_32x4d", num_classes=11)
    twin = build_twin(cfg, seed=1)
    twin.eval()
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64), dtype=np.float32)
    report = logit_report(cfg, twin, x, policy=FP32)
    assert report.argmax_match and report.mae <= LOGIT_MAE_GATE, report

    from resnetc_tpu.serve import InferenceEngine

    with pytest.raises(ValueError, match="grouped"):
        InferenceEngine(
            cfg, resnet.init(cfg, jax.random.key(0)), backend="int8_chain"
        )


def test_resnext_train_step_runs_and_learns():
    """Grad flow through the grouped conv's mixed-dtype custom-vjp: two
    train steps must run and change the conv2 weights."""
    from resnetc_tpu import train

    cfg = resnet.get_config("resnext50_32x4d", num_classes=5)
    tcfg = train.TrainConfig(lr=0.1, policy_name="bf16")
    ts = train.init_train_state(cfg, jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    y = jnp.asarray(np.array([0, 1], np.int32))
    w0 = np.asarray(ts.params["layer1"]["0"]["conv2"]["weight"])
    for _ in range(2):
        ts, m = train.train_step(cfg, tcfg, ts, x, y, jnp.float32(0.1))
    assert np.isfinite(float(m["loss"]))
    w2 = np.asarray(ts.params["layer1"]["0"]["conv2"]["weight"])
    assert not np.array_equal(w0, w2), "grouped conv2 got no gradient"
