"""Multi-device tests on the faked 8-device CPU mesh (SURVEY.md §4).

The reference has zero distributed surface; these tests cover the new one:
mesh construction, sharding rules, and — the BASELINE.json config #5
contract — that a data-parallel train step over 8 devices produces the same
numbers as the single-device step on the same global batch.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from resnetc_tpu import train
from resnetc_tpu.models import resnet
from resnetc_tpu.parallel import (
    batch_sharding,
    create_mesh,
    label_sharding,
    param_shardings,
)


def test_dp_int8_chain_matches_single_device(rng):
    """The flagship int8_chain backend served data-parallel over the mesh
    (explicit shard_map — Pallas custom calls are opaque to the SPMD
    partitioner) must produce the single-device logits exactly."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        fused_forward_int8_chain_sharded,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    mesh = create_mesh(n_data=8)
    got = np.asarray(
        fused_forward_int8_chain_sharded(cfg, qtree, scales, x, mesh, interpret=True),
        np.float32,
    )
    _assert_int8_serving_close(got, want)


def _assert_int8_serving_close(got, want):
    """DP and single-device int8 serving agree to int8 rounding noise: the
    XLA stem conv accumulates differently at per-shard batch, a 1-ulp bf16
    difference can flip one int8 round, and the flip cascades — exact
    equality is the wrong contract for a quantized pipeline."""
    rel_mae = np.mean(np.abs(got - want)) / np.mean(np.abs(want))
    assert rel_mae < 0.02, rel_mae
    agreement = float((got.argmax(-1) == want.argmax(-1)).mean())
    assert agreement >= 0.85, agreement


def test_dp_int8_chain_engine_roundtrip(rng):
    """InferenceEngine(backend=int8_chain, mesh=...) serves data-parallel:
    logits match the single-device engine built from the same variables and
    calibration batch."""
    from resnetc_tpu.serve import InferenceEngine

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))

    single = InferenceEngine(cfg, variables, backend="int8_chain", calib_batch=x)
    mesh = create_mesh(n_data=8)
    dp = InferenceEngine(
        cfg, variables, backend="int8_chain", calib_batch=x, mesh=mesh
    )
    _assert_int8_serving_close(
        np.asarray(dp.logits(x), np.float32),
        np.asarray(single.logits(x), np.float32),
    )


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8, (
        "tests must run under XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh42 = create_mesh(4, 2)
    assert mesh42.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(16, 1)
    with pytest.raises(ValueError):
        create_mesh(None, 3)  # 8 % 3 != 0


def test_param_sharding_rules():
    mesh = create_mesh(4, 2)
    tree = {
        "conv": {"weight": jnp.zeros((3, 3, 64, 128))},
        "stem": {"weight": jnp.zeros((7, 7, 3, 64))},
        "bn": {"weight": jnp.zeros((128,)), "running_mean": jnp.zeros((128,))},
        "odd": {"weight": jnp.zeros((7,))},  # 7 % 2 != 0 -> replicate
        "fc": {"weight": jnp.zeros((1000, 512)), "bias": jnp.zeros((1000,))},
    }
    sh = param_shardings(mesh, tree)
    assert sh["conv"]["weight"].spec == P(None, None, None, "model")
    assert sh["bn"]["weight"].spec == P("model")
    assert sh["odd"]["weight"].spec == P(None)
    assert sh["fc"]["weight"].spec == P("model", None)
    assert sh["fc"]["bias"].spec == P("model")


def test_batch_sharding_places_batch_over_data_axis():
    mesh = create_mesh()
    x = jnp.zeros((16, 8, 8, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert xs.sharding.spec == P("data")
    # Each device holds 1/8 of the batch.
    assert xs.addressable_shards[0].data.shape == (2, 8, 8, 3)


def test_dp_train_step_matches_single_device():
    """Gradient all-reduce correctness: 8-way DP == single-device on the
    same global batch (fp32, momentum+wd on, BN batch stats global)."""
    cfg = resnet.get_config("resnet18", num_classes=10)
    tcfg = train.TrainConfig(lr=0.1, momentum=0.9, weight_decay=1e-4, policy_name="fp32")

    ts0 = train.init_train_state(cfg, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3), jnp.float32)
    y = (jnp.arange(16) % 10).astype(jnp.int32)
    lr = jnp.float32(0.1)

    # Single device.
    ts_ref, m_ref = train.train_step(cfg, tcfg, ts0, x, y, lr)

    # 8-way DP.
    mesh = create_mesh()
    jitted, shard_state, _ = train.sharded_train_step(cfg, tcfg, mesh)
    ts_dp = shard_state(train.init_train_state(cfg, jax.random.key(0)))
    ts_dp, m_dp = jitted(ts_dp, x, y, lr)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_dp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-4
    )
    from resnetc_tpu.checkpoint import flatten_tree

    ref_flat = flatten_tree(ts_ref.params)
    dp_flat = flatten_tree(jax.device_get(ts_dp.params))
    for k in ref_flat:
        np.testing.assert_allclose(
            np.asarray(dp_flat[k]), np.asarray(ref_flat[k]),
            rtol=1e-4, atol=5e-6, err_msg=k,  # atol: all-reduce order noise
        )
    # BN running stats (global-batch statistics) must agree as well.
    ref_bn = flatten_tree(ts_ref.bn_state)
    dp_bn = flatten_tree(jax.device_get(ts_dp.bn_state))
    for k in ref_bn:
        np.testing.assert_allclose(
            np.asarray(dp_bn[k]), np.asarray(ref_bn[k]),
            rtol=1e-4, atol=5e-6, err_msg=k,
        )


def test_dp_inference_matches_single_device():
    """Sharded vs unsharded must be numerically equivalent; fp32 so the check
    is tight (bf16 reduction-order noise through 50 layers would swamp it)."""
    from resnetc_tpu.tensor import FP32

    cfg = resnet.get_config("resnet50", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3), jnp.float32)

    ref, _ = jax.jit(lambda v, xx: resnet.forward(cfg, v, xx, policy=FP32))(variables, x)

    mesh = create_mesh()
    vs = jax.device_put(variables, param_shardings(mesh, variables))
    xs = jax.device_put(x, batch_sharding(mesh))
    got, _ = jax.jit(lambda v, xx: resnet.forward(cfg, v, xx, policy=FP32))(vs, xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_host_local_to_global_assembles_sharded_batch():
    """Single-process case of the multi-host assembly path: the local array
    is the whole global batch; the wrapper must produce a 'data'-sharded
    global jax.Array with identical contents."""
    from resnetc_tpu.parallel.distributed import (
        global_batch_slice,
        host_local_to_global,
        is_multiprocess,
    )

    assert not is_multiprocess()
    start, size = global_batch_slice(16)
    assert (start, size) == (0, 16)  # one process owns the whole batch

    mesh = create_mesh()
    local = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    garr = host_local_to_global(local, mesh, P("data"))
    assert garr.shape == (16, 4)
    assert garr.sharding.spec == P("data")
    assert garr.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(garr), local)


def test_distributed_initialize_single_process(tmp_path):
    """`distributed.initialize` with explicit single-process args brings up
    the multi-process runtime (coordinator included) in a fresh interpreter:
    process_count/index report correctly and the mesh code runs unchanged.
    Subprocess-isolated because jax.distributed is once-per-process."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from resnetc_tpu.parallel.distributed import initialize, is_multiprocess
initialize(coordinator_address="localhost:12357", num_processes=1, process_id=0)
assert jax.process_count() == 1 and jax.process_index() == 0
assert not is_multiprocess()
from resnetc_tpu.parallel import create_mesh
mesh = create_mesh()
assert mesh.devices.size == len(jax.devices())
print("distributed-init-ok")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "distributed-init-ok" in proc.stdout


def test_sync_bn_axis_name_matches_global_batch_oracle():
    """Explicit sync-BN (axis_name=) must equal single-device BN on the
    concatenated global batch — including the variance.  Per-device means are
    deliberately far apart so combining per-device *variances* instead of raw
    moments (the round-1 bug) would drop the large between-device term."""
    from resnetc_tpu.ops.lax_ops import batch_norm_train

    rng = np.random.default_rng(7)
    # (devices, per-device batch, H, W, C) with a big per-device mean offset.
    x = rng.standard_normal((8, 4, 6, 6, 16)).astype(np.float32)
    x += np.arange(8, dtype=np.float32)[:, None, None, None, None] * 5.0
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    r_mean = np.zeros(16, np.float32)
    r_var = np.ones(16, np.float32)

    out, nm, nv = jax.pmap(
        lambda xs: batch_norm_train(xs, scale, bias, r_mean, r_var, axis_name="b"),
        axis_name="b",
    )(x)

    ref_out, ref_nm, ref_nv = batch_norm_train(
        jnp.asarray(x.reshape(-1, 6, 6, 16)), scale, bias, r_mean, r_var
    )
    np.testing.assert_allclose(np.asarray(nm[0]), np.asarray(ref_nm), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nv[0]), np.asarray(ref_nv), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, 6, 6, 16), np.asarray(ref_out),
        rtol=2e-3, atol=2e-3,  # normalized output is O(1); fp32 moment noise
    )


def test_tp_forward_matches_replicated():
    """Channel TP (model axis) must be numerics-preserving: XLA inserts the
    collectives, results match the replicated run."""
    cfg = resnet.get_config("resnet18", num_classes=8)
    variables = resnet.init(cfg, jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3), jnp.float32)
    from resnetc_tpu.tensor import FP32

    ref, _ = jax.jit(lambda v, xx: resnet.forward(cfg, v, xx, policy=FP32))(variables, x)

    mesh = create_mesh(2, 4)
    vs = jax.device_put(variables, param_shardings(mesh, variables))
    xs = jax.device_put(x, batch_sharding(mesh))
    got, _ = jax.jit(lambda v, xx: resnet.forward(cfg, v, xx, policy=FP32))(vs, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_dp_int8_chain_basic_matches_single_device(rng):
    """The basic-family (ResNet-18) int8_chain path under the DP shard_map
    == single device, same contract as the bottleneck test."""
    from resnetc_tpu.ops.pallas.fused import (
        calibrate_chain_scales,
        fused_forward_int8_chain,
        fused_forward_int8_chain_sharded,
        quantize_chain,
    )

    cfg = resnet.get_config("resnet18", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(6))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))
    scales = calibrate_chain_scales(cfg, folded, x)
    qtree = quantize_chain(cfg, folded)

    want = np.asarray(
        fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    mesh = create_mesh(n_data=8)
    got = np.asarray(
        fused_forward_int8_chain_sharded(cfg, qtree, scales, x, mesh, interpret=True),
        np.float32,
    )
    _assert_int8_serving_close(got, want)


def test_dp_int8_chain_pixel_pair_matches_single_device(rng, monkeypatch):
    """DP serving under L1_PIXEL_PAIR: the pp kernels run inside the
    shard_map per-shard (batch-dim pairing is shard-local), so a TUNED.json
    flip of the flag must not break the data-parallel path."""
    from resnetc_tpu.ops.pallas import fused

    cfg = resnet.get_config("resnet50", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(3))
    folded = resnet.fold_inference_params(cfg, variables)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3), dtype=np.float32))
    scales = fused.calibrate_chain_scales(cfg, folded, x)
    qtree = fused.quantize_chain(cfg, folded)

    monkeypatch.setattr(fused, "L1_PIXEL_PAIR", True)
    want = np.asarray(
        fused.fused_forward_int8_chain(cfg, qtree, scales, x, interpret=True),
        np.float32,
    )
    mesh = create_mesh(n_data=8)
    got = np.asarray(
        fused.fused_forward_int8_chain_sharded(
            cfg, qtree, scales, x, mesh, interpret=True
        ),
        np.float32,
    )
    _assert_int8_serving_close(got, want)
