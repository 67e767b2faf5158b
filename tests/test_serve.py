"""Serving-layer tests: engine behavior, benches, CLI config parsing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnetc_tpu.config import add_run_args, run_config_from_args
from resnetc_tpu.models import resnet
from resnetc_tpu.serve import InferenceEngine, bench_latency, bench_throughput, classify_files
from resnetc_tpu.tensor import FP32


@pytest.fixture(scope="module")
def engine():
    cfg = resnet.get_config("resnet18", num_classes=8)
    return cfg, InferenceEngine(cfg, resnet.init(cfg, jax.random.key(0)), policy=FP32)


def test_engine_classify_shapes(engine, rng):
    _, eng = engine
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3), dtype=np.float32))
    out = eng.classify(x)
    assert out.shape == (3,)
    assert out.dtype == np.int32 or out.dtype == np.int64
    assert (out < 8).all()


def test_engine_rejects_bad_layout(engine):
    _, eng = engine
    with pytest.raises(ValueError, match="NHWC"):
        eng.classify(jnp.zeros((1, 3, 32, 32)))
    with pytest.raises(ValueError):
        InferenceEngine(engine[0], {}, backend="onnx")


def test_engine_compile_caches(engine):
    _, eng = engine
    f1 = eng.compile(2, 32, 32)
    f2 = eng.compile(2, 32, 32)
    assert f1 is f2
    f3 = eng.compile(4, 32, 32)
    assert f3 is not f1


def test_bench_functions_run_on_cpu(engine, rng):
    """Smoke: the benches execute and return sane structures (numbers are
    meaningless on CPU)."""
    _, eng = engine
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    tp = bench_throughput(eng, x, steps=8)
    assert tp.images_per_sec > 0 and tp.batch_size == 2
    lat = bench_latency(eng, x[0], samples=3)
    assert lat.p99_ms >= lat.p50_ms > 0


def test_classify_files_mixed_bin_and_image(engine, tmp_path, rng):
    from resnetc_tpu.data.preprocess import preprocess_file, save_input_bin

    fix = "/root/reference/test_imgs/ILSVRC2012_val_00004749.jpeg"
    x = preprocess_file(fix, crop=64)
    save_input_bin(x, tmp_path / "img.bin")
    _, eng = engine
    out = classify_files(eng, [str(tmp_path / "img.bin"), fix], image_size=64)
    assert out[0] == out[1]


def test_cli_config_roundtrip():
    import argparse

    p = argparse.ArgumentParser()
    add_run_args(p)
    args = p.parse_args(
        ["--model", "resnet152", "--batch-size", "32", "--policy", "fp32",
         "--backend", "int8", "--data-dim", "4", "--model-dim", "2"]
    )
    run = run_config_from_args(args)
    assert run.model == "resnet152" and run.batch_size == 32
    assert run.policy == "fp32" and run.backend == "int8"
    assert (run.data_dim, run.model_dim) == (4, 2)

    with pytest.raises(SystemExit):
        p.parse_args(["--model", "vgg16"])
    with pytest.raises(SystemExit):
        p.parse_args(["--backend", "tensorrt"])


def test_multihost_flags_rejected_outside_train():
    """--multihost on serving subcommands must fail fast (only train
    implements the multi-host data path; silently ignoring the flags
    yields non-distributed runs that look distributed)."""
    import argparse

    from resnetc_tpu.__main__ import _build_engine
    from resnetc_tpu.config import add_run_args, run_config_from_args

    p = argparse.ArgumentParser()
    add_run_args(p)
    run = run_config_from_args(
        p.parse_args(["--model", "resnet18", "--multihost"])
    )
    with pytest.raises(SystemExit, match="train"):
        _build_engine(run)


def test_engine_int8_chain_per_channel_optin_bake(rng):
    """Default calibration is per-tensor absmax (the on-chip A/B winner on
    a held-out real-fixture mix — tools/battery/calib_ab.py): interior
    z1/z2 scales are real (non-1.0) scalars.  Opting in to per-channel
    bakes the vectors into host constants, leaving 1.0 runtime scalars,
    and the engine must still classify (logits finite)."""
    cfg = resnet.get_config("resnet18", num_classes=11)
    variables = resnet.init(cfg, jax.random.key(0))
    calib = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    eng_pt = InferenceEngine(
        cfg, variables, backend="int8_chain", calib_batch=calib,
    )
    assert float(eng_pt._chain_scales["layer1"]["0"]["z1"]) != 1.0
    # Opt-in: the bake runs and zeroes out the runtime interior scales.
    eng = InferenceEngine(
        cfg, variables, backend="int8_chain", calib_batch=calib,
        calib_per_channel=True,
    )
    st = eng._chain_scales["layer1"]["0"]
    assert st["z1"].shape == () and float(st["z1"]) == 1.0
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    logits = np.asarray(eng._fn()(eng.folded, x), np.float32)
    assert logits.shape == (2, 11) and np.isfinite(logits).all()
