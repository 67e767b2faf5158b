"""Utility-layer tests: FLOPs, metrics, debug dumps, distributed helpers."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnetc_tpu.models import resnet
from resnetc_tpu.utils import debug, metrics
from resnetc_tpu.utils.flops import model_flops


def test_model_flops_known_values():
    # Standard figures: resnet50 ~4.09 GMACs, resnet152 ~11.5 GMACs @224².
    fl50 = model_flops(resnet.get_config("resnet50"))
    assert 8.0e9 < fl50 < 8.4e9, fl50
    fl152 = model_flops(resnet.get_config("resnet152"))
    assert 22.5e9 < fl152 < 23.5e9, fl152
    fl18 = model_flops(resnet.get_config("resnet18"))
    assert 3.5e9 < fl18 < 3.8e9, fl18
    # Scales superlinearly-downward with resolution.
    assert model_flops(resnet.get_config("resnet50"), 112) < fl50 / 3


def test_metrics_logger_json_lines():
    buf = io.StringIO()
    log = metrics.MetricsLogger(stream=buf, prefix="t")
    log.log({"step": 1, "loss": 0.5})
    rec = json.loads(buf.getvalue())
    assert rec == {"tag": "t", "step": 1, "loss": 0.5}


def test_timer():
    with metrics.timer() as t:
        sum(range(1000))
    assert t["seconds"] > 0


def test_dump_load_activation_roundtrip(tmp_path):
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    path = str(tmp_path / "act.bin")
    debug.dump_activation(jnp.asarray(x), path)  # NHWC in
    back = debug.load_activation(path, (2, 3, 4, 4))  # NCHW out
    np.testing.assert_array_equal(back, x.transpose(0, 3, 1, 2))
    with pytest.raises(ValueError):
        debug.load_activation(path, (2, 3, 4, 5))
    with pytest.raises(ValueError):
        debug.dump_activation(jnp.asarray(x), path, layout="NCWH")


def test_nan_debug_context():
    with debug.nan_debug():
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)) + 1
    assert not jax.config.jax_debug_nans


def test_global_batch_slice_single_process():
    from resnetc_tpu.parallel.distributed import global_batch_slice, is_multiprocess

    assert not is_multiprocess()
    start, size = global_batch_slice(64)
    assert (start, size) == (0, 64)


def test_profile_trace_writes_trace(tmp_path):
    """jax.profiler integration produces a trace directory (XProf/TensorBoard
    viewable) — the SURVEY §5 tracing subsystem."""
    import jax.numpy as jnp

    from resnetc_tpu.utils.metrics import annotate, profile_trace

    logdir = tmp_path / "trace"
    with profile_trace(str(logdir)):
        with annotate("test-region"):
            jnp.square(jnp.arange(128.0)).block_until_ready()
    produced = list(logdir.rglob("*"))
    assert produced, "no trace files written"


def test_profile_trace_disabled_is_noop(tmp_path):
    from resnetc_tpu.utils.metrics import profile_trace

    with profile_trace(str(tmp_path / "x"), enabled=False):
        pass
    assert not (tmp_path / "x").exists()


def test_chained_timing_harness():
    """The measurement harness must return positive marginal seconds and
    actually execute the step (side-effect-free check via output value)."""
    import jax.numpy as jnp

    from resnetc_tpu.utils.timing import chained_seconds_per_iter, fetch_seconds

    x = jnp.ones((256, 256), jnp.float32)

    def step(c):
        return c @ c * 1e-3

    sec = chained_seconds_per_iter(step, x, iters=8)
    assert sec > 0

    times = fetch_seconds(lambda a: a * 2.0, x, samples=3)
    assert len(times) == 3 and all(t > 0 for t in times)
