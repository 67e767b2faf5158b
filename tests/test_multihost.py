"""True multi-process (multi-"host") end-to-end test on CPU.

Two OS processes join one JAX distributed runtime (gloo CPU collectives),
each contributing 2 virtual devices to a global 4-device 'data' mesh, and
run the real CLI train path: per-process data slices -> global sharded
batch -> sharded_train_step with the XLA-inserted cross-process gradient
all-reduce.  This is the same entry path a v5e pod uses (where
``initialize()`` auto-detects and collectives ride ICI) — README
"Multi-host".  Reference capability: none (single GPU, SURVEY §2);
BASELINE.json config #5 is the target this covers.
"""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid, port = int(sys.argv[1]), sys.argv[2]
from resnetc_tpu.__main__ import main
rc = main([
    "train", "--model", "resnet18", "--image-size", "32",
    "--batch-size", "8", "--steps", "3", "--num-classes", "10",
    "--data-dim", "4", "--log-every", "3",
    "--multihost", "--coordinator", f"127.0.0.1:{port}",
    "--num-processes", "2", "--process-id", str(pid),
])
assert jax.process_count() == 2, jax.process_count()
print(f"WORKER-OK {pid} rc={rc}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_cli_end_to_end():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
            assert f"WORKER-OK {i} rc=0" in out, out[-3000:]
    finally:
        # If one worker fails or times out, its peer blocks forever in
        # distributed-init/collectives — never leak it past the test.
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    # Both processes ran the same global step stream: the logged loss at
    # the final step must agree exactly (same global batch, same psum).
    import json

    losses = []
    for out in outs:
        metric_lines = [
            json.loads(ln) for ln in out.splitlines()
            if ln.startswith('{"tag": "train"')
        ]
        assert metric_lines, out[-3000:]
        losses.append(metric_lines[-1]["loss"])
    assert losses[0] == losses[1], losses
