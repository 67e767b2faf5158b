"""Model-family throughput table: xla vs int8_chain at b256/224, TUNED defaults.

The reference's model is ResNet-152 (main.cu:109-125); the framework serves
the whole torchvision family.  This records one healthy-window number per
(model, backend) so README/PERF family claims are measured, not extrapolated
from resnet50.  Honest harness (chained fori_loop + fetch), median over 3
two-point pairs per measure — the recorded-number standard on this tunnel.

Run under TUNED.json defaults (i.e. WITHOUT RESNETC_NO_TUNED): this measures
what the product ships, including BASIC_DS_INT8 for the basic family.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _common  # noqa: F401  (repo sys.path bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

from resnetc_tpu.models import resnet
from resnetc_tpu.serve import InferenceEngine, bench_throughput
from resnetc_tpu.tensor import BF16
from resnetc_tpu.utils.flops import model_flops

BATCH, SIZE = 256, 224
PEAK_BF16, PEAK_INT8 = 197e12, 394e12

rng = np.random.default_rng(0)
images = jnp.asarray(
    rng.standard_normal((BATCH, SIZE, SIZE, 3), dtype=np.float32), jnp.bfloat16
)

rows = []
for model in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
    cfg = resnet.get_config(model)
    variables = resnet.init(cfg, jax.random.key(0))
    flops = model_flops(cfg, SIZE)
    row = {"model": model, "gflops_per_image": round(flops / 1e9, 2)}
    for backend in ("xla", "int8_chain"):
        try:
            eng = InferenceEngine(
                cfg, variables, policy=BF16, backend=backend,
                calib_batch=images[:8],
            )
            tp = bench_throughput(eng, images, steps=16, repeats=3)
            ips = tp.images_per_sec
            peak = PEAK_INT8 if backend == "int8_chain" else PEAK_BF16
            row[backend] = {
                "images_per_sec": round(ips, 1),
                "ms_per_batch": round(BATCH / ips * 1e3, 3),
                "mxu_utilization": round(ips * flops / peak, 4),
            }
        except Exception as e:
            row[backend] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
    rows.append(row)
    # Persist incrementally: an unattended run must leave more than stdout,
    # and the chip window may close between models.
    import time as _time

    (Path(__file__).resolve().parents[2] / "FAMILY_BENCH.json").write_text(
        json.dumps({"batch": BATCH, "size": SIZE, "rows": rows,
                    "unix_time": int(_time.time())}, indent=1)
    )

print("FAMILY_BENCH " + json.dumps(rows), flush=True)
