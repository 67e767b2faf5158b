#!/bin/bash
# Round-4 TPU battery (canonical copy: /root/repo/tools/battery/battery.sh): runs unattended the moment the chip is back.
# Order: most-important artifacts first in case the machine flakes mid-run.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
log() { echo "=== $1 ($(date)) ==="; }
log "health"
timeout 1200 python /root/repo/tools/battery/health.py
log "A/B whole-stage L1 + bt sweep"
timeout 4800 python /root/repo/tools/battery/ab_stage.py
log "on-chip Mosaic parity gate"
timeout 5400 python tools/verify_tpu.py
log "official bench (safe default flags)"
timeout 5400 python bench.py | tee /tmp/bench_r4.json
log "stem cin-pad + precision experiments"
timeout 2400 python /root/repo/tools/battery/stem_pad.py
log "stem cin-pad e2e A/B (resnet50 int8_chain)"
timeout 2400 python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import fused
from resnetc_tpu.utils.timing import chained_seconds_per_iter

cfg = resnet.get_config("resnet50")
variables = resnet.init(cfg, jax.random.key(0))
folded = resnet.fold_inference_params(cfg, variables)
calib = jnp.asarray(np.random.default_rng(1).standard_normal((8,224,224,3), dtype=np.float32))
scales = fused.calibrate_chain_scales(cfg, folded, calib)
qtree = fused.quantize_chain(cfg, folded)
x = jnp.asarray(np.random.default_rng(0).standard_normal((256,224,224,3), dtype=np.float32), jnp.bfloat16)
for pad in (0, 4, 8):
    try:
        fused.STEM_CIN_PAD = pad
        sec = chained_seconds_per_iter(lambda xx: fused.fused_forward_int8_chain(cfg, qtree, scales, xx), x, iters=12)
        print(f"e2e int8_chain STEM_CIN_PAD={pad}: {sec*1e3:.2f} ms -> {256/sec:.0f} img/s", flush=True)
    except Exception as e:
        print(f"e2e STEM_CIN_PAD={pad}: FAIL {type(e).__name__}: {e}", flush=True)
    finally:
        fused.STEM_CIN_PAD = 0
PYEOF
log "resnet18/34 int8_chain e2e"
timeout 4800 python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import fused
from resnetc_tpu.utils.timing import chained_seconds_per_iter

calib_np = np.random.default_rng(1).standard_normal((8,224,224,3), dtype=np.float32)
x = jnp.asarray(np.random.default_rng(0).standard_normal((256,224,224,3), dtype=np.float32), jnp.bfloat16)
for model in ("resnet18", "resnet34"):
    cfg = resnet.get_config(model)
    variables = resnet.init(cfg, jax.random.key(0))
    folded = resnet.fold_inference_params(cfg, variables)
    scales = fused.calibrate_chain_scales(cfg, folded, jnp.asarray(calib_np))
    qtree = fused.quantize_chain(cfg, folded)
    runs = [("xla_folded", None, lambda xx, c=cfg, f=folded: resnet.forward_folded(c, f, xx))]
    for flag in (False, True):
        runs.append((f"int8_chain ds_int8={flag}", flag,
                     lambda xx, c=cfg, q=qtree, s=scales: fused.fused_forward_int8_chain(c, q, s, xx)))
    for name, flag, fn in runs:
        try:
            if flag is not None:
                fused.BASIC_DS_INT8 = flag
            sec = chained_seconds_per_iter(fn, x, iters=12)
            print(f"{model} {name}: {sec*1e3:.2f} ms/batch -> {256/sec:.0f} img/s", flush=True)
        except Exception as e:
            print(f"{model} {name}: FAIL {type(e).__name__}: {e}", flush=True)
        finally:
            fused.BASIC_DS_INT8 = False
PYEOF
log "basic run-fuse stage sweep (resnet34)"
timeout 2400 python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from resnetc_tpu.models import resnet
from resnetc_tpu.ops.pallas import fused
from resnetc_tpu.utils.timing import chained_seconds_per_iter

cfg = resnet.get_config("resnet34")
variables = resnet.init(cfg, jax.random.key(0))
folded = resnet.fold_inference_params(cfg, variables)
calib = jnp.asarray(np.random.default_rng(1).standard_normal((8,224,224,3), dtype=np.float32))
scales = fused.calibrate_chain_scales(cfg, folded, calib)
qtree = fused.quantize_chain(cfg, folded)
x = jnp.asarray(np.random.default_rng(0).standard_normal((256,224,224,3), dtype=np.float32), jnp.bfloat16)
for stages in ((0,), (0,1,2,3)):
    try:
        fused.BASIC_RUN_FUSE_STAGES = stages
        sec = chained_seconds_per_iter(lambda xx: fused.fused_forward_int8_chain(cfg, qtree, scales, xx), x, iters=12)
        print(f"resnet34 BASIC_RUN_FUSE_STAGES={stages}: {sec*1e3:.2f} ms -> {256/sec:.0f} img/s", flush=True)
    except Exception as e:
        print(f"resnet34 stages={stages}: FAIL {type(e).__name__}: {e}", flush=True)
    finally:
        fused.BASIC_RUN_FUSE_STAGES = (0,)
PYEOF
log "ds-kernel phase attribution"
timeout 4800 python tools/probe_ds_phases.py --shape all
log "ds gather DMA pattern A/B"
timeout 3600 python tools/probe_ds_dma.py
log "ds pair_dma kernel A/B (isolated + e2e)"
timeout 4800 python /root/repo/tools/battery/ds_pair_ab.py
log "train batch-size sweep"
timeout 2400 python tools/profile_train.py --batch 384 --iters 6
timeout 2400 python tools/profile_train.py --batch 512 --iters 6
log "train backward attribution"
timeout 3600 python tools/probe_train_bwd.py
log "gemm autotune"
timeout 5400 python tools/autotune_gemm.py
log "ds conv3-onedot kernel A/B (isolated 2x2 + e2e)"
timeout 4800 python /root/repo/tools/battery/ds_onedot_ab.py
log "int8 calibration A/B (absmax vs percentile, real-fixture mix)"
timeout 3600 python /root/repo/tools/battery/calib_ab.py
log "battery ALL done"
