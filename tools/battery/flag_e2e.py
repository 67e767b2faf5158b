"""Flag-sweep e2e legs (formerly battery.sh heredocs — now committed,
compile-checked, and sharing one setup via _common):

  1. STEM_CIN_PAD sweep, resnet50 int8_chain (entry lever A/B)
  2. resnet18/34: xla_folded vs int8_chain with BASIC_DS_INT8 off/on
  3. resnet34 BASIC_RUN_FUSE_STAGES stage sweep
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _common import (  # noqa: E402
    ab, bench_batch, build_int8_chain, time_forward,
)
from _common import fused, resnet  # noqa: E402
from resnetc_tpu.utils.timing import chained_seconds_per_iter  # noqa: E402

x = bench_batch()

print("== stem cin-pad e2e (resnet50 int8_chain)", flush=True)
cfg, folded, qtree, scales = build_int8_chain("resnet50")
for pad in (0, 4, 8):
    ab(
        f"e2e int8_chain STEM_CIN_PAD={pad}", {"STEM_CIN_PAD": pad},
        lambda: time_forward(cfg, qtree, scales, x),
    )

print("== resnet18/34 e2e (BASIC_DS_INT8 A/B vs xla_folded)", flush=True)
for model in ("resnet18", "resnet34"):
    cfg, folded, qtree, scales = build_int8_chain(model)
    try:
        sec = chained_seconds_per_iter(
            lambda xx, c=cfg, f=folded: resnet.forward_folded(c, f, xx),
            x, iters=12,
        )
        print(
            f"{model} xla_folded: {sec * 1e3:.2f} ms "
            f"-> {x.shape[0] / sec:.0f} img/s",
            flush=True,
        )
    except Exception as e:
        print(f"{model} xla_folded: FAIL {type(e).__name__}: {e}", flush=True)
    for flag in (False, True):
        ab(
            f"{model} int8_chain ds_int8={flag}", {"BASIC_DS_INT8": flag},
            lambda c=cfg, q=qtree, s=scales: time_forward(c, q, s, x),
        )

print("== resnet34 BASIC_RUN_FUSE_STAGES sweep", flush=True)
cfg, folded, qtree, scales = build_int8_chain("resnet34")
for stages in ((0,), (0, 1, 2, 3)):
    ab(
        f"resnet34 BASIC_RUN_FUSE_STAGES={stages}",
        {"BASIC_RUN_FUSE_STAGES": stages},
        lambda: time_forward(cfg, qtree, scales, x),
    )
