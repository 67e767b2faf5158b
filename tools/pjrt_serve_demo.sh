#!/usr/bin/env bash
# End-to-end demo of the no-Python C++ PJRT serving binary.
#
# 1. export the model (Python, once, offline)
# 2. build the shim (C++, once)
# 3. serve (no Python in the process)
#
# Verified on the axon-tunneled v5e for BOTH backends: ResNet-50 bf16/xla
# compiles in ~24 s with logits matching the Python engine (argmax parity,
# |d|~0.03), and BACKEND=int8_chain exports the flagship Mosaic megakernel
# pipeline (tpu_custom_calls, ~31 MB bytecode) which compiles in ~16 s and
# matches the Python int8_chain engine EXACTLY (argmax 379, logit 68.9258
# on the smoke input, round-3 head-folded program).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/resnetc_export}
PLUGIN=${PLUGIN:-/opt/axon/libaxon_pjrt.so}
BACKEND=${BACKEND:-xla}

# 1. offline export: StableHLO + serialized CompileOptionsProto.
# xla exports from a CPU host; int8_chain needs the TPU lowering target
# (Mosaic custom calls), so it runs with the default (tpu) platform.
if [ "$BACKEND" = int8_chain ]; then
    python tools/export_stablehlo.py \
        --model resnet50 --batch 1 --backend int8_chain --out "$OUT"
else
    JAX_PLATFORMS=cpu python tools/export_stablehlo.py \
        --model resnet50 --batch 1 --out "$OUT"
fi

# demo input (replace with a real preprocessed image tensor)
python - "$OUT" <<'EOF'
import sys, numpy as np
np.random.default_rng(0).standard_normal((1, 224, 224, 3)).astype(
    np.float32).tofile(sys.argv[1] + "/input.f32")
EOF

# 2. build the shim
make -C resnetc_tpu/native pjrt

# 3. serve.  The --copt values mirror what the axon sitecustomize passes
# (for a direct-attached TPU use PLUGIN=libtpu.so with no --copt at all).
exec env AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
    TPU_SKIP_MDS_QUERY=true \
    ./resnetc_tpu/native/resnetc_pjrt_serve "$PLUGIN" \
    "$OUT/model.mlir" "$OUT/compile_options.pb" "$OUT/input.f32" \
    1 224 224 3 --loop 5 --latency 50 \
    --copt remote_compile=1 --copt local_only=0 --copt priority=0 \
    --copt topology=v5e:1x1x1 --copt n_slices=1 --copt rank=4294967295 \
    --copt session_id=resnetc-pjrt-serve-$$
