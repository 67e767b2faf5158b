"""The reference's acceptance test, gated on real weights being present.

The reference's correctness bar is: fixture image + torchvision
``IMAGENET1K_V1`` weights -> same argmax class as PyTorch
(/root/reference/cuda/inference/main.cu:250 <->
/root/reference/pytorch_inference.py:172).  torchvision is not installed on
this image and no pretrained checkpoint ships with the repo, so this test
SKIPS unless real weights are found — the moment a checkpoint exists the
gate runs with no code changes.

Weight discovery (first hit wins):

1. ``$RESNETC_WEIGHTS`` — a reference-format ``weights_bin/`` directory
   (raw headerless little-endian f32 per parameter, named by state_dict
   key — save_weights.py:8-12) or a torch ``.pth``/``.pt`` checkpoint.
2. ``<repo>/weights_bin/`` (the reference's default export location).
3. ``<repo>/weights/*.pth``.

ImageNet-val eval recipe (once weights + the val set exist)::

    python -m resnetc_tpu eval --model resnet152 \
        --weights-dir weights_bin /path/to/imagenet/val

(see also ``resnetc_tpu.data.imagefolder.evaluate`` — top-1/top-5 over an
ImageFolder tree).

Mitigation attempts, recorded (round 4, 2026-08-19): the build image has no
torchvision module, no ``~/.cache/torch`` hub cache, no ``*.pth`` anywhere on
the filesystem, and zero network egress (DNS resolution itself fails for
``download.pytorch.org``) — so the IMAGENET1K_V1 checkpoint cannot be
obtained from inside this environment.  The export path for a torch-capable
host is fully built and tested: run the reference's own ``save_weights.py``
(or ``checkpoint.save_reference_format`` on a loaded twin — byte-contract
pinned by ``test_reference_format_bytes_match_save_weights_contract``), copy
``weights_bin/`` here, and this gate runs un-skipped with no code changes.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
FIXTURE = "/root/reference/test_imgs/ILSVRC2012_val_00004749.jpeg"


def _find_weights() -> Path | None:
    env = os.environ.get("RESNETC_WEIGHTS")
    if env:
        p = Path(env)
        if p.exists():
            return p
    wb = REPO / "weights_bin"
    if wb.is_dir() and any(wb.iterdir()):
        return wb
    wdir = REPO / "weights"
    if wdir.is_dir():
        for pth in sorted(wdir.glob("*.pt*")):
            return pth
    return None


WEIGHTS = _find_weights()

pytestmark = pytest.mark.skipif(
    WEIGHTS is None,
    reason="real weights not present — set RESNETC_WEIGHTS to a weights_bin/ "
    "dir or a .pth checkpoint to run the reference acceptance gate",
)


def _infer_config(flat_keys: set[str]):
    """Pick the model variant from the checkpoint's own key schema: blocks
    per stage from the max block index, basic-vs-bottleneck from conv3."""
    from resnetc_tpu.models.resnet import RESNET_CONFIGS

    blocks = tuple(
        1
        + max(
            int(k.split(".")[1])
            for k in flat_keys
            if k.startswith(f"layer{stage}.")
        )
        for stage in range(1, 5)
    )
    bottleneck = any(".conv3." in k for k in flat_keys)
    for cfg in RESNET_CONFIGS.values():
        if cfg.stage_blocks == blocks and (cfg.block == "bottleneck") == bottleneck:
            return cfg
    raise ValueError(f"no known variant with stage blocks {blocks}")


def _load_variables():
    from resnetc_tpu import checkpoint
    from resnetc_tpu.models.resnet import get_config

    if WEIGHTS.is_dir():
        names = {p.name for p in WEIGHTS.iterdir()}
        cfg = _infer_config(names)
        return cfg, checkpoint.load_reference_format(cfg, WEIGHTS)
    variables = checkpoint.variables_from_torch_file(WEIGHTS)
    flat = checkpoint.flatten_tree(variables)
    return _infer_config(set(flat)), variables


def test_fixture_argmax_matches_twin_with_real_weights():
    """Executed-path acceptance: the fixture JPEG classifies to the same
    argmax as the PyTorch twin carrying the same weights, logits MAE <=1e-3
    (fp32 — the reference's own numerics, tensor.cuh:247)."""
    import jax
    import jax.numpy as jnp
    import torch

    from resnetc_tpu import checkpoint
    from resnetc_tpu.data.preprocess import preprocess_file
    from resnetc_tpu.models import resnet
    from resnetc_tpu.tensor import FP32
    from resnetc_tpu.verify import compare_logits
    from resnetc_tpu.verify.twin import build_twin

    cfg, variables = _load_variables()

    x = preprocess_file(FIXTURE)  # (1, 224, 224, 3) NHWC f32
    logits, _ = jax.jit(
        lambda v, xx: resnet.forward(cfg, v, xx, policy=FP32)
    )(variables, jnp.asarray(x))

    twin = build_twin(cfg)
    twin.load_state_dict(checkpoint.torch_state_dict_from_variables(variables))
    twin.eval()
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    rep = compare_logits(np.asarray(logits), ref)
    assert rep.argmax_match, rep
    assert rep.mae <= 1e-3, rep


def test_serving_engine_classify_with_real_weights():
    """Same gate through the serving path the user actually calls
    (InferenceEngine folds BN — main.cu's whole pipeline in one call)."""
    import torch

    from resnetc_tpu import checkpoint
    from resnetc_tpu.data.preprocess import preprocess_file
    from resnetc_tpu.serve import InferenceEngine
    from resnetc_tpu.tensor import FP32
    from resnetc_tpu.verify.twin import build_twin

    cfg, variables = _load_variables()
    engine = InferenceEngine(cfg, variables, policy=FP32)
    x = preprocess_file(FIXTURE)
    got = int(engine.classify(x)[0])

    twin = build_twin(cfg)
    twin.load_state_dict(checkpoint.torch_state_dict_from_variables(variables))
    twin.eval()
    with torch.no_grad():
        want = int(twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).argmax(1)[0])
    assert got == want


def test_int8_chain_top1_budget_with_real_weights():
    """Int8 accuracy budget on REAL weights: the int8_chain megakernel
    engine, calibrated on real preprocessed images, must agree with the
    fp32 twin's top-1 on >= 99.5% of the fixture-derived eval batch
    (top-1 drop <= 0.5%, BASELINE config #5's int8 variant bar).

    The eval batch is augmentations of the fixture image (crops/flips/
    brightness) — ImageNet-val is not on this image, so this is the closest
    realistic input distribution available; the batch is also the
    calibration batch (standard PTQ practice: calibrate on held-in data).
    """
    import jax.numpy as jnp
    import torch

    from resnetc_tpu import checkpoint
    from resnetc_tpu.data.preprocess import preprocess_file
    from resnetc_tpu.serve import InferenceEngine
    from resnetc_tpu.verify.twin import build_twin

    cfg, variables = _load_variables()
    if cfg.block != "bottleneck":
        pytest.skip("int8_chain pipeline covers bottleneck variants")

    x = preprocess_file(FIXTURE)[0]  # (224, 224, 3)
    rng = np.random.default_rng(0)
    batch = []
    for _ in range(64):
        img = x
        if rng.random() < 0.5:
            img = img[:, ::-1]
        img = img * rng.uniform(0.9, 1.1) + rng.normal(0, 0.02)
        batch.append(img.astype(np.float32))
    batch = np.stack(batch)

    engine = InferenceEngine(
        cfg, variables, backend="int8_chain", calib_batch=jnp.asarray(batch)
    )
    got = engine.classify(jnp.asarray(batch))

    twin = build_twin(cfg)
    twin.load_state_dict(checkpoint.torch_state_dict_from_variables(variables))
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(batch.transpose(0, 3, 1, 2))).argmax(1).numpy()
    agreement = float((np.asarray(got) == want).mean())
    assert agreement >= 0.995, f"int8 top-1 agreement {agreement:.3f} < 0.995"
