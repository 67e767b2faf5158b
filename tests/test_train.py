"""Training-step tests: grad-check vs PyTorch autograd, SGD trajectory parity,
loss/metrics sanity (BASELINE.json config #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from resnetc_tpu import train
from resnetc_tpu.checkpoint import (
    flatten_tree,
    torch_state_dict_from_variables,
    unflatten_tree,
    variables_from_torch_state_dict,
)
from resnetc_tpu.models import resnet
from resnetc_tpu.tensor import FP32, nchw_to_nhwc
from resnetc_tpu.verify.twin import build_twin


def _twin_with_our_params(cfg, variables):
    twin = build_twin(cfg)
    sd = torch_state_dict_from_variables(variables)
    twin.load_state_dict(sd, strict=False)
    return twin


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 20), dtype=np.float32)
    labels = rng.integers(0, 20, size=(8,)).astype(np.int64)
    for smoothing in (0.0, 0.1):
        ref = F.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=smoothing
        ).item()
        ours = float(
            train.cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels.astype(np.int32)),
                label_smoothing=smoothing,
            )
        )
        assert abs(ours - ref) < 5e-5, (smoothing, ours, ref)


def test_gradients_match_torch_autograd():
    """Full-model grad check, fp32, train-mode BN (batch-stat backward —
    the classic correctness trap called out in SURVEY.md §7)."""
    cfg = resnet.get_config("resnet18", num_classes=10)
    variables = resnet.init(cfg, jax.random.key(0))
    params, bn_state = resnet.split_params_state(variables)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 32, 32), dtype=np.float32)
    labels = rng.integers(0, 10, size=(4,))

    # Ours.
    grads = jax.grad(
        lambda p: train.loss_fn(
            cfg, p, bn_state, nchw_to_nhwc(jnp.asarray(x)),
            jnp.asarray(labels.astype(np.int32)), policy=FP32,
        )[0]
    )(params)

    # Torch.
    twin = _twin_with_our_params(cfg, variables)
    twin.train()
    out = twin(torch.from_numpy(x))
    loss = F.cross_entropy(out, torch.from_numpy(labels))
    loss.backward()

    ref_grads = {
        name: p.grad.numpy() for name, p in twin.named_parameters() if p.grad is not None
    }
    ours_flat = flatten_tree(grads)
    assert set(ref_grads) == set(ours_flat)
    for name, ref in ref_grads.items():
        got = np.asarray(ours_flat[name], np.float32)
        if name.endswith("weight") and ref.ndim == 4:
            got = got.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        # Tolerances sized for fp32 accumulation-order noise through a deep
        # backward (grads here reach O(10)); a real BN-backward bug shows up
        # as O(1) absolute error, far outside this band.
        np.testing.assert_allclose(
            got, ref, rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_sgd_matches_torch_single_tensor():
    """SGD semantics (wd folded into grad, momentum buffer, nesterov) vs
    torch.optim.SGD on a synthetic quadratic."""
    rng = np.random.default_rng(2)
    w0 = rng.standard_normal((5, 3), dtype=np.float32)

    for nesterov in (False, True):
        tw = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch.optim.SGD(
            [tw], lr=0.1, momentum=0.9, weight_decay=0.01, nesterov=nesterov
        )
        params = {"w": jnp.asarray(w0)}
        buf = train.init_momentum(params)
        for _ in range(5):
            opt.zero_grad()
            (tw**2).sum().backward()
            opt.step()
            grads = {"w": 2 * params["w"]}
            params, buf = train.sgd_update(
                params, grads, buf, lr=0.1, momentum=0.9, weight_decay=0.01,
                nesterov=nesterov,
            )
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_train_step_matches_torch_with_resync():
    """Three optimization steps on ResNet-18, each started from torch's exact
    state (params, BN buffers, momentum), so every comparison is one-step
    tight.  Free-running multi-step trajectories are chaotic — BN batch
    statistics amplify 1e-6 parameter noise into percent-level loss drift
    within two steps — so resyncing is what makes the assertion meaningful:
    it checks the full step math (grads, momentum, wd, BN updates) at three
    different realistic states."""
    cfg = resnet.get_config("resnet18", num_classes=10)
    tcfg = train.TrainConfig(
        lr=0.01, momentum=0.9, weight_decay=1e-4, policy_name="fp32"
    )
    ts = train.init_train_state(cfg, jax.random.key(3))

    twin = _twin_with_our_params(cfg, resnet.merge_params_state(ts.params, ts.bn_state))
    twin.train()
    opt = torch.optim.SGD(
        twin.parameters(), lr=0.01, momentum=0.9, weight_decay=1e-4
    )

    rng = np.random.default_rng(4)
    for step in range(3):
        # Resync our state from torch (the ground truth trajectory).
        sd = {k: v for k, v in twin.state_dict().items()
              if not k.endswith("num_batches_tracked")}
        params, bn_state = resnet.split_params_state(
            variables_from_torch_state_dict(sd)
        )
        mom_flat = {}
        for name, p in twin.named_parameters():
            buf = opt.state.get(p, {}).get("momentum_buffer")
            arr = (np.zeros(p.shape, np.float32) if buf is None
                   else buf.numpy().astype(np.float32))
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            mom_flat[name] = jnp.asarray(arr)
        ts = train.TrainState(
            step=jnp.int32(step), params=params, bn_state=bn_state,
            momentum=unflatten_tree(mom_flat),
        )

        x = rng.standard_normal((4, 3, 32, 32), dtype=np.float32)
        labels = rng.integers(0, 10, size=(4,))

        ts, metrics = train.train_step(
            cfg, tcfg, ts, nchw_to_nhwc(jnp.asarray(x)),
            jnp.asarray(labels.astype(np.int32)), jnp.float32(0.01),
        )

        opt.zero_grad()
        loss = F.cross_entropy(twin(torch.from_numpy(x)), torch.from_numpy(labels))
        loss.backward()
        opt.step()

        # 5e-4 absolute on a ~2.3 loss: run-to-run fp32 reduction
        # nondeterminism occasionally exceeds 1e-4; real step bugs show up
        # orders of magnitude above this.
        assert abs(float(metrics["loss"]) - loss.item()) < 5e-4, step

        ours = flatten_tree(ts.params)
        for name, p in twin.named_parameters():
            got = np.asarray(ours[name], np.float32)
            if p.ndim == 4:
                got = got.transpose(3, 2, 0, 1)
            np.testing.assert_allclose(
                got, p.detach().numpy(), rtol=1e-3, atol=1e-5,
                err_msg=f"step {step}: {name}",
            )
        # BN running stats must track torch's too.
        ours_state = flatten_tree(ts.bn_state)
        for name, b in twin.named_buffers():
            if name.endswith("num_batches_tracked"):
                continue
            np.testing.assert_allclose(
                np.asarray(ours_state[name], np.float32), b.numpy(),
                rtol=1e-3, atol=1e-5, err_msg=f"step {step}: {name}",
            )


def test_train_step_loss_decreases_overfit():
    """Overfit one small batch: loss must drop monotonically-ish."""
    cfg = resnet.get_config("resnet18", num_classes=5)
    tcfg = train.TrainConfig(lr=0.02, momentum=0.9, weight_decay=0.0, policy_name="fp32")
    ts = train.init_train_state(cfg, jax.random.key(5))
    x = jax.random.normal(jax.random.key(6), (8, 24, 24, 3))
    y = jnp.arange(8, dtype=jnp.int32) % 5
    losses = []
    for _ in range(8):
        ts, m = train.train_step(cfg, tcfg, ts, x, y, jnp.float32(0.02))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(ts.step) == 8


def test_cosine_schedule():
    sched = train.cosine_schedule(1.0, 100, warmup_steps=10, final_lr=0.1)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.1, rtol=1e-5)
    assert float(sched(55)) < 1.0


def test_remat_matches_no_remat():
    """Block rematerialisation must not change gradients (only memory).

    Norm-relative comparison at batch 16: tiny compiler-reassociation diffs
    (~1e-6/block) get chaotically amplified by train-mode BN statistics at
    very small batch sizes, so elementwise comparison at batch 2 is
    meaningless while a wiring bug would still blow the 1e-4 gate here."""
    cfg = resnet.get_config("resnet18", num_classes=6)
    variables = resnet.init(cfg, jax.random.key(8))
    params, bn_state = resnet.split_params_state(variables)
    x = jax.random.normal(jax.random.key(9), (16, 24, 24, 3))
    y = (jnp.arange(16) % 6).astype(jnp.int32)

    def grads(remat):
        return jax.grad(
            lambda p: train.loss_fn(
                cfg, p, bn_state, x, y, policy=FP32, remat=remat
            )[0]
        )(params)

    g0, g1 = grads(False), grads(True)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    den = sum(float(jnp.sum(a**2)) for a in jax.tree.leaves(g0))
    assert (num / max(den, 1e-12)) ** 0.5 < 1e-4
