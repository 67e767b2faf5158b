"""Declarative ResNet family: one block spec, five model variants.

TPU-native equivalent of the reference's hand-assembled ResNet-152 graph
(cuda/inference/main.cu:7-125): where the reference builds 50 bottleneck
blocks imperatively with per-block lazily-allocated activation buffers
(main.cu:18-46, 133-143), this module defines the architecture declaratively
and executes it as a single pure function under ``jax.jit`` — XLA owns
scheduling, fusion, and activation memory.

Two things are deliberately kept compatible with the reference:

- **Architecture**: identical to torchvision's ResNet v1.5 (stride on the
  3x3 conv of each bottleneck), which is what the reference implements —
  conv1 7x7/2 p3, maxpool 3x3/2 p1, four stages, global avg-pool, fc
  (main.cu:109-125); downsample (1x1 stride-s conv + BN) only on block 0 of a
  stage when stride != 1 or channels change (main.cu:71-76).
- **Parameter naming**: the params pytree is a nested dict whose joined keys
  are exactly torchvision ``state_dict()`` keys (``layer1.0.conv1.weight``…),
  the same schema the reference uses for its weight files
  (save_weights.py:9-10 <-> main.cu:59-75), so checkpoint import/export is a
  mechanical flatten/unflatten.

Layouts are TPU-native: activations NHWC, conv weights HWIO
(see resnetc_tpu.tensor for the boundary shims).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from resnetc_tpu.ops import lax_ops
from resnetc_tpu.tensor import BF16, DtypePolicy

Pytree = Any

# Bottleneck expansion ratio: out_channels = 4 * inter_channels
# (reference: createLayer calls with out_c = 4*inter_c, main.cu:116-119).
BOTTLENECK_EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    name: str
    block: str  # "basic" | "bottleneck"
    stage_blocks: tuple[int, int, int, int]
    num_classes: int = 1000
    stem_width: int = 64
    #: torchvision's bottleneck width parameterization: inner width =
    #: planes * width_per_group/64 * groups, stage outputs unchanged.
    #: wide_resnet* = width_per_group 128; resnext* = groups 32 with a
    #: small width_per_group.  groups applies to the bottleneck 3x3 only.
    groups: int = 1
    width_per_group: int = 64

    @property
    def expansion(self) -> int:
        return BOTTLENECK_EXPANSION if self.block == "bottleneck" else 1

    @property
    def feature_dim(self) -> int:
        """Channel count entering the classifier (2048 for bottleneck nets)."""
        return self.stem_width * 8 * self.expansion

    def stage_channels(self, stage: int) -> tuple[int, int]:
        """(inter_channels, out_channels) for stage in [0, 4)."""
        base = self.stem_width * (2**stage)
        if self.block == "bottleneck":
            inter = base * self.width_per_group // 64 * self.groups
        else:
            inter = base
        return inter, base * self.expansion


RESNET_CONFIGS: dict[str, ResNetConfig] = {
    "resnet18": ResNetConfig("resnet18", "basic", (2, 2, 2, 2)),
    "resnet34": ResNetConfig("resnet34", "basic", (3, 4, 6, 3)),
    "resnet50": ResNetConfig("resnet50", "bottleneck", (3, 4, 6, 3)),
    "resnet101": ResNetConfig("resnet101", "bottleneck", (3, 4, 23, 3)),
    # The reference's one and only model: 3+8+36+3 bottleneck blocks
    # (main.cu:116-119).
    "resnet152": ResNetConfig("resnet152", "bottleneck", (3, 8, 36, 3)),
    # Beyond the reference: torchvision's wide and grouped (ResNeXt)
    # variants (state_dict keys, shapes, and parameter counts
    # torchvision-exact).
    "wide_resnet50_2": ResNetConfig(
        "wide_resnet50_2", "bottleneck", (3, 4, 6, 3), width_per_group=128
    ),
    "wide_resnet101_2": ResNetConfig(
        "wide_resnet101_2", "bottleneck", (3, 4, 23, 3), width_per_group=128
    ),
    "resnext50_32x4d": ResNetConfig(
        "resnext50_32x4d", "bottleneck", (3, 4, 6, 3),
        groups=32, width_per_group=4,
    ),
    "resnext101_32x8d": ResNetConfig(
        "resnext101_32x8d", "bottleneck", (3, 4, 23, 3),
        groups=32, width_per_group=8,
    ),
}


def get_config(name: str, num_classes: int = 1000) -> ResNetConfig:
    try:
        cfg = RESNET_CONFIGS[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; have {sorted(RESNET_CONFIGS)}")
    return dataclasses.replace(cfg, num_classes=num_classes)


# ---------------------------------------------------------------------------
# Initialisation (new surface: the reference only ever loads trained weights).
# Matches torchvision's init so training-from-scratch behaves identically:
# kaiming-normal fan_out for convs, BN scale=1 bias=0, fc uniform(+-1/sqrt(in)).
# ---------------------------------------------------------------------------


def _conv_init(key: jax.Array, h: int, w: int, cin: int, cout: int, dtype) -> jax.Array:
    fan_out = h * w * cout
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (h, w, cin, cout), dtype)


def _bn_init(c: int, dtype) -> dict[str, jax.Array]:
    return {
        "weight": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "running_mean": jnp.zeros((c,), dtype),
        "running_var": jnp.ones((c,), dtype),
    }


def _block_param_names(cfg: ResNetConfig) -> list[tuple[str, str]]:
    if cfg.block == "bottleneck":
        return [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
    return [("conv1", "bn1"), ("conv2", "bn2")]


def init(
    cfg: ResNetConfig, key: jax.Array, *, dtype: jnp.dtype = jnp.float32
) -> Pytree:
    """Random-init a full variables pytree (params + BN running stats, one tree)."""
    keys = iter(jax.random.split(key, 2048))

    def conv(h, w, cin, cout):
        return {"weight": _conv_init(next(keys), h, w, cin, cout, dtype)}

    variables: dict[str, Any] = {
        "conv1": conv(7, 7, 3, cfg.stem_width),
        "bn1": _bn_init(cfg.stem_width, dtype),
    }

    in_c = cfg.stem_width
    for stage in range(4):
        inter, out_c = cfg.stage_channels(stage)
        stride = 1 if stage == 0 else 2
        blocks: dict[str, Any] = {}
        for b in range(cfg.stage_blocks[stage]):
            blk_stride = stride if b == 0 else 1
            blk: dict[str, Any] = {}
            if cfg.block == "bottleneck":
                blk["conv1"] = conv(1, 1, in_c, inter)
                blk["bn1"] = _bn_init(inter, dtype)
                # Grouped 3x3 (ResNeXt): HWIO kernel carries cin/groups.
                blk["conv2"] = conv(3, 3, inter // cfg.groups, inter)
                blk["bn2"] = _bn_init(inter, dtype)
                blk["conv3"] = conv(1, 1, inter, out_c)
                blk["bn3"] = _bn_init(out_c, dtype)
            else:
                blk["conv1"] = conv(3, 3, in_c, inter)
                blk["bn1"] = _bn_init(inter, dtype)
                blk["conv2"] = conv(3, 3, inter, out_c)
                blk["bn2"] = _bn_init(out_c, dtype)
            if b == 0 and (blk_stride != 1 or in_c != out_c):
                # torchvision names the downsample conv/bn "downsample.0/.1"
                # (reference mirrors this: main.cu:71-76).
                blk["downsample"] = {
                    "0": conv(1, 1, in_c, out_c),
                    "1": _bn_init(out_c, dtype),
                }
            blocks[str(b)] = blk
            in_c = out_c
        variables[f"layer{stage + 1}"] = blocks

    fc_in = cfg.feature_dim
    bound = 1.0 / math.sqrt(fc_in)
    kw, kb = jax.random.split(next(keys))
    variables["fc"] = {
        "weight": jax.random.uniform(kw, (cfg.num_classes, fc_in), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (cfg.num_classes,), dtype, -bound, bound),
    }
    return variables


# ---------------------------------------------------------------------------
# params/state split: BN running stats are state (updated by forward passes in
# train mode), everything else is trainable.
# ---------------------------------------------------------------------------

_STATE_LEAVES = ("running_mean", "running_var")


def split_params_state(variables: Pytree) -> tuple[Pytree, Pytree]:
    """Split one variables tree into (trainable params, BN running stats).

    Both outputs keep the full nesting structure (missing leaves dropped),
    so they can be merged back with ``merge_params_state``.
    """

    def walk(node):
        params, state = {}, {}
        for k, v in node.items():
            if isinstance(v, dict):
                p, s = walk(v)
                if p:
                    params[k] = p
                if s:
                    state[k] = s
            elif k in _STATE_LEAVES:
                state[k] = v
            else:
                params[k] = v
        return params, state

    return walk(variables)


def merge_params_state(params: Pytree, state: Pytree) -> Pytree:
    def walk(p, s):
        out = {}
        for k in set(p) | set(s):
            if k in p and k in s:
                out[k] = walk(p[k], s[k])
            elif k in p:
                out[k] = p[k] if not isinstance(p[k], dict) else walk(p[k], {})
            else:
                out[k] = s[k] if not isinstance(s[k], dict) else walk({}, s[k])
        return out

    return walk(params, state)


# ---------------------------------------------------------------------------
# Forward pass.
# ---------------------------------------------------------------------------


def _bn(
    x, bn_vars, *, train: bool, axis_name: str | None
) -> tuple[jax.Array, dict[str, jax.Array] | None]:
    if not train:
        out = lax_ops.batch_norm_inference(
            x, bn_vars["weight"], bn_vars["bias"],
            bn_vars["running_mean"], bn_vars["running_var"],
        )
        return out, None
    out, new_mean, new_var = lax_ops.batch_norm_train(
        x, bn_vars["weight"], bn_vars["bias"],
        bn_vars["running_mean"], bn_vars["running_var"],
        axis_name=axis_name,
    )
    return out, {"running_mean": new_mean, "running_var": new_var}


def _conv_bn_act(
    x, conv_vars, bn_vars, *, stride, padding, act, train, axis_name, policy,
    groups=1,
):
    w = conv_vars["weight"].astype(policy.compute)
    y = lax_ops.conv2d(x, w, stride=stride, padding=padding, groups=groups)
    y, new_stats = _bn(y, bn_vars, train=train, axis_name=axis_name)
    if act:
        y = lax_ops.relu(y)
    return y, new_stats


def _block_forward(x, blk, cfg, stride, *, train, axis_name, policy):
    """One residual block (basic or bottleneck).

    Bottleneck (reference ResnetBlock, main.cu:18-46): 1x1 -> bn -> relu,
    3x3 stride s pad 1 -> bn -> relu, 1x1 -> bn, + shortcut, relu.
    Basic: 3x3 stride s pad 1 -> bn -> relu, 3x3 pad 1 -> bn, + shortcut, relu.
    """
    new_state: dict[str, Any] = {}

    def bn_step(name, y, conv_name, s, p, act, groups=1):
        y, stats = _conv_bn_act(
            y, blk[conv_name], blk[name], stride=s, padding=p, act=act,
            train=train, axis_name=axis_name, policy=policy, groups=groups,
        )
        if stats is not None:
            new_state[name] = stats
        return y

    if cfg.block == "bottleneck":
        y = bn_step("bn1", x, "conv1", 1, 0, True)
        y = bn_step("bn2", y, "conv2", stride, 1, True, groups=cfg.groups)
        y = bn_step("bn3", y, "conv3", 1, 0, False)
    else:
        y = bn_step("bn1", x, "conv1", stride, 1, True)
        y = bn_step("bn2", y, "conv2", 1, 1, False)

    if "downsample" in blk:
        w = blk["downsample"]["0"]["weight"].astype(policy.compute)
        short = lax_ops.conv2d(x, w, stride=stride, padding=0)
        short, stats = _bn(short, blk["downsample"]["1"], train=train, axis_name=axis_name)
        if stats is not None:
            new_state["downsample"] = {"1": stats}
    else:
        short = x

    y = lax_ops.relu(lax_ops.add(y, short))
    return y, new_state


def forward(
    cfg: ResNetConfig,
    variables: Pytree,
    x: jax.Array,
    *,
    train: bool = False,
    axis_name: str | None = None,
    policy: DtypePolicy = BF16,
    remat: bool = False,
) -> tuple[jax.Array, Pytree]:
    """Run the network. ``x`` is NHWC.

    Returns ``(logits [B, num_classes] in policy.output dtype, new_state)``
    where ``new_state`` holds updated BN running stats (empty dict when
    ``train=False``).  The whole body is pure — jit/grad/vmap/pjit-compatible.

    ``remat=True`` checkpoints each residual block: the backward pass
    recomputes block activations instead of keeping them resident, trading
    ~30% extra FLOPs for O(depth) less activation HBM — the lever for
    larger-than-memory batch sizes (SURVEY.md: jax.checkpoint disposition).

    Equivalent of the reference's resnet152Forward (main.cu:168-226), minus
    the per-op device syncs and the per-stage stdout prints.
    """
    x = x.astype(policy.compute)
    new_state: dict[str, Any] = {}

    # Stem: conv 7x7/2 p3 -> bn -> relu -> maxpool 3x3/2 p1 (main.cu:110-115).
    y, stats = _conv_bn_act(
        x, variables["conv1"], variables["bn1"], stride=2, padding=3, act=True,
        train=train, axis_name=axis_name, policy=policy,
    )
    if stats is not None:
        new_state["bn1"] = stats
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)

    for stage in range(4):
        layer_name = f"layer{stage + 1}"
        stage_stride = 1 if stage == 0 else 2
        layer_state: dict[str, Any] = {}
        for b in range(cfg.stage_blocks[stage]):
            blk_stride = stage_stride if b == 0 else 1

            def block_fn(yy, blk, s=blk_stride):
                return _block_forward(
                    yy, blk, cfg, s,
                    train=train, axis_name=axis_name, policy=policy,
                )

            if remat:
                block_fn = jax.checkpoint(block_fn)
            y, blk_state = block_fn(y, variables[layer_name][str(b)])
            if blk_state:
                layer_state[str(b)] = blk_state
        if layer_state:
            new_state[layer_name] = layer_state

    # Head: global avg pool -> fc (main.cu:213-224).
    feats = lax_ops.global_avg_pool(y)
    logits = lax_ops.linear(
        feats.astype(policy.compute),
        variables["fc"]["weight"].astype(policy.compute),
        variables["fc"]["bias"],
    )
    return logits.astype(policy.output), new_state


# ---------------------------------------------------------------------------
# Folded inference: BN affine folded into conv weights (exact — SURVEY.md §7).
# ---------------------------------------------------------------------------


def fold_inference_params(cfg: ResNetConfig, variables: Pytree) -> Pytree:
    """Produce a serving-mode tree: every conv+BN pair becomes conv(+bias).

    Each folded entry is {"weight": HWIO, "bias": [O]}; the fc layer passes
    through unchanged.  Exact given the reference's BN formula
    (cuda/ops.cu:149-150).
    """

    def fold(conv_vars, bn_vars):
        w, b = lax_ops.fold_bn_into_conv(
            conv_vars["weight"], bn_vars["weight"], bn_vars["bias"],
            bn_vars["running_mean"], bn_vars["running_var"],
        )
        return {"weight": w, "bias": b}

    out: dict[str, Any] = {"conv1": fold(variables["conv1"], variables["bn1"])}
    for stage in range(4):
        layer_name = f"layer{stage + 1}"
        blocks = {}
        for bname, blk in variables[layer_name].items():
            fblk = {}
            for conv_name, bn_name in _block_param_names(cfg):
                if conv_name in blk:
                    fblk[conv_name] = fold(blk[conv_name], blk[bn_name])
            if "downsample" in blk:
                fblk["downsample"] = fold(blk["downsample"]["0"], blk["downsample"]["1"])
            blocks[bname] = fblk
        out[layer_name] = blocks
    out["fc"] = dict(variables["fc"])
    return out


def _folded_conv(x, entry, *, stride, padding, act, policy, groups=1):
    w = entry["weight"].astype(policy.compute)
    y = lax_ops.conv2d(x, w, stride=stride, padding=padding, groups=groups)
    y = y + entry["bias"].astype(y.dtype)
    return lax_ops.relu(y) if act else y


def forward_folded(
    cfg: ResNetConfig,
    folded: Pytree,
    x: jax.Array,
    *,
    policy: DtypePolicy = BF16,
) -> jax.Array:
    """Serving-path forward over a BN-folded tree. Returns logits."""
    x = x.astype(policy.compute)
    y = _folded_conv(x, folded["conv1"], stride=2, padding=3, act=True, policy=policy)
    y = lax_ops.max_pool2d(y, kernel_size=3, stride=2, padding=1)

    for stage in range(4):
        blocks = folded[f"layer{stage + 1}"]
        stage_stride = 1 if stage == 0 else 2
        for b in range(cfg.stage_blocks[stage]):
            blk = blocks[str(b)]
            blk_stride = stage_stride if b == 0 else 1
            if cfg.block == "bottleneck":
                z = _folded_conv(y, blk["conv1"], stride=1, padding=0, act=True, policy=policy)
                z = _folded_conv(
                    z, blk["conv2"], stride=blk_stride, padding=1, act=True,
                    policy=policy, groups=cfg.groups,
                )
                z = _folded_conv(z, blk["conv3"], stride=1, padding=0, act=False, policy=policy)
            else:
                z = _folded_conv(y, blk["conv1"], stride=blk_stride, padding=1, act=True, policy=policy)
                z = _folded_conv(z, blk["conv2"], stride=1, padding=1, act=False, policy=policy)
            if "downsample" in blk:
                short = _folded_conv(
                    y, blk["downsample"], stride=blk_stride, padding=0, act=False, policy=policy
                )
            else:
                short = y
            y = lax_ops.relu(lax_ops.add(z, short))

    feats = lax_ops.global_avg_pool(y)
    logits = lax_ops.linear(
        feats.astype(policy.compute),
        folded["fc"]["weight"].astype(policy.compute),
        folded["fc"]["bias"],
    )
    return logits.astype(policy.output)
