"""Model zoo: the ResNet family (18/34/50/101/152)."""

from resnetc_tpu.models.resnet import (  # noqa: F401
    RESNET_CONFIGS,
    ResNetConfig,
    fold_inference_params,
    forward,
    forward_folded,
    get_config,
    init,
    merge_params_state,
    split_params_state,
)
