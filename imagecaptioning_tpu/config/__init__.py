from imagecaptioning_tpu.config.configs import (
    CaptionConfig,
    apply_overrides,
    get_config,
    get_lstm_attention_config,
    get_lstm_config,
    get_transformer_config,
    get_vitb_config,
    name_model,
)
from imagecaptioning_tpu.config.dense_configs import (
    DenseConfig,
    get_densecap_config,
    get_gt_config,
    name_gt_model,
)

__all__ = [
    "DenseConfig",
    "get_densecap_config",
    "get_gt_config",
    "name_gt_model",
    "CaptionConfig",
    "apply_overrides",
    "get_config",
    "get_lstm_attention_config",
    "get_lstm_config",
    "get_transformer_config",
    "get_vitb_config",
    "name_model",
]
