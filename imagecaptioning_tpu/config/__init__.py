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

__all__ = [
    "CaptionConfig",
    "apply_overrides",
    "get_config",
    "get_lstm_attention_config",
    "get_lstm_config",
    "get_transformer_config",
    "get_vitb_config",
    "name_model",
]
