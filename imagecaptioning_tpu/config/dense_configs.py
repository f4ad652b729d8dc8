"""Configuration for the dense-captioning families (GT-box + full RPN).

Mirrors every field of the reference's edict factories
(`AlexGTModel/train_opts.py:10-81` and `DenseCap/train_opts.py` — the
two differ only in artifact paths and the `use_lstm` default), plus the
`traingt.py` artifact-name rewrites (`traingt.py:26-37`: lstm/dropout/
finetuned substring substitutions) and the driver's hard-coded
`max_iter=800000` / `pad=500` (`traingt.py:39-40`).

TPU-native additions (batching, mesh, dtypes) live in clearly-marked
extra fields, exactly like `configs.CaptionConfig`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, replace
from typing import Any, Dict, Tuple


@dataclass
class DenseConfig:
    """One config for GTDenseCaptioner and DenseCapRPN."""

    # 'gt' (AlexGTModel path) | 'rpn' (full DenseCap path)
    model_type: str = "gt"

    backend: str = "tpu"
    device: str = "tpu:0"

    # Model settings (train_opts.py:18-24)
    rpn_hidden_dim: int = 512
    sampler_batch_size: int = 256
    rnn_size: int = 512
    input_encoding_size: int = 512
    sampler_high_thresh: float = 0.7
    sampler_low_thresh: float = 0.3
    train_remove_outbounds_boxes: int = 1

    # Loss weights (train_opts.py:27-33)
    mid_box_reg_weight: float = 0.05
    mid_objectness_weight: float = 0.1
    end_box_reg_weight: float = 0.1
    end_objectness_weight: float = 0.1
    captioning_weight: float = 1.0
    weight_decay: float = 1e-6
    box_reg_decay: float = 5e-5

    # Data input (train_opts.py:36-39)
    data_h5: str = "data/VG-regions.h5"
    data_json: str = "data/VG-regions-dicts.json"
    proposal_regions_h5: str = ""
    debug_max_train_images: int = -1

    # Optimization (train_opts.py:42-50)
    learning_rate: float = 1e-5
    optim_beta1: float = 0.9
    optim_beta2: float = 0.999
    optim_epsilon: float = 1e-8
    drop_prob: float = 0.3
    max_iters: int = 800000          # traingt.py:39
    checkpoint_start_from: str = ""
    finetune_cnn_after: int = -1
    val_images_use: int = 10

    # Checkpointing / artifacts (train_opts.py:53-64)
    save_checkpoint_every: int = 20000
    save_path: str = "runs/models/best_model_transformer_gt.ckpt"
    loss_file: str = "runs/loss_logs/loss_history_transformer_gt.json"
    result_file: str = "runs/logs/results_history_transformer_gt.json"
    from_checkpoint: bool = False
    use_lstm: bool = False
    num_layers: int = 1
    use_curriculum_learning: bool = False
    use_dropout: bool = False
    drop_value: float = 0.5
    finetune_cnn: bool = True

    # Test-time (train_opts.py:66-69)
    test_rpn_nms_thresh: float = 0.7
    test_final_nms_thresh: float = 0.3
    test_num_proposals: int = 1000

    # Visualization / logging (train_opts.py:72-73 + traingt.py:40)
    progress_dump_every: int = 100
    losses_log_every: int = 10
    loss_log_pad: int = 500          # traingt.py 'pad'

    # roi_only: the reference's detection-only RoiModel switch
    # (DenseCap/models.py:12-16)
    roi_only: bool = False

    # Misc (train_opts.py:76-82)
    id: str = ""
    seed: int = 123
    gpu: int = 0
    timing: bool = False
    clip_final_boxes: int = 1
    eval_first_iteration: int = 0

    # ---- TPU-native additions (no reference counterpart) ----
    batch_size: int = 4              # reference is locked to 1 image/step
    max_regions: int = 32            # padded region slab per image
    mesh_shape: Tuple[int, ...] = (-1,)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    eval_batch_size: int = 2
    debug_nans: bool = False
    profile_dir: str = ""        # jax.profiler trace dir ('' = off)
    tensorboard_dir: str = ""    # '' = off; optional TB event stream
    vgg_stages: int = 5          # VGG trunk depth (5 = full; tests shrink)
    use_pallas_roi: bool = False  # explicit Pallas ROI kernel (GT path, TPU)
    # Opt-in stability divergence (off = reference parity): actually sum
    # the RPN's 0.5·box_reg_decay·‖trans‖² term into the total instead
    # of the reference's compute-and-drop (RoiModel.py:238); see
    # DenseCapRPN.apply_box_decay.
    apply_box_decay: bool = False
    # RPN anchor ladder (the reference hard-codes 12 literal anchors at
    # scales {64,128,256,512} × ratios {.5,1,2} for 720px VG images,
    # LocalizationLayer.py:24-30). These default values are a sentinel:
    # models/densecap.default_anchors returns the reference's verbatim
    # hand-rounded table for them (its rounding — 45×90 but 181×362 —
    # matches no formula) and generates (s·√r, s/√r) for any other
    # ladder, so other image/box scales can keep anchor-GT IoU above
    # the 0.7 positive-sampling threshold.
    anchor_sizes: Tuple[float, ...] = (64.0, 128.0, 256.0, 512.0)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    grad_accum_steps: int = 1    # micro-batches per optimizer update
    # Group-wise global-norm gradient clip (head and trainable-encoder
    # groups clipped separately; the frozen conv1_/conv2_ group's
    # discarded grads never enter a norm); 0 = off (the reference's
    # dense drivers never clip — traingt.py/DenseCap train.py have no
    # clip call — so off is the parity default; the knob is a stability
    # ADDITION for hotter learning rates, see PARITY.md)
    grad_clip_norm: float = 0.0
    # Pretrained VGG weights merged into init params (the reference
    # builds from vgg16 IMAGENET1K_V1, net_utils.py:8-13). Syntax:
    # 'features=vgg_feat.npz,classifier=vgg_cls.npz' (GT) or
    # 'conv_trunk=...,recog_base=...' (RPN); see utils/pretrained.py.
    encoder_init: str = ""

    def replace(self, **kw) -> "DenseConfig":
        return replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


def get_gt_config() -> DenseConfig:
    """Reference `AlexGTModel/train_opts.get_config` (use_lstm=False)."""
    return DenseConfig(model_type="gt", use_lstm=False)


def get_densecap_config() -> DenseConfig:
    """Reference `DenseCap/train_opts.get_config` (use_lstm=True)."""
    return DenseConfig(
        model_type="rpn",
        use_lstm=True,
        save_path="runs/models/best_model_densecap.ckpt",
        loss_file="runs/loss_logs/loss_history_densecap.json",
        result_file="runs/logs/results_history_densecap.json",
    )


def name_gt_model(cfg: DenseConfig):
    """The traingt.py artifact rewrites (`traingt.py:26-37`):
    use_lstm → 'transformer'→'lstm'; use_dropout → 'gt'→'gt_drop{v}';
    finetune_cnn → 'gt'→'gt_finetuned' (order matters)."""
    loss_file, result_file, save_path = (cfg.loss_file, cfg.result_file,
                                         cfg.save_path)

    def rewrite(old: str, new: str):
        nonlocal loss_file, result_file, save_path
        loss_file = loss_file.replace(old, new)
        result_file = result_file.replace(old, new)
        save_path = save_path.replace(old, new)

    if cfg.use_lstm:
        rewrite("transformer", "lstm")
    if cfg.use_dropout:
        rewrite("gt", f"gt_drop{cfg.drop_value}")
    if cfg.finetune_cnn:
        rewrite("gt", "gt_finetuned")
    return loss_file, result_file, save_path
