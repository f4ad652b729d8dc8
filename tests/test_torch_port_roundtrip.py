"""Round-trip tests for the torch ↔ flax checkpoint converters."""

import numpy as np
import pytest

from imagecaptioning_tpu.utils import torch_port as tp


def _rand_sd(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}


def _assert_sd_equal(a, b):
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_resnet_roundtrip():
    # minimal fake resnet50-shaped dict (just the stem + one block probe
    # would not satisfy the converter; build full resnet50 shapes)
    shapes = {"conv1.weight": (64, 3, 7, 7),
              "bn1.weight": (64,), "bn1.bias": (64,),
              "bn1.running_mean": (64,), "bn1.running_var": (64,)}
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    blocks = (3, 4, 6, 3)
    in_c = 64
    for stage, n in enumerate(blocks):
        mid, out = widths[stage]
        for b in range(n):
            t = f"layer{stage + 1}.{b}"
            shapes[f"{t}.conv1.weight"] = (mid, in_c, 1, 1)
            shapes[f"{t}.conv2.weight"] = (mid, mid, 3, 3)
            shapes[f"{t}.conv3.weight"] = (out, mid, 1, 1)
            for i, c in ((1, mid), (2, mid), (3, out)):
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    shapes[f"{t}.bn{i}.{suf}"] = (c,)
            if b == 0:
                shapes[f"{t}.downsample.0.weight"] = (out, in_c, 1, 1)
                for suf in ("weight", "bias", "running_mean",
                            "running_var"):
                    shapes[f"{t}.downsample.1.{suf}"] = (out,)
            in_c = out
    sd = _rand_sd(shapes)
    # real torchvision checkpoints carry a num_batches_tracked counter
    # per BN; the export emits it as int64 0 (no flax equivalent)
    for k in [k for k in sd if k.endswith(".running_mean")]:
        sd[k.replace(".running_mean", ".num_batches_tracked")] = (
            np.asarray(0, np.int64))
    variables = tp.convert_resnet(sd, depth=50)
    back = tp.export_resnet(variables, depth=50)
    _assert_sd_equal(sd, back)


def test_vgg_features_roundtrip():
    from imagecaptioning_tpu.models.backbones.vgg import VGG16_STAGES
    shapes = {}
    idx, in_c = 0, 3
    for stage in VGG16_STAGES:
        for c in stage:
            shapes[f"features.{idx}.weight"] = (c, in_c, 3, 3)
            shapes[f"features.{idx}.bias"] = (c,)
            in_c = c
            idx += 2
        idx += 1
    sd = _rand_sd(shapes, 1)
    back = tp.export_vgg_features(tp.convert_vgg_features(sd))
    _assert_sd_equal(sd, back)


def test_vgg_classifier_roundtrip():
    sd = _rand_sd({"classifier.0.weight": (4096, 25088),
                   "classifier.0.bias": (4096,),
                   "classifier.3.weight": (4096, 4096),
                   "classifier.3.bias": (4096,)}, 2)
    back = tp.export_vgg_classifier(tp.convert_vgg_classifier(sd))
    _assert_sd_equal(sd, back)


def test_vit_roundtrip():
    h, L = 768, 2
    shapes = {"conv_proj.weight": (h, 3, 16, 16), "conv_proj.bias": (h,),
              "class_token": (1, 1, h),
              "encoder.pos_embedding": (1, 197, h),
              "encoder.ln.weight": (h,), "encoder.ln.bias": (h,)}
    for i in range(L):
        t = f"encoder.layers.encoder_layer_{i}"
        shapes.update({
            f"{t}.self_attention.in_proj_weight": (3 * h, h),
            f"{t}.self_attention.in_proj_bias": (3 * h,),
            f"{t}.self_attention.out_proj.weight": (h, h),
            f"{t}.self_attention.out_proj.bias": (h,),
            f"{t}.ln_1.weight": (h,), f"{t}.ln_1.bias": (h,),
            f"{t}.ln_2.weight": (h,), f"{t}.ln_2.bias": (h,),
            f"{t}.mlp.0.weight": (3072, h), f"{t}.mlp.0.bias": (3072,),
            f"{t}.mlp.3.weight": (h, 3072), f"{t}.mlp.3.bias": (h,),
        })
    sd = _rand_sd(shapes, 3)
    back = tp.export_vit(tp.convert_vit(sd, num_layers=L), num_layers=L)
    _assert_sd_equal(sd, back)


def test_lstm_roundtrip():
    sd = _rand_sd({"lstm.weight_ih_l0": (256, 64),
                   "lstm.weight_hh_l0": (256, 64),
                   "lstm.bias_ih_l0": (256,), "lstm.bias_hh_l0": (256,)}, 4)
    back = tp.export_lstm(tp.convert_lstm(sd, "lstm"), "lstm")
    _assert_sd_equal(sd, back)


def test_cli_roundtrip(tmp_path):
    import convert_checkpoint as cc
    sd = _rand_sd({"classifier.0.weight": (4096, 25088),
                   "classifier.0.bias": (4096,),
                   "classifier.3.weight": (4096, 4096),
                   "classifier.3.bias": (4096,)}, 5)
    src = str(tmp_path / "src.npz")
    np.savez(src, **sd)
    mid = str(tmp_path / "flax.npz")
    out = str(tmp_path / "back.npz")
    cc.main(["import", "--arch", "vgg16_classifier", "--src", src,
             "--dst", mid])
    cc.main(["export", "--arch", "vgg16_classifier", "--src", mid,
             "--dst", out])
    with np.load(out) as z:
        back = {k: z[k] for k in z.files}
    _assert_sd_equal(sd, back)
