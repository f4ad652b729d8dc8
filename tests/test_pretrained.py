"""Pretrained-encoder initialization (config `encoder_init`).

The reference constructs every model from pretrained torchvision
weights (`AlexCap/LSTMModel.py:18-27`, `VitbModel.py:156-166`,
`DenseCap/densecap/net_utils.py:8-13`); here the converted `.npz` is
merged into the freshly-initialized train state by the drivers. These
tests pin: spec parsing, the exact-structural-match contract, the
end-to-end driver hook (merged weights actually reach `state.params`
and survive the frozen phase untouched), and the torch freeze
semantics of the optimizer (no AdamW decay on grad-less subtrees).
"""

import numpy as np
import pytest

from imagecaptioning_tpu.utils import pretrained, torch_port as tp


def _rand_sd(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}


def _resnet_sd(depth=101, seed=0):
    """Full fake torchvision resnet{depth} state_dict (shapes only)."""
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    shapes = {"conv1.weight": (64, 3, 7, 7),
              "bn1.weight": (64,), "bn1.bias": (64,),
              "bn1.running_mean": (64,), "bn1.running_var": (64,)}
    widths = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    in_c = 64
    for stage, n in enumerate(blocks):
        mid, out = widths[stage]
        for b in range(n):
            t = f"layer{stage + 1}.{b}"
            shapes[f"{t}.conv1.weight"] = (mid, in_c, 1, 1)
            shapes[f"{t}.conv2.weight"] = (mid, mid, 3, 3)
            shapes[f"{t}.conv3.weight"] = (out, mid, 1, 1)
            for i, c in ((1, mid), (2, mid), (3, out)):
                for suf in ("weight", "bias", "running_mean",
                            "running_var"):
                    shapes[f"{t}.bn{i}.{suf}"] = (c,)
            if b == 0:
                shapes[f"{t}.downsample.0.weight"] = (out, in_c, 1, 1)
                for suf in ("weight", "bias", "running_mean",
                            "running_var"):
                    shapes[f"{t}.downsample.1.{suf}"] = (out,)
            in_c = out
    return _rand_sd(shapes, seed)


def _vit_small_kwargs():
    return dict(image_size=32, vit_patch=16, vit_layers=2, vit_heads=4,
                vit_hidden=32, vit_mlp=64)


def _vit_small_sd(seed=0):
    h, L, tokens = 32, 2, 5        # (32/16)^2 + class token
    shapes = {"conv_proj.weight": (h, 3, 16, 16), "conv_proj.bias": (h,),
              "class_token": (1, 1, h),
              "encoder.pos_embedding": (1, tokens, h),
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
            f"{t}.mlp.0.weight": (64, h), f"{t}.mlp.0.bias": (64,),
            f"{t}.mlp.3.weight": (h, 64), f"{t}.mlp.3.bias": (h,),
        })
    return _rand_sd(shapes, seed)


def _save_npz(path, variables):
    np.savez(path, **{k: np.asarray(v)
                      for k, v in pretrained.flatten_tree(variables)
                      .items()})


def _vit_state(tmp_path):
    import jax
    import jax.numpy as jnp

    from imagecaptioning_tpu.config import get_vitb_config
    from imagecaptioning_tpu.models.captioners import ViTCaptioner
    from imagecaptioning_tpu.train import optim, step as steplib

    model = ViTCaptioner(vocab_size=16, max_length=6, embed_size=32,
                         num_layers=1, heads=4, dropout=0.0,
                         freeze_encoder=True, **_vit_small_kwargs())
    # no scheduler: warmup makes lr=0 at step 0, hiding decay entirely
    cfg = get_vitb_config().replace(batch_size=2, use_scheduler=False)
    tx = optim.make_optimizer(cfg, total_steps=10, finetune_start_step=5)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    gt = jnp.ones((2, 6), jnp.int32)
    state, _ = steplib.create_train_state(model, tx, imgs, gt)
    return model, tx, state, imgs, gt


def test_parse_spec():
    assert pretrained.parse_spec("a.npz", "features") == \
        [("features", "a.npz")]
    assert pretrained.parse_spec("features=f.npz, classifier=c.npz",
                                 "x") == \
        [("features", "f.npz"), ("classifier", "c.npz")]
    with pytest.raises(ValueError):
        pretrained.parse_spec("  ,", "features")


def test_merge_vit_encoder_exact(tmp_path):
    _, _, state, _, _ = _vit_state(tmp_path)
    sd = _vit_small_sd()
    variables = tp.convert_vit(sd, num_layers=2, num_heads=4, hidden=32)
    path = str(tmp_path / "vit.npz")
    _save_npz(path, variables)

    merged = pretrained.apply_encoder_init(state, path, "encoder_vit")
    got = pretrained.flatten_tree(merged.params["encoder_vit"])
    want = pretrained.flatten_tree(variables["params"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), atol=1e-6, err_msg=k)
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(merged.params["decoder"]["word_embedding"]["embedding"]),
        np.asarray(state.params["decoder"]["word_embedding"]["embedding"]))


def test_merge_rejects_partial_and_mismatched(tmp_path):
    _, _, state, _, _ = _vit_state(tmp_path)
    sd = _vit_small_sd()
    variables = tp.convert_vit(sd, num_layers=2, num_heads=4, hidden=32)

    partial = {"params": dict(variables["params"])}
    partial["params"].pop("conv_proj")
    path = str(tmp_path / "partial.npz")
    _save_npz(path, partial)
    with pytest.raises(ValueError, match="missing from checkpoint"):
        pretrained.apply_encoder_init(state, path, "encoder_vit")

    bad = {"params": {k: (dict(v) if isinstance(v, dict) else v)
                      for k, v in variables["params"].items()}}
    bad["params"]["ln"] = {"scale": np.zeros((7,), np.float32),
                           "bias": np.zeros((32,), np.float32)}
    path2 = str(tmp_path / "bad.npz")
    _save_npz(path2, bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        pretrained.apply_encoder_init(state, path2, "encoder_vit")

    path3 = str(tmp_path / "vit2.npz")
    _save_npz(path3, variables)
    with pytest.raises(KeyError, match="no module"):
        pretrained.apply_encoder_init(state, path3, "nonexistent")


def test_driver_lstm_encoder_init_end_to_end(tmp_path):
    """driver.train with encoder_init: the converted ResNet-101 weights
    (params AND BN running stats) must be live in the returned state,
    bit-identical after a frozen-phase step (zero encoder updates)."""
    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.train import driver

    sd = _resnet_sd(depth=101, seed=7)
    # Tame the random fake weights so the 104-conv forward stays finite
    # (raw N(0,1) weights blow up activations → NaN loss, and a NaN in
    # any head grad poisons every group through clip_by_global_norm):
    # small convs, near-identity BN.
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = 1.0 + 0.01 * np.abs(sd[k])
        elif k.endswith("running_mean"):
            sd[k] = 0.01 * sd[k]
        elif ".bn" in k or "downsample.1" in k:
            sd[k] = (1.0 + 0.01 * sd[k] if k.endswith("weight")
                     else 0.01 * sd[k])
        elif k.endswith("weight"):
            sd[k] = 0.05 * sd[k]
    variables = tp.convert_resnet(sd, depth=101)
    path = str(tmp_path / "r101.npz")
    _save_npz(path, variables)

    cfg = get_lstm_config().replace(
        batch_size=2, num_epochs=1, save_checkpoint_every=4,
        lstm_size=16, embedding_size=16, compute_dtype="float32",
        encoder_init=path,
        data_h5="/nonexistent.h5", data_json="/nonexistent.json",
        loss_file=str(tmp_path / "l.json"),
        result_file=str(tmp_path / "r.json"),
        save_path=str(tmp_path / "m.ckpt"))
    out = driver.train(cfg, max_iter_override=1, eval_every_override=5,
                       synthetic_images=4, verbose=False)
    state = out["state"]
    got_p = pretrained.flatten_tree(state.params["features"])
    want_p = pretrained.flatten_tree(variables["params"])
    for k in want_p:
        np.testing.assert_array_equal(np.asarray(got_p[k]),
                                      np.asarray(want_p[k]), err_msg=k)
    got_s = pretrained.flatten_tree(state.batch_stats["features"])
    want_s = pretrained.flatten_tree(variables["batch_stats"])
    for k in want_s:
        np.testing.assert_array_equal(np.asarray(got_s[k]),
                                      np.asarray(want_s[k]), err_msg=k)


def test_frozen_vit_encoder_gets_no_adamw_decay(tmp_path):
    """torch skips requires_grad=False params: the frozen pretrained
    ViT encoder must receive NO update — in particular no AdamW weight
    decay (regression: 'encoder_vit' was labeled 'head', so wd=0.1
    silently decayed the frozen encoder every step)."""
    import jax
    import optax

    model, tx, state, imgs, gt = _vit_state(tmp_path)
    zero_grads = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)),
                              state.params)
    updates, _ = tx.update(zero_grads, state.opt_state, state.params)
    enc_updates = pretrained.flatten_tree(updates["encoder_vit"])
    for k, v in enc_updates.items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.zeros_like(np.asarray(v)),
                                      err_msg=k)
    # the decoder head DOES decay (AdamW semantics preserved there)
    dec = pretrained.flatten_tree(updates["decoder"])
    assert any(np.abs(np.asarray(v)).max() > 0 for v in dec.values())


def test_dense_gt_encoder_init_end_to_end(tmp_path):
    """train_gt with encoder_init: converted VGG trunk weights reach
    state.params['features'] and survive the frozen conv1/conv2 phase
    (the reference never unfreezes features[:10], train.py:62-64)."""
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.models.backbones.vgg import VGG16_STAGES
    from imagecaptioning_tpu.train import dense_driver

    # fake torchvision vgg16.features state_dict, stages 1-2 only
    shapes, idx, in_c = {}, 0, 3
    for stage in VGG16_STAGES[:2]:
        for c in stage:
            shapes[f"features.{idx}.weight"] = (c, in_c, 3, 3)
            shapes[f"features.{idx}.bias"] = (c,)
            in_c = c
            idx += 2
        idx += 1
    sd = _rand_sd(shapes, 11)
    for k in sd:
        if k.endswith("weight"):
            sd[k] = 0.05 * sd[k]
    variables = tp.convert_vgg_features(sd, end_stage=2)
    path = str(tmp_path / "vgg2.npz")
    _save_npz(path, variables)

    cfg = get_gt_config().replace(
        data_h5=str(tmp_path / "missing.h5"),
        data_json=str(tmp_path / "missing.json"),
        save_path=str(tmp_path / "models/best_gt.ckpt"),
        loss_file=str(tmp_path / "loss_logs/loss_gt.json"),
        result_file=str(tmp_path / "logs/results_gt.json"),
        batch_size=2, max_regions=3, rnn_size=32, use_lstm=True,
        input_encoding_size=32, compute_dtype="float32",
        eval_batch_size=2, loss_log_pad=1, vgg_stages=2,
        encoder_init=f"features={path}")
    out = dense_driver.train_gt(cfg, max_iter_override=1,
                                eval_every_override=5,
                                synthetic_images=8,
                                synthetic_image_size=64, verbose=False)
    got = pretrained.flatten_tree(out["state"].params["features"])
    want = pretrained.flatten_tree(variables["params"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
