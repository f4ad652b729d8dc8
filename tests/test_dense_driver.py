"""Smoke + semantics tests for the dense-captioning training drivers."""

import numpy as np
import pytest

from imagecaptioning_tpu.config.dense_configs import (get_densecap_config,
                                                      get_gt_config,
                                                      name_gt_model)
from imagecaptioning_tpu.train import dense_driver


class TestNaming:
    def test_default_transformer_names(self):
        cfg = get_gt_config().replace(finetune_cnn=False)
        loss, res, save = name_gt_model(cfg)
        assert "transformer_gt" in loss and "transformer_gt" in save

    def test_lstm_dropout_finetuned_rewrites(self):
        cfg = get_gt_config().replace(use_lstm=True, use_dropout=True,
                                      drop_value=0.5, finetune_cnn=True)
        loss, res, save = name_gt_model(cfg)
        # traingt.py order: lstm first, gt→gt_drop0.5, then the finetune
        # rewrite re-matches the 'gt' prefix → gt_finetuned_drop0.5 —
        # exactly the committed artifact name
        # (AlexGTModel/logs/results_history_lstm_gt_finetuned_drop0.5.json)
        assert "lstm_gt_finetuned_drop0.5" in loss
        assert "lstm_gt_finetuned_drop0.5" in save


def test_teacher_prob_schedule():
    assert float(dense_driver.teacher_prob_schedule(0)) == pytest.approx(
        40000.0 / 40001.0, rel=1e-5)
    # decreasing in iter
    a = float(dense_driver.teacher_prob_schedule(0))
    b = float(dense_driver.teacher_prob_schedule(200000))
    assert b < a


def _tiny_gt_cfg(tmp_path, **kw):
    return get_gt_config().replace(
        data_h5=str(tmp_path / "missing.h5"),
        data_json=str(tmp_path / "missing.json"),
        save_path=str(tmp_path / "models/best_gt.ckpt"),
        loss_file=str(tmp_path / "loss_logs/loss_gt.json"),
        result_file=str(tmp_path / "logs/results_gt.json"),
        batch_size=2, max_regions=3, rnn_size=32,
        input_encoding_size=32, compute_dtype="float32",
        eval_batch_size=2, loss_log_pad=1, vgg_stages=2, **kw)


@pytest.mark.parametrize("use_lstm,curriculum", [(True, True),
                                                 (False, False)])
def test_train_gt_smoke(tmp_path, use_lstm, curriculum):
    cfg = _tiny_gt_cfg(tmp_path, use_lstm=use_lstm,
                       use_curriculum_learning=curriculum)
    out = dense_driver.train_gt(cfg, max_iter_override=2,
                                eval_every_override=2,
                                synthetic_images=8,
                                synthetic_image_size=64, verbose=False)
    assert out["iters"] == 2
    assert np.isfinite(out["final_loss"])
    assert out["best_val_score"] is not None
    import os
    loss_file, result_file, save_path = name_gt_model(cfg)
    assert os.path.exists(loss_file)
    assert os.path.exists(result_file)
    assert os.path.isdir(save_path)        # best checkpoint written


def test_train_rpn_smoke(tmp_path):
    cfg = get_densecap_config().replace(
        data_h5=str(tmp_path / "missing.h5"),
        data_json=str(tmp_path / "missing.json"),
        save_path=str(tmp_path / "models/best_rpn.ckpt"),
        loss_file=str(tmp_path / "loss_logs/loss_rpn.json"),
        result_file=str(tmp_path / "logs/results_rpn.json"),
        batch_size=2, max_regions=3, rnn_size=32,
        input_encoding_size=32, compute_dtype="float32",
        sampler_batch_size=16, test_num_proposals=20,
        losses_log_every=1, vgg_stages=3)
    out = dense_driver.train_rpn(cfg, max_iter_override=2,
                                 eval_every_override=2,
                                 synthetic_images=6,
                                 synthetic_image_size=96, verbose=False)
    assert out["iters"] == 2
    for k in ("mid_objectness", "mid_box_reg", "end_objectness",
              "end_box_reg", "captioning", "total"):
        assert np.isfinite(out["final_losses"][k]), k


def test_rpn_anchor_ladder_configurable():
    """anchor_sizes/anchor_ratios flow from DenseConfig into the RPN:
    the default is the reference's 12-anchor ladder
    (LocalizationLayer.py:24-30); a custom ladder changes the per-
    position anchor count k (RPN head channels) and still trains."""
    import jax
    import jax.numpy as jnp

    from imagecaptioning_tpu.models.densecap import default_anchors

    # Default = the reference's VERBATIM 12-anchor table — value-level
    # golden against LocalizationLayer.py:24-30 (its hand-rounded
    # literals match no (s·√r, s/√r) formula: 45×90 but 181×362).
    reference_literals = np.asarray([
        [45, 90], [90, 45], [64, 64],
        [90, 180], [180, 90], [128, 128],
        [181, 362], [362, 181], [256, 256],
        [362, 724], [724, 362], [512, 512]], dtype=np.float32)
    np.testing.assert_array_equal(default_anchors(), reference_literals)
    # non-default ladders come from the (s·√r, s/√r) generator
    gen = default_anchors(sizes=(10.0,), ratios=(0.25, 1.0))
    np.testing.assert_allclose(gen, [[5.0, 20.0], [10.0, 10.0]], rtol=1e-6)

    cfg = get_densecap_config().replace(
        batch_size=1, max_regions=2, rnn_size=32, input_encoding_size=32,
        compute_dtype="float32", sampler_batch_size=8, vgg_stages=2,
        anchor_sizes=(16.0, 24.0, 36.0), anchor_ratios=(0.75, 1.0, 4.0 / 3))
    model = dense_driver.build_rpn_model(cfg, vocab_size=16, seq_length=5)
    assert model.anchor_sizes == (16.0, 24.0, 36.0)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    boxes = jnp.asarray([[[32.0, 32, 20, 24], [16.0, 40, 18, 14]]],
                        dtype=jnp.float32)
    labels = jnp.asarray(rng.randint(1, 14, size=(1, 2, 5), dtype=np.int32))
    mask = jnp.ones((1, 2), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1),
                            "sampling": jax.random.PRNGKey(2)},
                           images, boxes, mask, labels, train=True)
    # 1×1 score head emits k = len(sizes)×len(ratios) = 9 channels
    assert variables["params"]["rpn_scores"]["kernel"].shape[-1] == 9
    losses = model.apply(variables, images, boxes, mask, labels, train=True,
                         rngs={"dropout": jax.random.PRNGKey(3),
                               "sampling": jax.random.PRNGKey(4)})
    assert np.isfinite(float(losses["total"]))


def test_optimizer_freezes_conv1_conv2():
    """conv1_*/conv2_* never update; later convs update only after the
    finetune step; head updates immediately."""
    import jax
    import jax.numpy as jnp

    cfg = get_gt_config().replace(weight_decay=0.0)
    tx = dense_driver.make_dense_optimizer(cfg, finetune_start_step=5)
    params = {
        "features": {"conv1_1": {"kernel": jnp.ones((2, 2))},
                     "conv5_3": {"kernel": jnp.ones((2, 2))}},
        "llm": {"w": jnp.ones((2, 2))},
    }
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["features"]["conv1_1"]["kernel"]).max()) == 0
    assert float(jnp.abs(updates["features"]["conv5_3"]["kernel"]).max()) == 0
    assert float(jnp.abs(updates["llm"]["w"]).max()) > 0
    # after the finetune boundary the later conv starts moving
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["features"]["conv5_3"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["features"]["conv1_1"]["kernel"]).max()) == 0


def test_endless_batches_resume_cursor():
    """_endless_batches(start_images=k) continues the epoch mid-stream —
    the reference's `loader.iterators[0] = iter % len(train_ix)` resume
    (traingt.py:51) — then wraps to full epochs."""
    from imagecaptioning_tpu.data import synthetic
    from imagecaptioning_tpu.data.vg_loader import VGDataLoader
    from imagecaptioning_tpu.train import dense_driver

    arrays, info = synthetic.make_vg_arrays(num_images=8,
                                            regions_per_image=2)
    loader = VGDataLoader(arrays=arrays, info=info)
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    cfg = get_gt_config().replace(batch_size=2, max_regions=3)

    n_batches = len(loader.train_ix) // cfg.batch_size   # 6 imgs / bs 2
    fresh = dense_driver._endless_batches(loader, cfg)
    resumed = dense_driver._endless_batches(loader, cfg,
                                            start_images=2 * cfg.batch_size)
    full_epoch = [next(fresh) for _ in range(n_batches)]
    # resumed stream: batch 2 of epoch 0, then epoch 1 from the top
    for want in full_epoch[2:] + full_epoch[:2]:
        got = next(resumed)
        np.testing.assert_array_equal(got["image"], want["image"])


def test_resume_cursor_aligns_with_ragged_tail():
    """With bs not dividing the split, each epoch drops the ragged tail;
    the resume cursor must wrap in BATCH units so the resumed stream
    reproduces the uninterrupted one exactly."""
    from imagecaptioning_tpu.data import synthetic
    from imagecaptioning_tpu.data.vg_loader import VGDataLoader
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.train import dense_driver

    arrays, info = synthetic.make_vg_arrays(num_images=13,
                                            regions_per_image=2)
    loader = VGDataLoader(arrays=arrays, info=info)
    n_train = len(loader.train_ix)
    bs = 4
    assert n_train % bs != 0, "fixture must have a ragged tail"
    cfg = get_gt_config().replace(batch_size=bs, max_regions=3)
    steps_per_epoch = n_train // bs

    full = dense_driver._endless_batches(loader, cfg)
    want = [next(full) for _ in range(3 * steps_per_epoch)]

    resume_iter = steps_per_epoch + 1      # mid-epoch, past one wrap
    start = (resume_iter % steps_per_epoch) * bs
    resumed = dense_driver._endless_batches(loader, cfg,
                                            start_images=start)
    for k in range(resume_iter, 3 * steps_per_epoch):
        got = next(resumed)
        np.testing.assert_array_equal(got["image"], want[k]["image"])


def test_train_rpn_resumes(tmp_path):
    """train_rpn resumes from its best checkpoint (same machinery as
    train_gt; the reference's DenseCap driver has neither)."""
    from imagecaptioning_tpu.config.dense_configs import get_densecap_config
    from imagecaptioning_tpu.train import dense_driver
    from imagecaptioning_tpu.utils import checkpoint as ckptlib

    cfg = get_densecap_config().replace(
        batch_size=2, max_regions=2, vgg_stages=2, sampler_batch_size=16,
        compute_dtype="float32", from_checkpoint=False,
        loss_file=str(tmp_path / "loss.json"),
        result_file=str(tmp_path / "res.json"),
        save_path=str(tmp_path / "rpn.ckpt"))
    out = dense_driver.train_rpn(cfg, max_iter_override=2,
                                 eval_every_override=2,
                                 synthetic_images=8, verbose=False)
    ckptlib.save_checkpoint(cfg.save_path, out["state"])
    out2 = dense_driver.train_rpn(cfg.replace(from_checkpoint=True),
                                  max_iter_override=4,
                                  eval_every_override=4,
                                  synthetic_images=8, verbose=False)
    assert out2["iters"] == 4
    assert all(np.isfinite(v) for v in out2["final_losses"].values())


def test_rpn_apply_box_decay_knob():
    """apply_box_decay=False (default) keeps reference parity: the decay
    term is reported but excluded from the total. True sums it in —
    total_on == total_off + box_decay, same forward otherwise."""
    import jax
    import jax.numpy as jnp

    def losses(apply_decay):
        cfg = get_densecap_config().replace(
            batch_size=1, max_regions=2, rnn_size=32,
            input_encoding_size=32, compute_dtype="float32",
            sampler_batch_size=8, vgg_stages=2,
            apply_box_decay=apply_decay)
        model = dense_driver.build_rpn_model(cfg, vocab_size=16,
                                             seq_length=5)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        boxes = jnp.asarray([[[32.0, 32, 20, 24], [16.0, 40, 18, 14]]],
                            dtype=jnp.float32)
        labels = jnp.asarray(rng.randint(1, 14, size=(1, 2, 5),
                                         dtype=np.int32))
        mask = jnp.ones((1, 2), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1),
                                "sampling": jax.random.PRNGKey(2)},
                               images, boxes, mask, labels, train=True)
        return model.apply(variables, images, boxes, mask, labels,
                           train=True,
                           rngs={"dropout": jax.random.PRNGKey(3),
                                 "sampling": jax.random.PRNGKey(4)})

    off = losses(False)
    on = losses(True)
    assert float(off["box_decay"]) == pytest.approx(
        float(on["box_decay"]), rel=1e-6)
    assert float(on["total"]) == pytest.approx(
        float(off["total"]) + float(off["box_decay"]), rel=1e-5)
