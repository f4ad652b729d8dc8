"""End-to-end gradient-path checks: each family must OVERFIT a tiny
fixed batch — the loss must drop substantially under its real optimizer.
This guards the whole chain (encode → decode → loss → grads → update);
a silently-broken gradient path (e.g. a custom VJP dropping a gradient)
fails here even when per-op tests pass.

The reference has no equivalent; its substitute was watching the loss
logs (SURVEY §4 'eval-as-test')."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagecaptioning_tpu.models.captioners import (AttentionCaptioner,
                                                   LSTMCaptioner,
                                                   TransformerCaptioner)
from imagecaptioning_tpu.models.densecap import DenseCapRPN, GTDenseCaptioner

TINY = (1, 1, 1, 1)


def _fit(loss_fn, params, steps=40, lr=3e-3):
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    return first, float(loss)


@pytest.mark.parametrize("family,steps,lr",
                         [("lstm", 80, 1e-2), ("attention", 120, 1e-2),
                          ("transformer", 40, 3e-3)])
def test_alexcap_families_overfit(family, steps, lr):
    """Driven through the production train step (make_train_step), so
    BN batch-stat threading during finetuning is on the path."""
    from imagecaptioning_tpu.train import step as steplib

    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(4, 64, 64, 3) * 255).astype(np.uint8))
    gt = jnp.asarray(rng.randint(1, 33, size=(4, 6), dtype=np.int32))
    make = {
        "lstm": lambda: LSTMCaptioner(
            vocab_size=32, embedding_size=32, rnn_size=32,
            backbone_stages=TINY),
        # att_reg_weight=0: the doubly-stochastic regularizer has an
        # irreducible floor when T > #positions (sum-to-one over time is
        # unsatisfiable), which would mask CE progress; the regularizer
        # value itself is unit-tested in test_tokens_and_losses.py.
        "attention": lambda: AttentionCaptioner(
            vocab_size=32, embedding_size=32, rnn_size=32, dropout=0.0,
            att_reg_weight=0.0, backbone_stages=TINY),
        "transformer": lambda: TransformerCaptioner(
            vocab_size=32, max_length=6, embed_size=32, num_layers=1,
            heads=4, dropout=0.0, backbone_stages=TINY),
    }[family]
    model = make()
    tx = optax.adam(lr)
    pre = lambda u8: u8.astype(jnp.float32) / 255.0
    state, _ = steplib.create_train_state(model, tx, pre(images), gt)
    step = jax.jit(steplib.make_train_step(model, tx, preprocess=pre))
    hist = []
    for _ in range(steps):
        state, m = step(state, images, gt)
        hist.append(float(m["loss"]))
    best = min(h for h in hist if np.isfinite(h))
    assert best < 0.6 * hist[0], (family, hist[0], best, hist[-1])


def test_gt_dense_overfits():
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([[[32.0, 32, 24, 24], [20.0, 40, 14, 14]]] * 2)
        .astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 25, size=(2, 2, 6), dtype=np.int32))
    mask = jnp.ones((2, 2), jnp.float32)
    model = GTDenseCaptioner(vocab_size=24, seq_length=6, use_lstm=True,
                             embedding_size=32, rnn_size=32, vgg_stages=2)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1),
                            "sampling": jax.random.PRNGKey(2)},
                           images, boxes, labels, train=True)

    def loss_fn(params):
        out = model.apply({"params": params}, images, boxes, labels,
                          train=True,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "sampling": jax.random.PRNGKey(4)})
        return model.loss(out, labels, mask)

    first, last = _fit(loss_fn, variables["params"])
    assert last < 0.6 * first, (first, last)


def test_rpn_total_loss_decreases():
    """The 5-loss RPN objective trains end-to-end (incl. through the
    sampler and ROI pooling into the RPN heads)."""
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([[[32.0, 32, 24, 24], [20.0, 40, 14, 14]]] * 2)
        .astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 25, size=(2, 2, 6), dtype=np.int32))
    mask = jnp.ones((2, 2), jnp.float32)
    model = DenseCapRPN(vocab_size=24, seq_length=6, num_pos=8, num_neg=8,
                        embedding_size=32, rnn_size=32, vgg_stages=2)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1),
                            "sampling": jax.random.PRNGKey(2)},
                           images, boxes, mask, labels, train=True)

    def loss_fn(params):
        d = model.apply({"params": params}, images, boxes, mask, labels,
                        train=True,
                        rngs={"dropout": jax.random.PRNGKey(3),
                              "sampling": jax.random.PRNGKey(4)})
        return d["total"]

    first, last = _fit(loss_fn, variables["params"], steps=50, lr=1e-3)
    assert np.isfinite(last)
    assert last < 0.8 * first, (first, last)


def test_vitb_overfits():
    """ViT family gradient path (small config: 2 encoder layers)."""
    from imagecaptioning_tpu.models.captioners import ViTCaptioner
    from imagecaptioning_tpu.train import step as steplib

    rng = np.random.RandomState(3)
    images = jnp.asarray((rng.rand(4, 32, 32, 3) * 255).astype(np.uint8))
    gt = jnp.asarray(rng.randint(1, 33, size=(4, 6), dtype=np.int32))
    model = ViTCaptioner(vocab_size=32, max_length=6, embed_size=32,
                         num_layers=1, heads=4, dropout=0.0,
                         image_size=32, vit_patch=8, vit_layers=2,
                         vit_heads=4, vit_hidden=32, vit_mlp=64,
                         freeze_encoder=False)
    tx = optax.adam(3e-3)
    pre = lambda u8: u8.astype(jnp.float32) / 255.0
    state, _ = steplib.create_train_state(model, tx, pre(images), gt)
    step = jax.jit(steplib.make_train_step(model, tx, preprocess=pre))
    hist = []
    for _ in range(60):
        state, m = step(state, images, gt)
        hist.append(float(m["loss"]))
    best = min(h for h in hist if np.isfinite(h))
    assert best < 0.6 * hist[0], (hist[0], best, hist[-1])
