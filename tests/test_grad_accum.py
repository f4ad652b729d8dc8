"""Gradient accumulation (`grad_accum_steps`, SURVEY §2.5 plan row):
k accumulated micro-batches must equal one k×-larger batch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagecaptioning_tpu.config import get_lstm_config
from imagecaptioning_tpu.train import optim, step as steplib


def test_accum_update_equals_mean_grad_update():
    """Optimizer-level: k updates with grads g_i, accumulated, equal one
    plain update with mean(g_i) — including the clip, which must see the
    AVERAGED grad (big-batch equivalence), not the micro-grads."""
    cfg = get_lstm_config()
    params = {"llm": {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}}
    g1 = jax.tree.map(lambda x: jnp.full_like(x, 2.0), params)
    g2 = jax.tree.map(lambda x: jnp.full_like(x, 4.0), params)
    gm = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    tx_plain = optim.make_optimizer(cfg, 100, 0)
    u_want, _ = tx_plain.update(gm, tx_plain.init(params), params)

    tx_acc = optim.make_optimizer(cfg.replace(grad_accum_steps=2), 100, 0)
    st = tx_acc.init(params)
    u1, st = tx_acc.update(g1, st, params)
    # first micro-step: no update applied yet
    for leaf in jax.tree.leaves(u1):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    u2, st = tx_acc.update(g2, st, params)
    for a, b in zip(jax.tree.leaves(u2), jax.tree.leaves(u_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_accum_train_steps_equal_large_batch():
    """Model-level: 2 train steps at batch 2 with grad_accum_steps=2 ==
    1 train step at batch 4 (VGG encoder: no BN, so the only coupling
    is the gradient average)."""
    from imagecaptioning_tpu.models.captioners import LSTMCaptioner

    v, t = 16, 5
    rng = np.random.RandomState(0)
    images = rng.rand(4, 32, 32, 3).astype(np.float32)
    gt = rng.randint(1, v + 1, size=(4, t)).astype(np.int32)

    def make(accum):
        model = LSTMCaptioner(vocab_size=v, embedding_size=8, rnn_size=8,
                              dropout=0.0, use_vggface=True)
        cfg = get_lstm_config().replace(grad_accum_steps=accum,
                                        compute_dtype="float32")
        tx = optim.make_optimizer(cfg, total_steps=100,
                                  finetune_start_step=0)
        state, _ = steplib.create_train_state(
            model, tx, jnp.asarray(images[:2]), jnp.asarray(gt[:2]))
        return model, tx, state

    # big batch, no accumulation
    model, tx, state = make(1)
    step = jax.jit(steplib.make_train_step(model, tx))
    s_big, m_big = step(state, jnp.asarray(images), jnp.asarray(gt))

    # two micro-batches, accumulation (same init: same seed)
    model, tx, state = make(2)
    step = jax.jit(steplib.make_train_step(model, tx))
    s_acc, m1 = step(state, jnp.asarray(images[:2]), jnp.asarray(gt[:2]))
    # after the first micro-step params must be UNCHANGED
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s_acc, m2 = step(s_acc, jnp.asarray(images[2:]), jnp.asarray(gt[2:]))

    # loss mean over micro-batches == big-batch loss
    assert (float(m1["loss"]) + float(m2["loss"])) / 2 == \
        pytest.approx(float(m_big["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(s_big.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_accum_finetune_boundary_is_in_applied_units():
    """Regression: everything inside the optimizer (gate_until, lr
    schedules) ticks once per APPLIED update under MultiSteps, so the
    drivers divide their micro-step finetune boundary by k before
    passing it in. With k=2 and boundary=1 (applied units): applied
    update #0 must leave the encoder gated, applied update #1 must
    train it."""
    cfg = get_lstm_config().replace(grad_accum_steps=2, finetune_cnn=True)
    params = {"features": {"w": jnp.ones((2, 2))},
              "llm": {"w": jnp.ones((2, 2))}}
    tx = optim.make_optimizer(cfg, total_steps=10, finetune_start_step=1)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    for micro in range(4):
        u, st = tx.update(g, st, params)
        enc = np.asarray(u["features"]["w"])
        head = np.asarray(u["llm"]["w"])
        if micro in (0, 2):          # mid-accumulation: nothing applied
            assert (enc == 0).all() and (head == 0).all(), micro
        elif micro == 1:             # applied update #0: encoder gated
            assert (enc == 0).all() and (np.abs(head) > 0).any(), micro
        else:                        # applied update #1: encoder live
            assert (np.abs(enc) > 0).any(), micro


def test_accum_state_checkpoints(tmp_path):
    """MultiSteps opt_state (counter + grad accumulator) survives a
    checkpoint round trip."""
    from imagecaptioning_tpu.train.step import TrainState
    from imagecaptioning_tpu.utils import checkpoint as ckptlib

    cfg = get_lstm_config().replace(grad_accum_steps=2)
    params = {"llm": {"w": jnp.ones((2, 2))}}
    tx = optim.make_optimizer(cfg, 100, 0)
    st = tx.init(params)
    _, st = tx.update(jax.tree.map(jnp.ones_like, params), st, params)
    state = TrainState(jnp.array(1, jnp.int32), params, st, {},
                       jax.random.PRNGKey(0))
    path = str(tmp_path / "acc.ckpt")
    ckptlib.save_checkpoint(path, state)
    restored, _ = ckptlib.restore_checkpoint(
        path, TrainState(jnp.array(0, jnp.int32), params,
                         tx.init(params), {}, jax.random.PRNGKey(0)))
    # the mini-step counter travelled
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
