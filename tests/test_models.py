"""End-to-end model-family tests on tiny shapes: forward → finite loss,
greedy + beam decode with static shapes, cached-decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioning_tpu.models import api
from imagecaptioning_tpu.models.captioners import (AttentionCaptioner,
                                                   LSTMCaptioner,
                                                   TransformerCaptioner,
                                                   ViTCaptioner)

V, T, B = 10, 6, 2
IMG = (B, 64, 64, 3)
TINY = (1, 1, 1, 1)


def _make(name):
    if name == "lstm":
        return LSTMCaptioner(vocab_size=V, embedding_size=16, rnn_size=12,
                             backbone_stages=TINY)
    if name == "attention":
        return AttentionCaptioner(vocab_size=V, embedding_size=16,
                                  rnn_size=12, dropout=0.5,
                                  backbone_stages=TINY)
    if name == "transformer":
        return TransformerCaptioner(vocab_size=V, max_length=T,
                                    embed_size=16, num_layers=1, heads=4,
                                    dropout=0.1, backbone_stages=TINY)
    return ViTCaptioner(vocab_size=V, max_length=T, embed_size=16,
                        num_layers=1, heads=4, dropout=0.1,
                        image_size=64, vit_patch=16, vit_layers=1,
                        vit_heads=4, vit_hidden=16, vit_mlp=32)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(*IMG).astype(np.float32))
    gt = jnp.asarray(rng.randint(1, V + 1, size=(B, T)).astype(np.int32))
    gt = gt.at[0, 4:].set(0)   # one short caption
    return images, gt


@pytest.mark.parametrize("name", ["lstm", "attention", "transformer", "vitb"])
def test_forward_loss_and_shapes(name, batch):
    images, gt = batch
    model = _make(name)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    fwd = api.make_forward_fn(model)
    loss, out = fwd(variables, images, gt, rng=jax.random.PRNGKey(2),
                    train=True)
    assert out.logits.shape == (B, T + 1, V + 3)
    assert np.isfinite(float(loss))
    # eval-mode loss is deterministic
    l1, _ = fwd(variables, images, gt)
    l2, _ = fwd(variables, images, gt)
    assert float(l1) == float(l2)


@pytest.mark.parametrize("name", ["lstm", "attention", "transformer", "vitb"])
def test_greedy_decode(name, batch):
    images, gt = batch
    model = _make(name)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    toks, alphas = api.make_greedy_fn(model, T + 1)(variables, images)
    assert toks.shape == (B, T + 1)
    assert toks.dtype == jnp.int32
    assert alphas.shape[0] == B and alphas.shape[1] == T + 1


@pytest.mark.parametrize("name", ["lstm", "attention", "transformer"])
def test_beam_decode(name, batch):
    images, gt = batch
    model = _make(name)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    res = api.make_beam_fn(model, T + 1, beam_size=3)(variables, images)
    assert res.tokens.shape == (B, 3, T + 1)
    assert res.scores.shape == (B, 3)
    # best-first ordering
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()


def test_beam1_matches_greedy(batch):
    """Beam size 1 must reproduce the greedy path (same argmax chain)."""
    images, gt = batch
    model = _make("lstm")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    greedy, _ = api.make_greedy_fn(model, T + 1)(variables, images)
    res = api.make_beam_fn(model, T + 1, beam_size=1)(variables, images)
    beam = np.asarray(res.tokens[:, 0])
    g = np.asarray(greedy)
    end = V + 2
    for i in range(B):
        # compare up to and including first END
        e = np.where(g[i] == end)[0]
        upto = (e[0] + 1) if len(e) else T + 1
        np.testing.assert_array_equal(beam[i, :upto], g[i, :upto])


def test_grad_flows(batch):
    images, gt = batch
    model = _make("transformer")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    fwd = api.make_forward_fn(model)

    def loss_fn(params):
        v = {"params": params}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
        loss, _ = fwd(v, images, gt)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0


def test_captioning_model_facade(batch):
    from imagecaptioning_tpu.data.tokenizer import Vocab
    images, gt = batch
    model = _make("lstm")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    vocab = Vocab({f"w{i}": i for i in range(1, V + 1)})
    m = api.CaptioningModel(model, variables, vocab, seq_length=T)
    loss = m.forward_train(images, gt)
    assert np.isfinite(float(loss))
    caps, alphas = m.forward_test(images)
    assert len(caps) == B and all(isinstance(c, str) for c in caps)
    m.use_beam = True
    m.beam_size = 2
    caps_b, _ = m.forward_test(images)
    assert len(caps_b) == B


@pytest.mark.parametrize("name", ["lstm", "attention", "transformer",
                                  "vitb"])
def test_cached_decode_matches_teacher_forced(name, batch):
    """Step-by-step decode (LSTM carry / transformer KV cache) must
    reproduce the teacher-forced forward logits when fed the same
    tokens — the seam between training and serving."""
    from imagecaptioning_tpu.ops import tokens as toklib

    images, gt = batch
    model = _make(name)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, images, gt,
                           train=False)
    out = model.apply(variables, images, gt, train=False)
    tf_logits = np.asarray(out.logits)          # (B, T+1, V+3)

    params = variables["params"]
    feats = model.apply(variables, images, method=model.encode)
    init_carry, step = api.make_step_fn(model, params)
    carry = init_carry(feats, T + 1)
    dec_in = np.asarray(toklib.decoder_input(gt, V + 1))
    # Compare only positions with a non-NULL input token: captions are
    # front-packed, so the teacher-forced key-padding mask
    # (make_trg_mask) only ever differs from the cached path at NULL
    # padding positions — whose outputs are loss-masked in training and
    # unreachable in decode (generation stops at END before any NULL).
    for t in range(T + 1):
        toks = jnp.asarray(dec_in[:, t:t + 1])
        carry, logits, _ = step(carry, toks, jnp.array(t, jnp.int32))
        valid = dec_in[:, t] > 0
        if valid.any():
            np.testing.assert_allclose(np.asarray(logits)[valid],
                                       tf_logits[valid, t],
                                       rtol=2e-4, atol=2e-4)


def test_facade_accepts_reference_data_dict(batch):
    from imagecaptioning_tpu.data.tokenizer import Vocab
    images, gt = batch
    model = _make("lstm")
    variables = model.init({"params": jax.random.PRNGKey(0)}, images, gt,
                           train=False)
    vocab = Vocab({f"w{i}": i for i in range(1, V + 1)})
    m = api.CaptioningModel(model, variables, vocab, T)
    data = {"image": images, "gt_labels": gt}
    loss_dict_style = float(m.forward_train(data))
    loss_positional = float(m.forward_train(images, gt))
    assert loss_dict_style == loss_positional
    caps, alphas = m.forward_test(data)
    assert len(caps) == images.shape[0]


def test_beam_unroll_identical_results(batch):
    """scan_unroll on the beam step loop is a pure perf knob: fully
    unrolled beam must reproduce the rolled beam's tokens and scores
    exactly (runs/bench results.jsonl decode experiments rely on it)."""
    images, gt = batch
    model = _make("transformer")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, gt, train=True)
    rolled = api.make_beam_fn(model, T + 1, beam_size=3)(variables, images)
    unrolled = api.make_beam_fn(model, T + 1, beam_size=3,
                                scan_unroll=True)(variables, images)
    np.testing.assert_array_equal(np.asarray(rolled.tokens),
                                  np.asarray(unrolled.tokens))
    np.testing.assert_allclose(np.asarray(rolled.scores),
                               np.asarray(unrolled.scores),
                               rtol=1e-5, atol=1e-5)
