"""LSTM parity vs torch: same weights → same outputs (rtol 1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from imagecaptioning_tpu.ops.rnn import LSTM, LSTMCell


def _copy_torch_lstm_params(tlstm, num_layers):
    params = {}
    for layer in range(num_layers):
        params[f"w_ih_l{layer}"] = jnp.asarray(
            getattr(tlstm, f"weight_ih_l{layer}").detach().numpy())
        params[f"w_hh_l{layer}"] = jnp.asarray(
            getattr(tlstm, f"weight_hh_l{layer}").detach().numpy())
        params[f"b_ih_l{layer}"] = jnp.asarray(
            getattr(tlstm, f"bias_ih_l{layer}").detach().numpy())
        params[f"b_hh_l{layer}"] = jnp.asarray(
            getattr(tlstm, f"bias_hh_l{layer}").detach().numpy())
    return params


@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_matches_torch(num_layers):
    torch.manual_seed(0)
    b, t, w, h = 3, 5, 8, 6
    tlstm = torch.nn.LSTM(w, h, num_layers, batch_first=True)
    x = torch.randn(b, t, w)
    want_y, (want_h, want_c) = tlstm(x)

    model = LSTM(hidden_size=h, num_layers=num_layers)
    params = _copy_torch_lstm_params(tlstm, num_layers)
    got_y, (got_h, got_c) = model.apply({"params": params},
                                        jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got_y),
                               want_y.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c),
                               want_c.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_lstm_state_threading_matches_two_calls():
    # Reference warms LSTM state on the image patch sequence, then decodes
    # with that state (LanguageModule.py:104-106); state round-trip must
    # equal one concatenated pass.
    key = jax.random.PRNGKey(0)
    model = LSTM(hidden_size=6)
    x1 = jax.random.normal(key, (2, 4, 8))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    variables = model.init(key, x1)
    _, state = model.apply(variables, x1)
    y2, _ = model.apply(variables, x2, state)
    y_full, _ = model.apply(variables, jnp.concatenate([x1, x2], axis=1))
    np.testing.assert_allclose(np.asarray(y2),
                               np.asarray(y_full[:, 4:]), rtol=1e-5, atol=1e-6)


def test_lstm_cell_matches_torch():
    torch.manual_seed(1)
    b, w, h = 4, 10, 7
    tcell = torch.nn.LSTMCell(w, h)
    x = torch.randn(b, w)
    h0 = torch.randn(b, h)
    c0 = torch.randn(b, h)
    want_h, want_c = tcell(x, (h0, c0))

    cell = LSTMCell(hidden_size=h)
    params = {
        "w_ih": jnp.asarray(tcell.weight_ih.detach().numpy()),
        "w_hh": jnp.asarray(tcell.weight_hh.detach().numpy()),
        "b_ih": jnp.asarray(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tcell.bias_hh.detach().numpy()),
    }
    out, (got_h, got_c) = cell.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        (jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())))
    np.testing.assert_allclose(np.asarray(got_h),
                               want_h.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c),
                               want_c.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_interlayer_dropout_multilayer():
    """torch inter-layer LSTM dropout: applied between layers in train
    mode (2-layer GT config), inactive deterministically and for 1 layer."""
    import jax
    from imagecaptioning_tpu.ops.rnn import LSTM

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(2, 5, 8).astype(np.float32))
    m = LSTM(hidden_size=8, num_layers=2, dropout=0.5)
    k = jax.random.PRNGKey(0)
    variables = m.init({"params": k}, xs)
    det, _ = m.apply(variables, xs, deterministic=True)
    tr1, _ = m.apply(variables, xs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    tr2, _ = m.apply(variables, xs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # stochastic in train mode, stable in eval mode
    assert not np.allclose(np.asarray(tr1), np.asarray(det))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    det2, _ = m.apply(variables, xs, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
