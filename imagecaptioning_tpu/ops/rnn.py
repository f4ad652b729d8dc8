"""LSTM primitives as `lax.scan` kernels, weight-compatible with torch.

The reference leans on cuDNN `nn.LSTM` (`AlexCap/LanguageModule.py:44`)
and `nn.LSTMCell` (`AlexCap/AttentionLanguageModule.py:58`). Here the
recurrence is a single `lax.scan` whose step is one fused (4H) matmul
per gate block — XLA maps it onto the MXU and keeps the carry in
registers/VMEM. Parameters use torch's layout (w_ih: (4H, in), gate
order i, f, g, o; separate b_ih/b_hh) so checkpoints port by direct
copy (`utils.torch_port`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LSTMState = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each (L, B, H)


def lstm_cell_step(w_ih, w_hh, b_ih, b_hh, x, h, c):
    """One torch-ordered LSTM cell step. x: (B, in), h/c: (B, H)."""
    return lstm_gates_step(x @ w_ih.T + b_ih, w_hh, b_hh, h, c)


def lstm_gates_step(gates_x, w_hh, b_hh, h, c):
    """Cell step from a PRECOMPUTED input projection (x @ w_ih.T + b_ih).
    Under teacher forcing the whole sequence's input projections are one
    (B·T, in)×(in, 4H) MXU GEMM hoisted out of the scan; only the carry-
    dependent h @ w_hh.T stays sequential."""
    gates = gates_x + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, T, in) sequences.

    Matches torch `nn.LSTM(batch_first=True)` numerics; dropout between
    layers (not after the last) like torch. Returns (outputs, (h, c))
    with h/c shaped (num_layers, B, H).
    """

    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    # lax.scan unroll for the recurrence (int, or True = full unroll);
    # see AttentionHead.scan_unroll for the measured rationale.
    unroll: Any = 1

    @nn.compact
    def __call__(self, xs: jnp.ndarray,
                 state: Optional[LSTMState] = None,
                 deterministic: bool = True):
        b = xs.shape[0]
        h0c0 = state
        if h0c0 is None:
            zeros = jnp.zeros((self.num_layers, b, self.hidden_size), xs.dtype)
            h0c0 = (zeros, zeros)

        params = []
        in_dim = xs.shape[-1]
        for layer in range(self.num_layers):
            bound = 1.0 / jnp.sqrt(self.hidden_size)
            init = lambda key, shape, b=bound: jax.random.uniform(
                key, shape, minval=-b, maxval=b)
            w_ih = self.param(f"w_ih_l{layer}", init,
                              (4 * self.hidden_size, in_dim))
            w_hh = self.param(f"w_hh_l{layer}", init,
                              (4 * self.hidden_size, self.hidden_size))
            b_ih = self.param(f"b_ih_l{layer}", init, (4 * self.hidden_size,))
            b_hh = self.param(f"b_hh_l{layer}", init, (4 * self.hidden_size,))
            params.append((w_ih, w_hh, b_ih, b_hh))
            in_dim = self.hidden_size

        # torch applies dropout to the output of every non-final layer,
        # with an independent mask per timestep (relevant for the
        # reference's 2-layer GT config, num_layers=2 drop0.5). Masks are
        # drawn outside the scan and carried through as scan inputs.
        t = xs.shape[1]
        use_drop = (not deterministic and self.dropout > 0
                    and self.num_layers > 1)
        if use_drop:
            keep = 1.0 - self.dropout
            masks_t = jax.random.bernoulli(
                self.make_rng("dropout"), keep,
                (t, self.num_layers - 1, b, self.hidden_size)
            ).astype(xs.dtype) / keep
        else:
            masks_t = jnp.ones((t, 0, b, self.hidden_size), xs.dtype)

        # layer 0's input projection has no carry dependence — hoist it
        # out of the scan as ONE (B·T, in)×(in, 4H) GEMM (MXU-sized)
        # instead of T sequential (B, in) slivers
        w_ih0, _, b_ih0, _ = params[0]
        pre0_t = jnp.swapaxes(xs @ w_ih0.T + b_ih0, 0, 1)  # (T, B, 4H)

        def step(carry, inp_t):
            pre0, mask_t = inp_t
            hs, cs = carry
            new_h, new_c = [], []
            inp = None
            for layer, (w_ih, w_hh, b_ih, b_hh) in enumerate(params):
                if layer == 0:
                    h, c = lstm_gates_step(pre0, w_hh, b_hh,
                                           hs[0], cs[0])
                else:
                    h, c = lstm_cell_step(w_ih, w_hh, b_ih, b_hh,
                                          inp, hs[layer], cs[layer])
                new_h.append(h)
                new_c.append(c)
                inp = h
                if use_drop and layer < self.num_layers - 1:
                    inp = inp * mask_t[layer]
            return (jnp.stack(new_h), jnp.stack(new_c)), inp

        (hT, cT), ys_t = jax.lax.scan(step, h0c0, (pre0_t, masks_t),
                                      unroll=self.unroll)
        ys = jnp.swapaxes(ys_t, 0, 1)
        return ys, (hT, cT)


class LSTMCell(nn.Module):
    """Single-step LSTM cell (torch `nn.LSTMCell` layout)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]):
        h, c = state
        bound = 1.0 / jnp.sqrt(self.hidden_size)
        init = lambda key, shape: jax.random.uniform(
            key, shape, minval=-bound, maxval=bound)
        w_ih = self.param("w_ih", init, (4 * self.hidden_size, x.shape[-1]))
        w_hh = self.param("w_hh", init, (4 * self.hidden_size, self.hidden_size))
        b_ih = self.param("b_ih", init, (4 * self.hidden_size,))
        b_hh = self.param("b_hh", init, (4 * self.hidden_size,))
        h_new, c_new = lstm_cell_step(w_ih, w_hh, b_ih, b_hh, x, h, c)
        return h_new, (h_new, c_new)
