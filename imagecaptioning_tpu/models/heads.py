"""Caption decoder heads for the CNN encoder families.

- `LanguageHead`: the reference's LSTM decoder (`AlexCap/
  LanguageModule.py`): project image patch-vectors, run the LSTM over
  them to warm its state ("image as prefix", :104-106), then
  teacher-force [START; gt]. Decode is a single-step method for the
  fused scan/beam drivers.
- `AttentionHead`: Show-Attend-Tell (`AlexCap/AttentionLanguageModule.py`):
  additive attention `v·tanh(W·feat + U·h)` over patch positions
  (:6-22), sigmoid gate on the context (:74-76), LSTMCell, per-step
  logits + alphas.

Both heads are flax modules whose training forward is a single
`lax.scan` (the reference's per-step Python loops, :72-84, don't
compile on TPU). The attention head hoists `W·feat` out of the scan —
it doesn't depend on the hidden state, so the reference recomputes it
T times for nothing.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagecaptioning_tpu.ops.rnn import LSTM, lstm_gates_step


class LanguageHead(nn.Module):
    """LSTM caption head. vocab table is V+3 (NULL/START/END)."""

    vocab_size: int
    embedding_size: int
    rnn_size: int
    num_layers: int = 1
    dropout: float = 0.0
    # AlexCap appends a Dropout after the LSTM (LanguageModule.py:48);
    # the GT variant instead passes dropout INTO nn.LSTM (inter-layer)
    # with the output drop commented out (AlexDenseLangage.py:53-55).
    output_dropout: bool = True
    scan_unroll: Any = 1        # recurrence unroll; see AttentionHead

    def setup(self):
        self.image_encoder = nn.Dense(self.embedding_size)
        self.lookup_table = nn.Embed(self.vocab_size + 3, self.embedding_size)
        # inter-layer LSTM dropout matters only for the multi-layer GT
        # config (torch nn.LSTM semantics)
        self.lstm = LSTM(hidden_size=self.rnn_size,
                         num_layers=self.num_layers, dropout=self.dropout,
                         unroll=self.scan_unroll)
        self.out_drop = nn.Dropout(
            self.dropout if self.output_dropout else 0.0)
        self.linear = nn.Dense(self.vocab_size + 3)

    def _warm_state(self, image_vectors):
        encoded = nn.relu(self.image_encoder(image_vectors))
        _, state = self.lstm(encoded)
        return state

    def __call__(self, image_vectors: jnp.ndarray,
                 tokens_with_start: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """Teacher-forced logits (B, T+1, V+3)."""
        state = self._warm_state(image_vectors)
        word_vecs = self.lookup_table(tokens_with_start)
        out, _ = self.lstm(word_vecs, state, deterministic=deterministic)
        out = self.out_drop(out, deterministic=deterministic)
        return self.linear(out)

    def init_state(self, image_vectors: jnp.ndarray):
        return self._warm_state(image_vectors)

    def step(self, tokens: jnp.ndarray, state):
        """One decode step: (B, 1) tokens + LSTM state → ((B, V+3), state)."""
        word_vecs = self.lookup_table(tokens)
        out, state = self.lstm(word_vecs, state)
        return self.linear(out)[:, 0], state


def _linear_init(rng, shape):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(shape[0] if len(shape) == 2 else shape[-1])
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound)


class AttentionHead(nn.Module):
    """Show-Attend-Tell LSTM head; per-step computation is raw-param math
    so the whole teacher-forced pass is one `lax.scan`."""

    vocab_size: int
    embedding_size: int
    encoder_dim: int
    rnn_size: int
    dropout: float = 0.5
    # Unroll of the teacher-forced recurrence scan (int, or True = full
    # unroll; passed straight to `lax.scan`). Measured on v5e: full
    # unroll over the T≤17 chain is +25% train throughput vs the rolled
    # loop (5,813 vs 4,648 img/s, runs/bench/results.jsonl
    # 2026-08-19T17:35Z) — XLA schedules the carry-independent GEMMs of
    # consecutive steps back-to-back instead of re-entering a loop body.
    # Kept as a knob for the MFU falsification series
    # (docs/SCALING.md "Per-family MFU").
    scan_unroll: Any = True

    def setup(self):
        v3 = self.vocab_size + 3
        w, d, h = self.embedding_size, self.encoder_dim, self.rnn_size
        self.init_h = nn.Dense(h)
        self.init_c = nn.Dense(h)
        self.embedding = nn.Embed(v3, w)
        # attention: e = v·tanh(W·feat + U·h)
        self.att_w_kernel = self.param("att_W_kernel", _linear_init, (d, h))
        self.att_w_bias = self.param("att_W_bias", nn.initializers.zeros, (h,))
        self.att_u_kernel = self.param("att_U_kernel", _linear_init, (h, h))
        self.att_u_bias = self.param("att_U_bias", nn.initializers.zeros, (h,))
        self.att_v_kernel = self.param("att_v_kernel", _linear_init, (h, 1))
        self.att_v_bias = self.param("att_v_bias", nn.initializers.zeros, (1,))
        self.f_beta_kernel = self.param("f_beta_kernel", _linear_init, (h, d))
        self.f_beta_bias = self.param("f_beta_bias", nn.initializers.zeros, (d,))
        self.out_kernel = self.param("deep_output_kernel", _linear_init, (h, v3))
        self.out_bias = self.param("deep_output_bias", nn.initializers.zeros,
                                   (v3,))
        # torch LSTMCell init: EVERY param ~ U(-1/sqrt(hidden), 1/sqrt(hidden))
        cell_bound = 1.0 / jnp.sqrt(h)
        cell_init = lambda rng, shape: jax.random.uniform(
            rng, shape, minval=-cell_bound, maxval=cell_bound)
        self.w_ih = self.param("cell_w_ih", cell_init, (4 * h, w + d))
        self.w_hh = self.param("cell_w_hh", cell_init, (4 * h, h))
        self.b_ih = self.param("cell_b_ih", cell_init, (4 * h,))
        self.b_hh = self.param("cell_b_hh", cell_init, (4 * h,))

    def init_state(self, img_features):
        avg = img_features.mean(axis=1)
        return (jnp.tanh(self.init_h(avg)), jnp.tanh(self.init_c(avg)))

    def _attend(self, w_s, img_features, h):
        """w_s = W·feat precomputed (B, P, H)."""
        u_h = h @ self.att_u_kernel + self.att_u_bias
        e = (jnp.tanh(w_s + u_h[:, None, :]) @ self.att_v_kernel)[..., 0]
        e = e + self.att_v_bias[0]
        alpha = jax.nn.softmax(e, axis=1)
        context = (img_features * alpha[..., None]).sum(axis=1)
        return context, alpha

    def _pre_emb(self, emb):
        """Embedding half of the cell's input-gate GEMM (+ b_ih). The
        cell input is concat(emb, gate·ctx); splitting W_ih by columns
        makes this half carry-independent, so under teacher forcing the
        whole sequence's projections hoist out of the scan as one
        (B·T, w)×(w, 4H) MXU GEMM."""
        return emb @ self.w_ih[:, :self.embedding_size].T + self.b_ih

    def _cell(self, w_s, img_features, pre_emb, state, drop_rng=None):
        h, c = state
        context, alpha = self._attend(w_s, img_features, h)
        gate = jax.nn.sigmoid(h @ self.f_beta_kernel + self.f_beta_bias)
        gates_x = pre_emb + (gate * context) @ \
            self.w_ih[:, self.embedding_size:].T
        h, c = lstm_gates_step(gates_x, self.w_hh, self.b_hh, h, c)
        hd = h
        if drop_rng is not None:
            keep = jax.random.bernoulli(drop_rng, 1.0 - self.dropout, h.shape)
            hd = jnp.where(keep, h / (1.0 - self.dropout), 0.0)
        logits = hd @ self.out_kernel + self.out_bias
        return logits, alpha, (h, c)

    def _w_s(self, img_features):
        return img_features @ self.att_w_kernel + self.att_w_bias

    def __call__(self, img_features: jnp.ndarray,
                 tokens_with_start: jnp.ndarray,
                 deterministic: bool = True):
        """Teacher-forced scan → (logits (B, T+1, V+3), alphas (B, T+1, P))."""
        state = self.init_state(img_features)
        pre_t = jnp.swapaxes(
            self._pre_emb(self.embedding(tokens_with_start)), 0, 1)
        w_s = self._w_s(img_features)
        use_drop = (not deterministic) and self.dropout > 0
        base_rng = self.make_rng("dropout") if use_drop else None

        def body(carry, inp):
            t, pre = inp
            rng = jax.random.fold_in(base_rng, t) if use_drop else None
            logits, alpha, carry = self._cell(w_s, img_features, pre,
                                              carry, rng)
            return carry, (logits, alpha)

        ts = jnp.arange(pre_t.shape[0])
        _, (logits_t, alphas_t) = jax.lax.scan(body, state, (ts, pre_t),
                                               unroll=self.scan_unroll)
        return jnp.swapaxes(logits_t, 0, 1), jnp.swapaxes(alphas_t, 0, 1)

    def attention_keys(self, img_features):
        """W·feat — constant over decode steps; precompute once and pass
        into `step` instead of recomputing the (B, P, D)×(D, H) matmul
        every step."""
        return self._w_s(img_features)

    def step(self, img_features, tokens, state, w_s=None):
        """One decode step (deterministic). `w_s`: precomputed
        `attention_keys` (computed here when omitted)."""
        pre = self._pre_emb(self.embedding(tokens)[:, 0])
        if w_s is None:
            w_s = self._w_s(img_features)
        logits, alpha, state = self._cell(w_s, img_features, pre, state)
        return logits, alpha, state
