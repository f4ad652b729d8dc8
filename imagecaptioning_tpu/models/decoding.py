"""Fused autoregressive decoding: one `lax.scan` greedy decoder and one
fixed-shape batched beam search shared by all four model families.

The reference has four hand-rolled Python beam loops with dynamic beam
shrinking and state reindexing (`AlexCap/LanguageModule.py:152-198`,
`AttentionLanguageModule.py:128-195`, `TransformerModule.py:308-358`,
`VitbModel.py:266-320`). Dynamic shapes don't compile on TPU, so here:

- beams never shrink: a finished beam is frozen (its only continuation
  is END with zero added score) and selection is a masked top-k over
  K·V candidates each step;
- scores accumulate **raw logits** by default — that is what the
  reference accumulates (it tops-k the unnormalized decoder output);
  pass `use_logprobs=True` for conventional log-prob beam search;
- the final answer is the best *finished* beam, falling back to the
  best unfinished one if none finished (TransformerModule.py:352-357);
- model state (LSTM carry or transformer KV cache) is a pytree gathered
  along the beam axis with the parent indices each step.

A decode step is `step_fn(carry, tokens (B,1), t) -> (carry, logits
(B, V), alphas (B, P))`; alphas may be a dummy for families without
attention maps.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

DecodeStep = Callable[[Any, jnp.ndarray, jnp.ndarray],
                      Tuple[Any, jnp.ndarray, jnp.ndarray]]


def _gather_beams(tree: Any, parents: jnp.ndarray, batch: int, k: int) -> Any:
    """Reindex every (B*K, ...) leaf by per-batch parent beam indices."""
    def gather(leaf):
        if leaf.ndim == 0:
            return leaf
        x = leaf.reshape(batch, k, *leaf.shape[1:])
        x = jnp.take_along_axis(
            x, parents.reshape(batch, k, *([1] * (leaf.ndim - 1))), axis=1)
        return x.reshape(batch * k, *leaf.shape[1:])
    return jax.tree.map(gather, tree)


def greedy_decode(step_fn: DecodeStep, carry: Any, batch: int,
                  start_token: int, max_steps: int,
                  collect_alphas: bool = False,
                  scan_unroll: Any = 1):
    """Greedy argmax decode. Returns (tokens (B, max_steps),
    alphas (B, max_steps, P) or None). The reference's early break on
    all-END (`LanguageModule.py:145-148`) is a host-side optimization
    that does not change the decoded strings — decode stops at the first
    END anyway — so we run the fixed step count and keep shapes static.
    `scan_unroll` feeds lax.scan's unroll (the train-side recurrence
    measured +5..25% from full unroll; see AttentionHead.scan_unroll)."""

    init_tok = jnp.full((batch, 1), start_token, jnp.int32)

    def body(state, t):
        carry, tok = state
        carry, logits, alphas = step_fn(carry, tok, t)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        out = (nxt[:, 0], alphas) if collect_alphas else (nxt[:, 0],)
        return (carry, nxt), out

    (_, _), outs = jax.lax.scan(body, (carry, init_tok),
                                jnp.arange(max_steps), unroll=scan_unroll)
    tokens = jnp.swapaxes(outs[0], 0, 1)
    alphas = jnp.swapaxes(outs[1], 0, 1) if collect_alphas else None
    return tokens, alphas


class BeamResult(NamedTuple):
    tokens: jnp.ndarray       # (B, K, L) best-first
    scores: jnp.ndarray       # (B, K)
    finished: jnp.ndarray     # (B, K) bool
    alphas: Optional[jnp.ndarray] = None   # (B, K, L, P)


def beam_search(step_fn: DecodeStep, carry: Any, batch: int, beam_size: int,
                start_token: int, end_token: int, max_steps: int,
                use_logprobs: bool = False,
                length_normalize: bool = False,
                collect_alphas: bool = False,
                alpha_positions: int = 1,
                scan_unroll: Any = 1) -> BeamResult:
    """Fixed-shape batched beam search. `carry` must already be expanded
    to B*K along its batch axis (beam-major within batch). `scan_unroll`
    feeds lax.scan's unroll over the step loop."""
    k = beam_size
    neg = jnp.float32(-1e30)

    tokens = jnp.full((batch, k, max_steps), end_token, jnp.int32)
    scores = jnp.where(jnp.arange(k) == 0, 0.0, neg)     # only beam 0 live
    scores = jnp.broadcast_to(scores, (batch, k)).astype(jnp.float32)
    finished = jnp.zeros((batch, k), bool)
    fin_scores = jnp.full((batch, k), neg)
    cur = jnp.full((batch * k, 1), start_token, jnp.int32)
    alphas = (jnp.zeros((batch, k, max_steps, alpha_positions), jnp.float32)
              if collect_alphas else jnp.zeros((batch, k, 1, 1), jnp.float32))

    def body(state, t):
        carry, cur, tokens, scores, finished, fin_scores, alphas = state
        carry, logits, step_alphas = step_fn(carry, cur, t)
        v = logits.shape[-1]
        logits = logits.astype(jnp.float32)
        if use_logprobs:
            logits = jax.nn.log_softmax(logits, axis=-1)
        logits = logits.reshape(batch, k, v)

        # Frozen (finished) beams may only emit END with no score change.
        frozen_row = jnp.where(jnp.arange(v) == end_token, 0.0, neg)
        step_scores = jnp.where(finished[..., None], frozen_row[None, None, :],
                                logits)
        cand = scores[..., None] + step_scores                # (B, K, V)
        flat = cand.reshape(batch, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, k)          # (B, K)
        parents = top_idx // v
        words = (top_idx % v).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, parents[..., None], axis=1)
        tokens = tokens.at[:, :, t].set(words)
        if collect_alphas:
            p = alphas.shape[-1]
            sa = step_alphas.reshape(batch, k, p)
            alphas = jnp.take_along_axis(alphas,
                                         parents[..., None, None], axis=1)
            sa = jnp.take_along_axis(sa, parents[..., None], axis=1)
            alphas = alphas.at[:, :, t, :].set(sa)

        was_finished = jnp.take_along_axis(finished, parents, axis=1)
        newly_done = jnp.logical_and(words == end_token,
                                     jnp.logical_not(was_finished))
        finished = jnp.logical_or(was_finished, words == end_token)
        fin_scores = jnp.take_along_axis(fin_scores, parents, axis=1)
        fin_scores = jnp.where(newly_done, top_scores, fin_scores)
        scores = jnp.where(finished, jnp.where(newly_done, top_scores,
                                               jnp.take_along_axis(scores, parents, axis=1)),
                           top_scores)

        carry = _gather_beams(carry, parents, batch, k)
        cur = words.reshape(batch * k, 1)
        return (carry, cur, tokens, scores, finished, fin_scores, alphas), None

    state = (carry, cur, tokens, scores, finished, fin_scores, alphas)
    state, _ = jax.lax.scan(body, state, jnp.arange(max_steps),
                            unroll=scan_unroll)
    _, _, tokens, scores, finished, fin_scores, alphas = state

    final = jnp.where(finished, fin_scores, scores)
    if length_normalize:
        lengths = jnp.argmax(tokens == end_token, axis=-1)
        lengths = jnp.where(lengths == 0, max_steps, lengths)
        final = final / jnp.maximum(lengths, 1).astype(jnp.float32)
    # Prefer finished beams (reference keeps searching until all beams
    # complete; an unfinished beam only wins if nothing finished).
    any_finished = jnp.any(finished, axis=1, keepdims=True)
    rank = jnp.where(jnp.logical_and(any_finished,
                                     jnp.logical_not(finished)),
                     neg, final)
    order = jnp.argsort(-rank, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    rank = jnp.take_along_axis(rank, order, axis=1)
    finished = jnp.take_along_axis(finished, order, axis=1)
    if collect_alphas:
        alphas = jnp.take_along_axis(alphas, order[..., None, None], axis=1)
    return BeamResult(tokens, rank, finished,
                      alphas if collect_alphas else None)


def expand_for_beams(tree: Any, beam_size: int) -> Any:
    """Tile every (B, ...) leaf to (B*K, ...) beam-major within batch."""
    def tile(leaf):
        if leaf.ndim == 0:
            return leaf
        return jnp.repeat(leaf, beam_size, axis=0)
    return jax.tree.map(tile, tree)
