"""Token-id conventions and target construction, as pure jnp functions.

The reference builds decoder inputs/targets with Python loops inside
`get_target` (`AlexCap/LanguageModule.py:113-128`,
`AlexCap/TransformerModule.py:291-306`). Here both variants are
vectorized, jit-able, and shared by every model family.

Two conventions exist in the reference:
- AlexCap family:  NULL=0, START=V+1, END=V+2  (LanguageModule.py:39-41)
- DenseCap transformers: sos=V-2, eos=V-1 over a V+3 table
  (DenseCap/densecap/Transformer.py:240-241, AlexTransformer.py:237-238)

A quirk worth noting: the LSTM/attention `make_target` scans for the
first NULL starting at t=1, while the transformer variant scans from
t=0; `scan_from` captures both.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TokenSpec:
    """Special token ids for a vocabulary of `vocab_size` real tokens."""

    vocab_size: int
    null: int
    start: int
    end: int
    num_embeddings: int

    @classmethod
    def alexcap(cls, vocab_size: int) -> "TokenSpec":
        return cls(vocab_size, 0, vocab_size + 1, vocab_size + 2, vocab_size + 3)

    @classmethod
    def densecap(cls, vocab_size: int) -> "TokenSpec":
        # DenseCap transformers index sos/eos *below* V over a V+3 table.
        return cls(vocab_size, 0, vocab_size - 2, vocab_size - 1, vocab_size + 3)


def decoder_input(gt: jnp.ndarray, start_token: int) -> jnp.ndarray:
    """[START; gt] of shape (N, T+1) — reference get_target(make_target=False)."""
    n = gt.shape[0]
    start_col = jnp.full((n, 1), start_token, dtype=gt.dtype)
    return jnp.concatenate([start_col, gt], axis=1)


def decoder_target(gt: jnp.ndarray, end_token: int, scan_from: int = 1) -> jnp.ndarray:
    """gt padded to (N, T+1) with END written at the first NULL position
    at or after `scan_from` — reference get_target(make_target=True).

    Because the pad column is always NULL, a full-length caption gets its
    END at position T, and an empty caption (scan_from=0) at position 0.
    """
    n, t = gt.shape
    padded = jnp.concatenate([gt, jnp.zeros((n, 1), dtype=gt.dtype)], axis=1)
    is_null = padded == 0
    if scan_from > 0:
        mask = jnp.arange(t + 1) >= scan_from
        is_null = jnp.logical_and(is_null, mask[None, :])
    first_null = jnp.argmax(is_null, axis=1)
    return padded.at[jnp.arange(n), first_null].set(end_token)


def sequence_mask(targets: jnp.ndarray, null_token: int = 0) -> jnp.ndarray:
    """Loss mask: positions where the target is not NULL."""
    return targets != null_token


def caption_lengths(gt: np.ndarray) -> np.ndarray:
    """Number of non-NULL tokens per row (host-side helper)."""
    return (np.asarray(gt) != 0).sum(axis=1)
