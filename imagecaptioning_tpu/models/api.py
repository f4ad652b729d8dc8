"""High-level captioning API: jitted forward/decode around the flax
models, with the reference's model contract on top.

`CaptioningModel` mirrors the reference's uniform model interface
(`forward_train(data)->loss`, `forward_test(data)->captions[,alphas]`,
`set_eval`, `use_beam`/`beam_size`, `llm.decode_sequence` — e.g.
`AlexCap/LSTMModel.py:47-86`) so a user of the reference can switch
with minimal edits. Internally everything is pure-functional:
`make_forward_fn`/`make_greedy_fn`/`make_beam_fn` return jitted
closures over (params, batch) used by the training driver, the eval
harness and the benchmark alike.

Transformer-family decoding threads a flax 'cache' collection (KV
cache) through `lax.scan`; LSTM-family decoding carries (h, c). Both
run as a single fused scan on device — no per-step host round trips
(the reference decodes with Python loops, `TransformerModule.py:376-388`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioning_tpu.models import decoding
from imagecaptioning_tpu.models.captioners import (AttentionCaptioner,
                                                   LSTMCaptioner,
                                                   TransformerCaptioner,
                                                   TrainOutput, ViTCaptioner)


def _is_transformer_family(model) -> bool:
    return isinstance(model, (TransformerCaptioner, ViTCaptioner))


def init_cache(model, params, enc: jnp.ndarray, max_steps: int):
    """Shape the decoder KV cache by tracing one full-length decode call."""
    toks = jnp.zeros((enc.shape[0], max_steps), jnp.int32)
    _, variables = model.apply(
        {"params": params}, enc, toks, jnp.array(0, jnp.int32),
        method=model.decode_step, mutable=["cache"])
    return variables["cache"]


def _partition_carry(carry):
    """Split a decode carry into (variant, invariant) parts. Invariant =
    beam-independent tensors: the encoder conditioning ('enc'/'feats')
    and the cached cross-attention k/v ('cross_*' leaves) — every beam
    of a batch element holds identical copies, so gathering them with
    the parent indices each beam step is pure wasted HBM bandwidth."""
    def walk(d, top):
        var, inv = {}, {}
        for k, v in d.items():
            if isinstance(v, dict):
                v1, v2 = walk(v, False)
                if v1:
                    var[k] = v1
                if v2:
                    inv[k] = v2
            elif (top and k in ("enc", "feats", "w_s")) or k.startswith("cross_"):
                inv[k] = v
            else:
                var[k] = v
        return var, inv
    return walk(carry, True)


def _merge_carry(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = (_merge_carry(out[k], v)
                  if k in out and isinstance(v, dict) else v)
    return out


def _beam_invariant_step(init_carry, step, enc_k, max_steps):
    """Build (variant_carry, step_fn) with invariants closed over."""
    carry = init_carry(enc_k, max_steps)
    variant, invariant = _partition_carry(carry)

    def step2(c, toks, t):
        full, logits, alphas = step(_merge_carry(c, invariant), toks, t)
        new_variant, _ = _partition_carry(full)
        return new_variant, logits, alphas
    return variant, step2


def _lstm_carry_to_batch_major(state):
    h, c = state
    return (jnp.swapaxes(h, 0, 1), jnp.swapaxes(c, 0, 1))


def _lstm_carry_from_batch_major(state):
    h, c = state
    return (jnp.swapaxes(h, 0, 1), jnp.swapaxes(c, 0, 1))


def make_step_fn(model, params) -> Tuple[Callable, Callable]:
    """Returns (init_carry(feats, max_steps), step_fn) for the decode
    drivers. Every carry leaf is batch-major so beam gathers are uniform."""

    if _is_transformer_family(model):
        def init_carry(enc, max_steps):
            return {"enc": enc, "cache": init_cache(model, params, enc,
                                                    max_steps)}

        def step(carry, toks, t):
            (enc, logits, alphas), mut = model.apply(
                {"params": params, "cache": carry["cache"]},
                carry["enc"], toks, t,
                method=model.decode_step, mutable=["cache"])
            return {"enc": enc, "cache": mut["cache"]}, logits, alphas
        return init_carry, step

    if isinstance(model, AttentionCaptioner):
        def init_carry(feats, max_steps):
            feats2, w_s, state = model.apply({"params": params}, feats,
                                             method=model.init_decode)
            return {"feats": feats2, "w_s": w_s, "state": state}

        def step(carry, toks, t):
            (feats, w_s, state), logits, alphas = model.apply(
                {"params": params},
                (carry["feats"], carry["w_s"], carry["state"]),
                toks, t, method=model.decode_step)
            return ({"feats": feats, "w_s": w_s, "state": state},
                    logits, alphas)
        return init_carry, step

    # LSTM family: carry (h, c) stored batch-major.
    def init_carry(feats, max_steps):
        state = model.apply({"params": params}, feats,
                            method=model.init_decode)
        return {"state": _lstm_carry_to_batch_major(state)}

    def step(carry, toks, t):
        state = _lstm_carry_from_batch_major(carry["state"])
        state, logits, alphas = model.apply(
            {"params": params}, state, toks, t, method=model.decode_step)
        return {"state": _lstm_carry_to_batch_major(state)}, logits, alphas
    return init_carry, step


def apply_train(model, variables, images, gt, rngs=None):
    """Train-mode apply tolerant of BN stat mutation: returns
    (TrainOutput, new_batch_stats). The single place that knows how
    unfrozen-encoder BN threads its running-stat updates — used by the
    train step (which consumes the stats) and make_forward_fn (which
    discards them, being a pure loss fn)."""
    if "batch_stats" in variables:
        out, mutated = model.apply(variables, images, gt, train=True,
                                   rngs=rngs, mutable=["batch_stats"])
        return out, mutated.get("batch_stats",
                                variables.get("batch_stats", {}))
    out = model.apply(variables, images, gt, train=True, rngs=rngs)
    return out, {}


def make_forward_fn(model) -> Callable:
    """(variables, images, gt, rng, train) → (loss, TrainOutput), jittable."""

    def forward(variables, images, gt, rng=None, train: bool = False):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            out, _ = apply_train(model, variables, images, gt, rngs=rngs)
        else:
            out = model.apply(variables, images, gt, train=False, rngs=rngs)
        loss = model.loss(out, gt)
        return loss, out
    return forward


def _alpha_positions(model, feats) -> int:
    if isinstance(model, AttentionCaptioner):
        return feats.shape[1]
    if _is_transformer_family(model):
        return feats.shape[1]
    return 1


def make_greedy_fn(model, max_steps: int) -> Callable:
    """(variables, images) → (tokens (B, L), alphas or None); fully jitted."""

    @jax.jit
    def run(variables, images):
        params = variables["params"]
        feats = model.apply(variables, images, method=model.encode)
        init_carry, step = make_step_fn(model, params)
        carry = init_carry(feats, max_steps)
        start = model.vocab_size + 1
        return decoding.greedy_decode(step, carry, images.shape[0], start,
                                      max_steps, collect_alphas=True)
    return run


def make_beam_fn(model, max_steps: int, beam_size: int,
                 use_logprobs: bool = False,
                 scan_unroll: Any = 1) -> Callable:
    """(variables, images) → BeamResult; fully jitted fixed-shape beam.
    `scan_unroll` unrolls the beam step scan (perf knob; identical
    results — see runs/bench results.jsonl decode experiments)."""

    @jax.jit
    def run(variables, images):
        params = variables["params"]
        feats = model.apply(variables, images, method=model.encode)
        init_carry, step = make_step_fn(model, params)
        feats_k = decoding.expand_for_beams(feats, beam_size)
        carry, step = _beam_invariant_step(init_carry, step, feats_k,
                                           max_steps)
        return decoding.beam_search(
            step, carry, images.shape[0], beam_size,
            start_token=model.vocab_size + 1,
            end_token=model.vocab_size + 2,
            max_steps=max_steps, use_logprobs=use_logprobs,
            collect_alphas=True,
            alpha_positions=_alpha_positions(model, feats),
            scan_unroll=scan_unroll)
    return run


def _make_region_step(model, params):
    """(init_carry, step) for GTDenseCaptioner-style per-region decode.
    LSTM heads carry (h, c) batch-major; transformer heads carry
    {enc, cache} like the AlexCap transformer family."""
    if model.use_lstm:
        def init_carry(flat_enc, max_steps):
            state = model.apply({"params": params}, flat_enc,
                                method=model.init_decode)
            return {"state": _lstm_carry_to_batch_major(state)}

        def step(carry, toks, t):
            state = _lstm_carry_from_batch_major(carry["state"])
            state, logits, alphas = model.apply(
                {"params": params}, state, toks, t,
                method=model.decode_step)
            return ({"state": _lstm_carry_to_batch_major(state)},
                    logits, alphas)
        return init_carry, step

    def init_carry(enc, max_steps):
        return {"enc": enc, "cache": init_cache(model, params, enc,
                                                max_steps)}

    def step(carry, toks, t):
        (enc, logits, alphas), mut = model.apply(
            {"params": params, "cache": carry["cache"]},
            carry["enc"], toks, t,
            method=model.decode_step, mutable=["cache"])
        return {"enc": enc, "cache": mut["cache"]}, logits, alphas
    return init_carry, step


def make_region_greedy_fn(model, max_steps: int) -> Callable:
    """(variables, images, boxes) → tokens (N*R, L); fully jitted greedy
    decode over every (padded) region in the batch — replaces the
    reference's per-image Python decode loops
    (`AlexGTModel/AlexDenseLangage.py:171-210`)."""

    @jax.jit
    def run(variables, images, boxes):
        params = variables["params"]
        flat_enc = model.apply(variables, images, boxes,
                               method=model.encode_flat)
        init_carry, step = _make_region_step(model, params)
        carry = init_carry(flat_enc, max_steps)
        start = model.spec.start
        toks, _ = decoding.greedy_decode(step, carry, flat_enc.shape[0],
                                         start, max_steps)
        return toks
    return run


def make_region_beam_fn(model, max_steps: int, beam_size: int,
                        use_logprobs: bool = True) -> Callable:
    """(variables, images, boxes) → BeamResult over N*R regions — the
    batched vectorized beam of `AlexDenseLangage.py:171-210`, fused.
    Defaults to LOG-PROB accumulation: both GT beams score with
    log-softmax (`AlexDenseLangage.py:178,195`, `AlexTransformer.py:311`),
    unlike the AlexCap families' raw-logit beams."""

    @jax.jit
    def run(variables, images, boxes):
        params = variables["params"]
        flat_enc = model.apply(variables, images, boxes,
                               method=model.encode_flat)
        init_carry, step = _make_region_step(model, params)
        enc_k = decoding.expand_for_beams(flat_enc, beam_size)
        carry, step = _beam_invariant_step(init_carry, step, enc_k,
                                           max_steps)
        return decoding.beam_search(
            step, carry, flat_enc.shape[0], beam_size,
            start_token=model.spec.start, end_token=model.spec.end,
            max_steps=max_steps, use_logprobs=use_logprobs)
    return run


class CaptioningModel:
    """Reference-contract facade: stateful wrapper over the pure API."""

    def __init__(self, model, variables, vocab, seq_length: int):
        self.model = model
        self.variables = variables
        self.vocab = vocab
        self.seq_length = seq_length
        self.use_beam = False
        self.beam_size = 3
        self.eval_mode = False
        self._fwd = jax.jit(functools.partial(make_forward_fn(model),
                                              train=False))
        self._greedy = make_greedy_fn(model, seq_length + 1)
        self._beams = {}
        # reference exposes decode via model.llm.decode_sequence
        self.llm = type("LLMShim", (), {})()
        self.llm.decode_sequence = self.decode_sequence

    def set_eval(self, value: bool):
        self.eval_mode = value

    def decode_sequence(self, seq):
        return self.vocab.decode_sequence(np.asarray(seq))

    @staticmethod
    def _unpack(data, gt):
        """Accept either (images, gt) positionals or the reference's
        data dict/edict with 'image'/'gt_labels' keys."""
        if gt is None and hasattr(data, "get"):
            return data["image"], data["gt_labels"]
        return data, gt

    def forward_train(self, data, gt=None):
        images, gt = self._unpack(data, gt)
        loss, _ = self._fwd(self.variables, images, gt)
        return loss

    def forward_test(self, data):
        images = data["image"] if (hasattr(data, "get")
                                   and not hasattr(data, "shape")) else data
        return self._forward_test(images)

    def _forward_test(self, images):
        if self.use_beam:
            if self.beam_size not in self._beams:
                self._beams[self.beam_size] = make_beam_fn(
                    self.model, self.seq_length + 1, self.beam_size)
            res = self._beams[self.beam_size](self.variables, images)
            best = res.tokens[:, 0]
            return self.decode_sequence(best), res.alphas[:, 0]
        toks, alphas = self._greedy(self.variables, images)
        return self.decode_sequence(toks), alphas
