"""Jitted train/eval steps — the framework's hot loop.

The reference's iteration does zero_grad → get_batch → forward (with
`loss.backward()` inside the model!) → clip → Adam step, all eagerly on
one GPU (`train_LSTM.py:77-109`). Here the entire iteration — on-device
uint8 preprocessing, encoder+decoder forward, backward, clip, optimizer
update — is ONE compiled XLA program, donated in place, optionally
sharded over a device mesh (data-parallel on 'data', tensor-parallel
rules on 'model').
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagecaptioning_tpu.data import transforms
from imagecaptioning_tpu.models.api import make_forward_fn


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array


def create_train_state(model, tx, images, gt, seed: int = 123) -> Tuple[TrainState, Any]:
    """Init model + optimizer. Returns (state, static model variables
    besides params — i.e. batch_stats if present). Both inits run as
    single jitted programs: eager init dispatches every op separately —
    minutes through a remote TPU relay (measured 165 s for ResNet-101)
    vs one compile + one execute jitted."""
    root = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(root, 3)
    variables = jax.jit(partial(model.init, train=True))(
        {"params": p_rng, "dropout": d_rng}, images, gt)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = jax.jit(tx.init)(params)
    return TrainState(jnp.array(0, jnp.int32), params, opt_state,
                      batch_stats, s_rng), variables


def make_train_step(model, tx,
                    preprocess: Optional[Callable] = None) -> Callable:
    """(state, images_u8, gt) → (state, metrics). Preprocessing (uint8 →
    normalized float) runs inside the step so XLA fuses it with conv1."""
    forward = make_forward_fn(model)

    def train_step(state: TrainState, images, gt):
        rng, step_rng = jax.random.split(state.rng)
        x = preprocess(images) if preprocess is not None else images

        def loss_fn(params):
            # torch train-mode BN during finetuning: batch statistics in
            # the forward, running stats updated (the model only actually
            # mutates them when its encoder is unfrozen); apply_train is
            # the single implementation of that threading.
            from imagecaptioning_tpu.models.api import apply_train
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, new_stats = apply_train(model, variables, x, gt,
                                         rngs={"dropout": step_rng})
            loss = model.loss(out, gt)
            return loss, (new_stats if state.batch_stats
                          else state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state,
                               new_stats, rng)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_eval_step(model, preprocess: Optional[Callable] = None) -> Callable:
    """(state, images_u8, gt) → eval-mode loss (no dropout, no update)."""
    forward = make_forward_fn(model)

    def eval_step(state: TrainState, images, gt):
        x = preprocess(images) if preprocess is not None else images
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        loss, _ = forward(variables, x, gt, train=False)
        return loss

    return eval_step


def shard_train_step(train_step: Callable, mesh: Mesh,
                     param_shardings=None, state_template=None) -> Callable:
    """jit the step with batch sharded on 'data' and state sharded per
    `param_shardings` (replicated by default). Donates the state buffer."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    if param_shardings is None or state_template is None:
        state_shardings = None
        in_shardings = (None, data, data)
        out_shardings = None
    else:
        def like_params(tree):
            return jax.tree.map(lambda _: repl, tree)
        state_shardings = TrainState(
            step=repl,
            params=param_shardings,
            opt_state=jax.tree.map(
                lambda leaf: repl, state_template.opt_state),
            batch_stats=like_params(state_template.batch_stats),
            rng=repl)
        in_shardings = (state_shardings, data, data)
        out_shardings = (state_shardings, None)

    return jax.jit(train_step, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=(0,))
