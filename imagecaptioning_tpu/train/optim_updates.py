"""Hand-rolled optimizer updates as pure pytree functions — the
reference ships these as in-place tensor updates in
`DenseCap/densecap/optim_updates.py:1-57` (unused by its drivers, which
call torch.optim; kept here for inventory parity and as the functional
TPU form: each update is `(params, grads, state) -> (params, state)` on
arbitrary pytrees, jit-able and donation-friendly).

Math per the reference:
- sgd:    x -= lr * dx
- sgdm:   v = a*v + lr*dx;              x -= v
- sgdmom: m' = a*m - lr*dx;             x += -a*m + (1+a)*m'   (Nesterov)
- adagrad: G += dx^2;                   x -= lr * dx / (sqrt(G)+eps)
- rmsprop: G = a*G + (1-a)*dx^2;        x -= lr * dx / (sqrt(G)+eps)
- adam:   standard bias-corrected Adam with eps *inside* the sqrt'd
  denominator added after the sqrt (matching the reference's
  `sqrt().add_(eps)` order, which equals torch.optim.Adam's).

The production path is optax (`train/optim.py`); these exist so every
reference component has a first-class functional equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _map(fn, *trees):
    return jax.tree.map(fn, *trees)


def _zeros_like(tree):
    return _map(jnp.zeros_like, tree)


def sgd(params, grads, lr):
    return _map(lambda x, dx: x - lr * dx, params, grads)


def sgdm_init(params):
    return {"v": _zeros_like(params)}


def sgdm(params, grads, state, lr, alpha=0.9):
    v = _map(lambda v, dx: alpha * v + lr * dx, state["v"], grads)
    return _map(lambda x, v: x - v, params, v), {"v": v}


def sgdmom_init(params):
    return {"m": _zeros_like(params)}


def sgdmom(params, grads, state, lr, alpha=0.9):
    """Nesterov momentum: x += -a*m_old + (1+a)*m_new with
    m_new = a*m_old - lr*dx (reference sgdmom, optim_updates.py:14-21)."""
    m_old = state["m"]
    m = _map(lambda m, dx: alpha * m - lr * dx, m_old, grads)
    params = _map(lambda x, mo, mn: x - alpha * mo + (1 + alpha) * mn,
                  params, m_old, m)
    return params, {"m": m}


def adagrad_init(params):
    return {"m": _zeros_like(params)}


def adagrad(params, grads, state, lr, epsilon=1e-10):
    m = _map(lambda m, dx: m + dx * dx, state["m"], grads)
    params = _map(lambda x, dx, m: x - lr * dx / (jnp.sqrt(m) + epsilon),
                  params, grads, m)
    return params, {"m": m}


def rmsprop_init(params):
    return {"m": _zeros_like(params)}


def rmsprop(params, grads, state, lr, alpha=0.99, epsilon=1e-8):
    m = _map(lambda m, dx: alpha * m + (1 - alpha) * dx * dx,
             state["m"], grads)
    params = _map(lambda x, dx, m: x - lr * dx / (jnp.sqrt(m) + epsilon),
                  params, grads, m)
    return params, {"m": m}


def adam_init(params):
    return {"t": jnp.zeros((), jnp.int32),
            "m": _zeros_like(params), "v": _zeros_like(params)}


def adam(params, grads, state, lr, beta1=0.9, beta2=0.999, epsilon=1e-8):
    t = state["t"] + 1
    m = _map(lambda m, dx: beta1 * m + (1 - beta1) * dx,
             state["m"], grads)
    v = _map(lambda v, dx: beta2 * v + (1 - beta2) * dx * dx,
             state["v"], grads)
    bc1 = 1 - beta1 ** t.astype(jnp.float32)
    bc2 = 1 - beta2 ** t.astype(jnp.float32)
    step_size = lr * jnp.sqrt(bc2) / bc1
    params = _map(lambda x, m, v: x - step_size * m / (jnp.sqrt(v) + epsilon),
                  params, m, v)
    return params, {"t": t, "m": m, "v": v}
