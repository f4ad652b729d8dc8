"""Honor an explicit JAX_PLATFORMS env var at process start.

The TPU-tunnel image boots interpreters through a sitecustomize that
force-sets `jax_platforms` to the tunnel backend BEFORE user code runs,
so `JAX_PLATFORMS=cpu python train_LSTM.py` would otherwise still try
to initialize the (possibly down) TPU relay and hang. Every CLI entry
point calls this once, before anything touches `jax.devices()`.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply the JAX_PLATFORMS env var over a sitecustomize preset.

    No-op when the env var is unset or already in effect. Must run
    before the backend initializes (jax.config raises RuntimeError
    afterwards — swallowed, since by then the user's choice already
    won or the backend is live anyway).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if (jax.config.jax_platforms or "") != want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass
