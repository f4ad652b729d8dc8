"""Atomic checkpoint/resume via orbax.

The reference saves only `model.state_dict()` on each new-best val
score and resumes by re-reading weights + JSON histories, replaying
iterations from `best_iter` and losing optimizer/scheduler state
(`train_LSTM.py:31-39,122-125`; SURVEY §5). Here a checkpoint carries
the complete training state — params, optimizer state, step counter,
PRNG key, batch stats and loader cursor — so resume is exact.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, extra: Optional[Dict] = None) -> None:
    """Atomic single-file checkpoint (orbax StandardCheckpointer)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    payload = {"state": _tree_to_numpy(state_as_dict(state))}
    if extra:
        payload["extra"] = _tree_to_numpy(extra)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state_template, extra_template=None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    payload_t = {"state": state_as_dict(state_template)}
    if extra_template is not None:
        payload_t["extra"] = extra_template
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=payload_t)
    state = state_from_dict(state_template, restored["state"])
    if extra_template is not None:
        return state, restored.get("extra")
    return state, None


def state_as_dict(state) -> Dict[str, Any]:
    """TrainState (NamedTuple) ↔ plain dict for stable serialization."""
    if hasattr(state, "_asdict"):
        return dict(state._asdict())
    return dict(state)


def state_from_dict(template, d: Dict[str, Any]):
    if hasattr(template, "_replace"):
        return template._replace(**d)
    return d
