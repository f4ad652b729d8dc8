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
    """Atomic checkpoint (orbax StandardCheckpointer). The new state is
    fully written to a sibling temp dir first, then swapped in with
    renames — a crash at any point leaves either the old or the new
    checkpoint restorable, never neither."""
    import shutil

    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    payload = {"state": _tree_to_numpy(state_as_dict(state))}
    if extra:
        payload["extra"] = _tree_to_numpy(extra)
    ckptr = ocp.StandardCheckpointer()
    tmp, old = path + ".tmp-save", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)        # orbax itself commits atomically
    ckptr.wait_until_finished()
    # only now is it safe to drop a leftover '.old' (it may be the sole
    # restorable checkpoint after a crash mid-swap)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def restore_checkpoint(path: str, state_template, extra_template=None):
    """Restore (state, extra). Tolerant in both directions: a checkpoint
    written without `extra` restores with extra=None, and one written
    WITH extra restores fine when the caller passes no (or a mismatched)
    `extra_template` — the extra payload is then returned as plain
    numpy trees (or dropped structure mismatches fall back entirely)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload_t = {"state": state_as_dict(state_template)}
    if extra_template is not None:
        try:
            restored = ckptr.restore(
                path, target={**payload_t, "extra": extra_template})
            return (state_from_dict(state_template, restored["state"]),
                    restored.get("extra"))
        except (ValueError, KeyError):
            pass        # stored without extra (or shape drift) — fall through
    try:
        restored = ckptr.restore(path, target=payload_t)
        return state_from_dict(state_template, restored["state"]), None
    except ValueError:
        # stored WITH extra but restored without a matching template:
        # template-free restore returns plain numpy trees.
        restored = ckptr.restore(path)
        return (state_from_dict(state_template, restored["state"]),
                restored.get("extra"))


def resume_path(save_path: str) -> Optional[str]:
    """Pick the checkpoint to resume from: the preemption checkpoint
    (`<save_path>.preempt`) when it is newer than the best-model
    checkpoint, else the best-model checkpoint, else None."""
    best = save_path if os.path.isdir(save_path) else None
    tmp = save_path + ".tmp-save"
    if os.path.isdir(tmp) and (
            best is None or os.path.getmtime(tmp) >= os.path.getmtime(best)):
        # The tmp dir exists only once orbax committed it (orbax writes
        # to its own staging dir and renames on finalize), so a
        # surviving tmp is a COMPLETE checkpoint. It coexists with the
        # main dir only in the crash window between orbax commit and
        # the rename swap — where it is strictly newer than the main
        # dir — and beats '.old' (the pre-swap state) for the same
        # reason. The mtime guard keeps the main dir preferred if a
        # stale tmp ever survives by other means.
        best = tmp
    if best is None and os.path.isdir(save_path + ".old"):
        best = save_path + ".old"   # crash mid-swap: old state survives
    pre = (save_path + ".preempt"
           if os.path.isdir(save_path + ".preempt") else None)
    if best and pre:
        return pre if os.path.getmtime(pre) >= os.path.getmtime(best) \
            else best
    return pre or best


def restore_params(path: str):
    """Inference-side restore: (params, batch_stats) only, no optimizer
    state — checkpoints stay loadable regardless of which optimizer
    configuration trained them."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    st = restored["state"]
    return st["params"], st.get("batch_stats") or {}


class SignalCheckpointer:
    """Preemption-safe checkpointing (SURVEY §5 'checkpoint-on-signal'):
    installs SIGTERM/SIGINT handlers that set a flag; the training loop
    checks `requested` at each step boundary and writes a full-state
    checkpoint before exiting. The reference has no failure handling —
    a crash means rerunning with `from_checkpoint=True` and replaying
    iterations (`traingt.py:42-51`)."""

    def __init__(self, signals=None):
        import signal as _signal
        self._signal = _signal
        self.requested = False
        self._prev = {}
        self.signals = signals or (_signal.SIGTERM, _signal.SIGINT)

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self.signals:
            try:
                self._prev[s] = self._signal.signal(s, self._handler)
            except (ValueError, OSError):   # non-main thread
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            try:
                self._signal.signal(s, prev)
            except (ValueError, OSError):
                pass
        return False

    def save_if_requested(self, path: str, state,
                          extra: Optional[Dict] = None) -> bool:
        if self.requested:
            save_checkpoint(path, state, extra)
        return self.requested


def state_as_dict(state) -> Dict[str, Any]:
    """TrainState (NamedTuple) ↔ plain dict for stable serialization."""
    if hasattr(state, "_asdict"):
        return dict(state._asdict())
    return dict(state)


def state_from_dict(template, d: Dict[str, Any]):
    if hasattr(template, "_replace"):
        return template._replace(**d)
    return d
