"""SignalCheckpointer (preemption-safe checkpointing) tests."""

import os
import signal

import jax.numpy as jnp
import numpy as np

from imagecaptioning_tpu.train.step import TrainState
from imagecaptioning_tpu.utils import checkpoint as ckptlib


def _tiny_state():
    import jax
    return TrainState(jnp.array(3, jnp.int32),
                      {"w": jnp.ones((2, 2))}, {"m": jnp.zeros((2, 2))},
                      {}, jax.random.PRNGKey(0))


def test_signal_sets_flag_and_saves(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "preempt.ckpt")
    with ckptlib.SignalCheckpointer(signals=(signal.SIGUSR1,)) as sig:
        assert not sig.requested
        assert not sig.save_if_requested(path, state)
        os.kill(os.getpid(), signal.SIGUSR1)
        assert sig.requested
        assert sig.save_if_requested(path, state)
    assert os.path.isdir(path)
    restored, _ = ckptlib.restore_checkpoint(path, _tiny_state())
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.ones((2, 2)))


def test_handler_restored_on_exit():
    prev = signal.getsignal(signal.SIGUSR1)
    with ckptlib.SignalCheckpointer(signals=(signal.SIGUSR1,)):
        assert signal.getsignal(signal.SIGUSR1) != prev
    assert signal.getsignal(signal.SIGUSR1) == prev


def test_resume_path_prefers_newer_preempt(tmp_path):
    import time as _time
    state = _tiny_state()
    best = str(tmp_path / "best.ckpt")
    ckptlib.save_checkpoint(best, state)
    assert ckptlib.resume_path(best) == best
    _time.sleep(0.05)
    ckptlib.save_checkpoint(best + ".preempt", state)
    assert ckptlib.resume_path(best) == best + ".preempt"
    assert ckptlib.resume_path(str(tmp_path / "missing.ckpt")) is None


def test_save_overwrite_is_atomic(tmp_path):
    """Overwriting a checkpoint writes to a temp dir then swaps via
    renames: no .tmp-save/.old leftovers on success, and a simulated
    crash mid-swap (only .old present) still resumes."""
    import os
    import shutil

    import jax

    def _state(v):
        return TrainState(jnp.array(3, jnp.int32),
                          {"w": jnp.full((2, 2), v)},
                          {"m": jnp.zeros((2, 2))}, {},
                          jax.random.PRNGKey(0))

    path = str(tmp_path / "model.ckpt")
    s1 = _state(1.0)
    ckptlib.save_checkpoint(path, s1)
    s2 = _state(2.0)
    ckptlib.save_checkpoint(path, s2)          # overwrite
    restored, _ = ckptlib.restore_checkpoint(path, _state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    assert not os.path.exists(path + ".tmp-save")
    assert not os.path.exists(path + ".old")
    # simulate the crash window: new dir gone, .old remains
    os.rename(path, path + ".old")
    assert ckptlib.resume_path(path) == path + ".old"
    restored, _ = ckptlib.restore_checkpoint(ckptlib.resume_path(path),
                                             _state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)


def test_restore_with_extra_but_no_template(tmp_path):
    """A checkpoint saved WITH extra restores when the caller passes no
    extra_template (e.g. dense setup() restoring an AlexCap-driver
    checkpoint) — falls back to a template-free restore."""
    path = str(tmp_path / "m.ckpt")
    state = _tiny_state()
    ckptlib.save_checkpoint(path, state, extra={"iterators": {0: 5}})
    restored, extra = ckptlib.restore_checkpoint(path, _tiny_state())
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))
    assert int(extra["iterators"]["0"]) == 5
