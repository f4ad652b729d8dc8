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
