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


def test_resume_path_prefers_newer_tmp_save_over_main(tmp_path):
    """Crash window between orbax commit and rename(path, old): BOTH the
    main dir (one save stale) and '.tmp-save' (newest, committed)
    survive — the newer tmp must win, not the stale main dir."""
    import time as _time
    state = _tiny_state()
    best = str(tmp_path / "best.ckpt")
    ckptlib.save_checkpoint(best, state)                    # stale best
    _time.sleep(0.05)
    newer = TrainState(jnp.array(7, jnp.int32), state.params,
                       state.opt_state, {}, state.rng)
    ckptlib.save_checkpoint(best + ".tmp-save", newer)      # committed tmp
    assert ckptlib.resume_path(best) == best + ".tmp-save"
    restored, _ = ckptlib.restore_checkpoint(ckptlib.resume_path(best),
                                             _tiny_state())
    assert int(restored.step) == 7


def test_resume_path_prefers_tmp_save_over_old(tmp_path):
    """Crash window between rename(path, old) and rename(tmp, path):
    both '.old' and '.tmp-save' exist, no main dir. '.tmp-save' is the
    newer fully-committed checkpoint and must win (ADVICE round 1)."""
    state = _tiny_state()
    best = str(tmp_path / "best.ckpt")
    ckptlib.save_checkpoint(best + ".old", state)           # stale state
    newer = TrainState(jnp.array(9, jnp.int32), state.params,
                       state.opt_state, {}, state.rng)
    ckptlib.save_checkpoint(best + ".tmp-save", newer)      # committed tmp
    assert ckptlib.resume_path(best) == best + ".tmp-save"
    restored, _ = ckptlib.restore_checkpoint(ckptlib.resume_path(best),
                                             _tiny_state())
    assert int(restored.step) == 9


def test_driver_restores_handlers_on_exception(tmp_path, monkeypatch):
    """An exception mid-train-loop must restore the SIGTERM/SIGINT
    handlers (exception-safe teardown, VERDICT round 1 weak #6)."""
    import pytest

    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.train import dense_driver

    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)

    def boom(*a, **k):
        raise RuntimeError("eval exploded")

    monkeypatch.setattr(dense_driver.dense_eval, "eval_split_gt", boom)
    cfg = get_gt_config().replace(
        data_h5=str(tmp_path / "missing.h5"),
        data_json=str(tmp_path / "missing.json"),
        save_path=str(tmp_path / "models/best_gt.ckpt"),
        loss_file=str(tmp_path / "loss_logs/loss_gt.json"),
        result_file=str(tmp_path / "logs/results_gt.json"),
        batch_size=2, max_regions=3, rnn_size=32, use_lstm=True,
        input_encoding_size=32, compute_dtype="float32",
        eval_batch_size=2, loss_log_pad=1, vgg_stages=2)
    with pytest.raises(RuntimeError, match="eval exploded"):
        dense_driver.train_gt(cfg, max_iter_override=2,
                              eval_every_override=1,
                              synthetic_images=8,
                              synthetic_image_size=64, verbose=False)
    assert signal.getsignal(signal.SIGTERM) == prev_term
    assert signal.getsignal(signal.SIGINT) == prev_int
