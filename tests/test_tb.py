"""Optional TensorBoard channel: events written when a dir is given,
exact no-op when off, and the training driver emits through it."""

import glob
import os

from imagecaptioning_tpu.utils.tb import TBWriter


def test_noop_when_disabled():
    tb = TBWriter("")
    assert not tb.active
    tb.scalar("x", 1.0, 0)          # must not raise
    tb.scalars({"a": 1, "b": {"nested": 2}, "c": None}, 0)
    tb.flush(); tb.close()


def test_writes_event_file(tmp_path):
    logdir = str(tmp_path / "tb")
    tb = TBWriter(logdir)
    if not tb.active:                # torch TB backend unavailable: no-op ok
        return
    tb.scalar("train/loss", 3.14, 1)
    tb.scalars({"meteor": 0.4, "breakdown": {"x": 1}, "note": "s"}, 2,
               prefix="val/")
    tb.close()
    assert glob.glob(os.path.join(logdir, "events.out.tfevents.*"))


def test_driver_emits_tensorboard(tmp_path):
    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.train import driver

    logdir = str(tmp_path / "tbdrv")
    if not TBWriter(logdir).active:
        return
    cfg = get_lstm_config().replace(
        batch_size=2, num_epochs=1, save_checkpoint_every=4,
        lstm_size=16, embedding_size=16,
        compute_dtype="float32", use_beam=False,
        tensorboard_dir=logdir,
        data_h5="/nonexistent.h5", data_json="/nonexistent.json",
        loss_file=str(tmp_path / "l.json"),
        result_file=str(tmp_path / "r.json"),
        save_path=str(tmp_path / "m.ckpt"))
    driver.train(cfg, max_iter_override=2, eval_every_override=2,
                 synthetic_images=4, verbose=False)
    assert glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
