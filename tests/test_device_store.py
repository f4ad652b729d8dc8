"""Device-resident dataset path (`data/device_store.py`): the HBM-staged
store + in-jit index gather must be *exactly* the streaming
loader→prefetch→device_put path, batch for batch and loss for loss —
both are driven by `epoch_position_batches`, so any drift is a bug.

Reference context: the reference's step time includes its host loader
(`train_LSTM.py:77-90`); the resident path is the TPU-native answer to
that cost (one staging transfer, then 512 B of indices per step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioning_tpu.data import device_store, synthetic
from imagecaptioning_tpu.data.loader import AlexDataLoader


def make_loader(n=16, seed=0):
    arrays, info = synthetic.make_face2text_arrays(num_images=n, seed=seed)
    return AlexDataLoader(arrays=arrays, info=info, seed=123)


class TestBatchOrderEquivalence:
    @pytest.mark.parametrize("shuffle", [False, True])
    def test_positions_reproduce_epoch_batches(self, shuffle):
        a, b = make_loader(), make_loader()
        bs = 4
        stream = list(a.epoch_batches(0, bs, shuffle=shuffle))
        imgs_np, labels_np = b.resident_arrays(0)
        pos = list(b.epoch_position_batches(0, bs, shuffle=shuffle))
        assert len(stream) == len(pos) > 0
        for (si, sl), p in zip(stream, pos):
            np.testing.assert_array_equal(si, imgs_np[p])
            np.testing.assert_array_equal(sl, labels_np[p])

    def test_start_cursor(self):
        a, b = make_loader(), make_loader()
        stream = list(a.epoch_batches(0, 3, start=5))
        imgs_np, labels_np = b.resident_arrays(0)
        pos = list(b.epoch_position_batches(0, 3, start=5))
        for (si, sl), p in zip(stream, pos):
            np.testing.assert_array_equal(si, imgs_np[p])
            np.testing.assert_array_equal(sl, labels_np[p])

    def test_index_stream_wraps_epochs(self):
        ldr = make_loader()
        n_train = len(ldr.split_ix[0])
        per_epoch = n_train // 4
        it = device_store.index_stream(ldr, 0, 4, iterate=True)
        batches = [next(it) for _ in range(2 * per_epoch)]
        # sequential mode: epoch 2 repeats epoch 1 exactly
        for i in range(per_epoch):
            np.testing.assert_array_equal(batches[i], batches[per_epoch + i])


class TestResidentStep:
    def test_gather_matches_host_indexing(self):
        ldr = make_loader()
        store = device_store.stage_split(ldr, 0)
        imgs_np, labels_np = ldr.resident_arrays(0)
        idx = jnp.asarray([3, 0, 5, 2], jnp.int32)
        gi, gl = device_store.gather_batch(store, idx)
        np.testing.assert_array_equal(np.asarray(gi), imgs_np[[3, 0, 5, 2]])
        np.testing.assert_array_equal(np.asarray(gl), labels_np[[3, 0, 5, 2]])

    def test_fits_without_budget(self):
        assert device_store.fits(10**12, budget=None) in (True, False)
        assert device_store.fits(100, budget=1000)
        assert not device_store.fits(1000, budget=100)

    def test_sharded_resident_step_runs_on_mesh(self):
        """Index batch sharded on 'data', store replicated: one step of
        a real captioner over the 8-device CPU mesh."""
        from imagecaptioning_tpu.models.captioners import LSTMCaptioner
        from imagecaptioning_tpu.parallel import mesh as meshlib
        from imagecaptioning_tpu.train import step as steplib
        import optax

        ldr = make_loader()
        mesh = meshlib.mesh_for_batch(8)
        store = device_store.stage_split(ldr, 0, mesh=mesh)
        model = LSTMCaptioner(vocab_size=ldr.getVocabSize(),
                              embedding_size=16, rnn_size=16,
                              backbone_stages=(1, 1, 1, 1),
                              compute_dtype=jnp.float32)
        tx = optax.adam(1e-3)
        imgs, labels = device_store.gather_batch(
            store, jnp.arange(8, dtype=jnp.int32))
        from imagecaptioning_tpu.data import transforms
        pre = lambda u8: transforms.resnet_v2_preprocess(  # noqa: E731
            u8, dtype=jnp.float32)
        state, _ = steplib.create_train_state(model, tx, pre(imgs), labels)
        step = device_store.shard_resident_train_step(
            device_store.make_resident_train_step(
                steplib.make_train_step(model, tx, preprocess=pre)), mesh)
        new_state, metrics = step(state, store,
                                  np.arange(8, dtype=np.int32))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


class TestDriverEquivalence:
    def test_resident_equals_streaming_losses(self, tmp_path):
        """driver.train with device_resident_data on vs off: identical
        batches + identical RNG ⇒ identical per-step losses."""
        from imagecaptioning_tpu.config import get_lstm_config
        from imagecaptioning_tpu.train import driver

        def run(mode, tag):
            cfg = get_lstm_config().replace(
                batch_size=2, num_epochs=1, save_checkpoint_every=4,
                lstm_size=16, embedding_size=16,
                backbone_stages=(1, 1, 1, 1),
                compute_dtype="float32", use_beam=False,
                device_resident_data=mode, iterate=True,
                data_h5="/nonexistent.h5", data_json="/nonexistent.json",
                loss_file=str(tmp_path / f"l_{tag}.json"),
                result_file=str(tmp_path / f"r_{tag}.json"),
                save_path=str(tmp_path / f"m_{tag}.ckpt"))
            return driver.train(cfg, max_iter_override=3,
                                eval_every_override=100,
                                synthetic_images=8, verbose=False)

        on = run("on", "on")
        off = run("off", "off")
        assert on["final_loss"] == pytest.approx(off["final_loss"],
                                                 rel=1e-5)
