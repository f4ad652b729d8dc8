"""Profiling utils + detection-only (RoiModel) path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioning_tpu.config.dense_configs import get_densecap_config
from imagecaptioning_tpu.data import synthetic
from imagecaptioning_tpu.data.vg_loader import VGDataLoader, normalize_images
from imagecaptioning_tpu.train import dense_driver
from imagecaptioning_tpu.utils.profiling import StepTimer, trace


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["steps"] == 3 and s["mean_ms"] >= 0
    assert np.isfinite(t.last_ms)


def test_trace_noop():
    with trace(None):
        pass
    with trace(""):
        pass


def test_roi_only_model_four_losses():
    arrays, info = synthetic.make_vg_arrays(num_images=4, image_size=96,
                                            seed=5)
    loader = VGDataLoader(arrays=arrays, info=info)
    cfg = get_densecap_config().replace(
        roi_only=True, sampler_batch_size=8, test_num_proposals=10,
        rnn_size=16, input_encoding_size=16, compute_dtype="float32",
        max_regions=2, vgg_stages=3)
    model = dense_driver.build_rpn_model(cfg, loader.getVocabSize(),
                                         loader.getSeqLength())
    assert not model.with_captioning
    b = next(loader.padded_batches(0, 1, max_regions=2))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "sampling": rng},
        normalize_images(b["image"]), jnp.asarray(b["boxes"]),
        jnp.asarray(b["box_mask"]), jnp.asarray(b["labels"]), train=True)
    loss_dict = model.apply(
        variables, normalize_images(b["image"]), jnp.asarray(b["boxes"]),
        jnp.asarray(b["box_mask"]), jnp.asarray(b["labels"]), train=True,
        rngs={"dropout": rng, "sampling": rng})
    assert "captioning" not in loss_dict
    assert "box_decay" in loss_dict          # recorded, excluded from total
    four = (loss_dict["mid_objectness"] + loss_dict["mid_box_reg"]
            + loss_dict["end_objectness"] + loss_dict["end_box_reg"])
    np.testing.assert_allclose(float(loss_dict["total"]), float(four),
                               rtol=1e-6)
    # no caption-head params created
    assert "llm" not in variables["params"]


def test_setup_factory_builds_each_family():
    arrays, info = synthetic.make_vg_arrays(num_images=4, image_size=64,
                                            seed=6)
    loader = VGDataLoader(arrays=arrays, info=info)
    cfg = get_densecap_config().replace(roi_only=True)
    m, st = dense_driver.setup(cfg, loader.getVocabSize(),
                               loader.getSeqLength())
    assert not m.with_captioning and st is None
    cfg2 = cfg.replace(model_type="gt", roi_only=False)
    m2, _ = dense_driver.setup(cfg2, loader.getVocabSize(),
                               loader.getSeqLength())
    from imagecaptioning_tpu.models.densecap import GTDenseCaptioner
    assert isinstance(m2, GTDenseCaptioner)
