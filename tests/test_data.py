"""Data layer: synthetic schema, loader iteration semantics, transforms."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagecaptioning_tpu.data import synthetic, transforms
from imagecaptioning_tpu.data.loader import AlexDataLoader, prefetch_batches


@pytest.fixture(scope="module")
def loader():
    arrays, info = synthetic.make_face2text_arrays(num_images=20,
                                                   seq_length=10, seed=0)
    return AlexDataLoader(arrays=arrays, info=info)


def test_schema_fields(loader):
    assert loader.images.shape == (20, 218, 178, 3)
    assert loader.labels.dtype == np.int32
    assert loader.getSeqLength() == 10
    assert loader.getVocabSize() == len(loader.info["idx_to_token"])
    assert set(np.unique(loader.split)) <= {0, 1, 2}
    assert loader.attributes.shape == (20, 40)


def test_get_batch_iterate_wraps(loader):
    loader.reset_iterator(0)
    n_train = len(loader.split_ix[0])
    bs = 4
    img, labels, info, attrs = loader.get_batch({"split": 0, "iterate": True},
                                                bs)
    assert img.shape == (bs, 218, 178, 3)
    assert labels.shape == (bs, 10)
    assert (attrs >= 0).all()   # clamped
    assert info[0]["split_bounds"][1] == n_train
    # iterate until wrap: iterator returns to 0
    loader.reset_iterator(0)
    for _ in range((n_train // bs) + 1):
        loader.get_batch({"split": 0, "iterate": True}, bs)
    assert loader.iterators[0] < n_train


def test_get_batch_random_sampling(loader):
    img, labels, _, _ = loader.get_batch({"split": 0, "iterate": False}, 5)
    assert img.shape[0] == 5 and labels.shape[0] == 5


def test_epoch_batches_cover_split(loader):
    bs = 3
    seen = 0
    for img, labels in loader.epoch_batches(1, bs):
        assert img.shape[0] == bs
        seen += bs
    assert seen == (len(loader.split_ix[1]) // bs) * bs


def test_prefetch_preserves_order(loader):
    direct = [lab.sum() for _, lab in loader.epoch_batches(0, 4)]
    pref = [np.asarray(lab).sum() for _, lab in
            prefetch_batches(loader.epoch_batches(0, 4))]
    assert direct == pref


def test_resnet_v2_preprocess_matches_torchvision_semantics():
    """Pin shape/normalization; resize interpolation differs by <2% from
    torch's antialiased bilinear (different kernel phase), so compare
    against torch's own resize+crop+normalize within tolerance."""
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, size=(2, 218, 178, 3), dtype=np.uint8)
    out = transforms.resnet_v2_preprocess(jnp.asarray(u8))
    assert out.shape == (2, 224, 224, 3)

    x = torch.from_numpy(u8.transpose(0, 3, 1, 2)).float() / 255.0
    # short side 178 → 232: new size (284, 232)
    resized = F.interpolate(x, size=(284, 232), mode="bilinear",
                            antialias=True)
    top = (284 - 224) // 2
    left = (232 - 224) // 2
    cropped = resized[:, :, top:top + 224, left:left + 224]
    mean = torch.tensor(transforms.IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(transforms.IMAGENET_STD).view(1, 3, 1, 1)
    want = ((cropped - mean) / std).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(out)
    # interpolation kernels differ slightly; mean abs error must be small
    assert np.abs(got - want).mean() < 0.03
    np.testing.assert_allclose(got.mean(), want.mean(), atol=0.01)


def test_h5_roundtrip(tmp_path):
    h5 = str(tmp_path / "f.h5")
    js = str(tmp_path / "f.json")
    synthetic.write_face2text_h5(h5, js, num_images=8, seq_length=6)
    loader = AlexDataLoader(data_h5=h5, data_json=js)
    assert loader.num_images == 8
    img, labels, _, _ = loader.get_batch({"split": 0, "iterate": True}, 2)
    assert img.shape == (2, 218, 178, 3) and labels.shape == (2, 6)


def test_vg_arrays_schema():
    arrays, info = synthetic.make_vg_arrays(num_images=4,
                                            regions_per_image=3)
    assert arrays["images"].shape[-1] == 3         # HWC like reference
    assert arrays["images"].shape[1] == arrays["images"].shape[2]
    assert arrays["boxes"].shape == (12, 4)
    assert arrays["img_to_first_box"][0] == 1      # 1-indexed slabs
    assert (arrays["img_to_last_box"] - arrays["img_to_first_box"] == 2).all()
    # boxes inside the image
    s = arrays["images"].shape[1]
    x1 = arrays["boxes"][:, 0] - arrays["boxes"][:, 2] / 2
    assert (x1 >= 0).all()


def test_epoch_batches_start_cursor():
    """`start` resumes a sequential epoch mid-stream (driver resume)."""
    from imagecaptioning_tpu.train import driver as driverlib

    arrays, info = synthetic.make_face2text_arrays(num_images=24, seed=3)
    loader = AlexDataLoader(arrays=arrays, info=info)
    bs = 2
    full = list(loader.epoch_batches(0, bs))
    resumed = list(loader.epoch_batches(0, bs, start=2 * bs))
    assert len(resumed) == len(full) - 2
    for (gi, gl), (wi, wl) in zip(resumed, full[2:]):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_array_equal(gl, wl)

    class _Cfg:
        iterate = True

    # endless iterator: cursor applies to the first epoch only
    it = driverlib._batch_iterator(loader, _Cfg(), bs,
                                   start_images=2 * bs)
    for want_i, _ in full[2:] + full:
        got_i, _ = next(it)
        np.testing.assert_array_equal(got_i, want_i)
