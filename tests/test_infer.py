"""infer.py serving-CLI regression: train → checkpoint → caption files."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer")
    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.data import synthetic
    from imagecaptioning_tpu.train.driver import train

    synthetic.write_face2text_h5(str(root / "f.h5"), str(root / "f.json"),
                                 num_images=10, seq_length=6)
    cfg = get_lstm_config().replace(
        data_h5=str(root / "f.h5"), data_json=str(root / "f.json"),
        batch_size=4, save_checkpoint_every=8, num_epochs=1,
        eval_val_batch_size=2, compute_dtype="float32",
        lstm_size=32, embedding_size=32,
        save_path=str(root / "models/best.ckpt"),
        loss_file=str(root / "loss.json"),
        result_file=str(root / "results.json"))
    out = train(cfg, max_iter_override=1, eval_every_override=1,
                verbose=False)
    imdir = root / "photos"
    imdir.mkdir()
    import h5py
    with h5py.File(root / "f.h5") as f:
        for i in range(2):
            Image.fromarray(f["images"][i]).save(str(imdir / f"i{i}.jpg"))
    return root, out["save_path"], str(imdir)


def test_infer_greedy_and_beam(trained):
    import infer
    root, ckpt, imdir = trained
    common = ["--model-type", "lstm", "--ckpt", ckpt,
              "--dicts", str(root / "f.json"), "--images", imdir,
              "--seq-length", "6",
              "--set", "lstm_size=32", "embedding_size=32",
              "compute_dtype=float32"]
    res = infer.main(common + ["--out", str(root / "caps.json")])
    assert len(res) == 2 and all(isinstance(c, str) for c in res.values())
    assert os.path.exists(root / "caps.json")
    with open(root / "caps.json") as f:
        assert json.load(f) == res
    res_beam = infer.main(common + ["--beam", "2"])
    assert len(res_beam) == 2


def test_restore_params_shapes(trained):
    from imagecaptioning_tpu.utils.checkpoint import restore_params
    root, ckpt, imdir = trained
    params, batch_stats = restore_params(ckpt)
    assert "llm" in params and "features" in params
    assert batch_stats                      # ResNet BN running stats
    leaf = next(iter(np.asarray(v) for v in
                     jax_leaves(params)))
    assert np.isfinite(leaf).all()


def jax_leaves(tree):
    import jax
    return jax.tree.leaves(tree)


@pytest.fixture(scope="module")
def trained_dense(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer_gt")
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.train import dense_driver
    from imagecaptioning_tpu.utils import checkpoint as ckptlib

    cfg = get_gt_config().replace(
        batch_size=2, max_regions=3, vgg_stages=2, use_lstm=True,
        save_checkpoint_every=2, compute_dtype="float32",
        input_encoding_size=32, rnn_size=32,
        save_path=str(root / "gt.ckpt"),
        loss_file=str(root / "loss.json"),
        result_file=str(root / "results.json"))
    out = dense_driver.train_gt(cfg, max_iter_override=2,
                                eval_every_override=2,
                                synthetic_images=8, verbose=False)
    # eval may not have saved (map can be 0); write the state explicitly
    ckptlib.save_checkpoint(str(root / "gt.ckpt"), out["state"])
    # dicts JSON for the synthetic VG vocab
    loader = out["loader"]
    dicts = {"token_to_idx": loader.vocab.token_to_idx,
             "idx_to_token": {str(v): k for k, v
                              in loader.vocab.token_to_idx.items()}}
    with open(root / "dicts.json", "w") as f:
        json.dump(dicts, f)
    imdir = root / "photos"
    imdir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(str(imdir / f"d{i}.jpg"))
    return root, str(imdir), out

def test_infer_dense_regions(trained_dense):
    import infer
    root, imdir, out = trained_dense
    res = infer.main([
        "--model-type", "gt", "--ckpt", str(root / "gt.ckpt"),
        "--dicts", str(root / "dicts.json"), "--images", imdir,
        "--seq-length", str(out["loader"].getSeqLength()),
        "--max-regions", "4",
        "--set", "vgg_stages=2", "input_encoding_size=32",
        "rnn_size=32", "use_lstm=true"])
    assert len(res) == 2
    for rec in res.values():
        regions = rec["regions"]
        assert regions and all("caption" in r and len(r["box_xcycwh"]) == 4
                               for r in regions)
        # boxes are reported in the ORIGINAL image's pixel frame (the
        # source images are 120x160; the resized canvas is ~700x933) and
        # the record carries the resize scale (ADVICE r1)
        assert rec["resize"]["raw_hw"] == [120, 160]
        assert rec["resize"]["sx"] > 1.0
        for r in regions:
            xc, yc, w, h = r["box_xcycwh"]
            assert 0 <= xc <= 160 and 0 <= yc <= 120
