"""Visualization layer tests (host-side, Agg backend)."""

import os

import numpy as np

from imagecaptioning_tpu.utils import visualize


def test_display_logs(tmp_path):
    hist = [{"iter": (i + 1) * 100, "loss_results": 2.0 - 0.1 * i,
             "ap_results": {"meteor": 0.2 + 0.02 * i}} for i in range(5)]
    path = visualize.display_logs(hist, "unit_model", out_dir=str(tmp_path))
    assert path and os.path.exists(path)


def test_bilinear_upsample_identity_corner_alignment():
    g = np.array([[0.0, 1.0], [2.0, 3.0]])
    up = visualize.bilinear_upsample(g, 4)
    assert up.shape == (8, 8)
    # corners preserved (align_corners=True)
    assert up[0, 0] == 0.0 and up[-1, -1] == 3.0
    assert up.min() >= 0.0 and up.max() <= 3.0


def test_generate_caption_vis(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (224, 224, 3), np.uint8)
    alphas = rng.rand(4, 49)
    alphas /= alphas.sum(axis=1, keepdims=True)
    paths = visualize.generate_caption_vis(
        img, "a man with glasses", alphas, out_dir=str(tmp_path),
        name="unit", gt_caption="a man with glasses",
        meteor=0.5, bleu=0.1)
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)
    assert "M50" in paths[0]


def test_generate_caption_vis_vit_class_token(tmp_path):
    # 197 = 14*14 + class token: the grid inference drops the extra col
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (224, 224, 3), np.uint8)
    alphas = rng.rand(3, 197)
    paths = visualize.generate_caption_vis(
        img, "young woman smiling", alphas, out_dir=str(tmp_path),
        name="vit")
    assert len(paths) == 2


def test_densecap_draw(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (128, 128, 3), np.uint8)
    boxes = np.array([[30, 30, 20, 20], [90, 90, 30, 24]], np.float32)
    out_path = str(tmp_path / "boxes.png")
    out = visualize.densecap_draw(img, boxes, ["a thing", "another"],
                                  out_path=out_path)
    assert out.shape == img.shape
    assert os.path.exists(out_path)
    assert (out != img).any()          # something was drawn


def test_display_loss_history(tmp_path):
    hist = [{"iter": i * 10, "loss": 3.0 - 0.1 * i,
             "epoch time in ms": 5.0} for i in range(10)]
    p = visualize.display_loss_history(hist, str(tmp_path / "loss.png"))
    assert os.path.exists(p)


def test_io_helpers():
    from imagecaptioning_tpu.utils.io import (average_values,
                                              build_loss_string,
                                              dict_average)
    avg = dict_average([{"a": 1.0, "b": 2.0}, {"a": 3.0}])
    assert avg == {"a": 2.0, "b": 2.0}
    assert average_values({"x": 1.0, "y": 3.0}) == 2.0
    s = build_loss_string({"obj": 0.5, "total": 1.25})
    assert s == "obj: 0.50000, total_loss: 1.25000"
