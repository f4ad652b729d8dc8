"""ImageProcessor / proposal-source tests."""

import numpy as np
from PIL import Image

from imagecaptioning_tpu.data.proposals import (ImageProcessor,
                                                grid_proposer,
                                                resize_shorter_edge)


def test_resize_shorter_edge_contract():
    img = np.zeros((350, 500, 3), np.uint8)
    out = resize_shorter_edge(img, target=700, max_size=720)
    # longest edge capped at 720: scale = 720/500
    assert out.shape[1] == 720
    assert out.shape[0] == round(350 * 720 / 500)
    sq = np.zeros((400, 400, 3), np.uint8)
    out2 = resize_shorter_edge(sq)
    assert out2.shape[:2] == (700, 700)


def test_grid_proposer_boxes_in_bounds():
    img = np.zeros((256, 320, 3), np.uint8)
    boxes = grid_proposer(cell=64, box=96)(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    assert (x1 >= -1).all() and (y1 >= -1).all()


def test_image_processor_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(rng.randint(0, 256, (100, 150, 3), np.uint8)).save(path)
    proc = ImageProcessor(target=64, max_size=96)
    img, boxes = proc.preprocess_img(path)
    assert img.ndim == 4 and img.shape[0] == 1 and img.shape[3] == 3
    assert img.dtype == np.float32
    assert boxes.ndim == 3 and boxes.shape[2] == 4
    # normalized: values roughly in ImageNet-normalized range
    assert -3.0 < img.mean() < 3.0
    # boxes rescaled into the resized frame
    assert (boxes[0, :, 0] <= img.shape[2] + 1).all()
