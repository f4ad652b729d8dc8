"""End-to-end tests for the offline preprocessors: raw JPEGs + JSON →
HDF5 + dicts → loadable by the data loaders."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from imagecaptioning_tpu.data import preprocess_face2text, preprocess_vg
from imagecaptioning_tpu.data.loader import AlexDataLoader
from imagecaptioning_tpu.data.vg_loader import VGDataLoader


def _write_jpg(path, h, w, seed=0):
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(path)


class TestVGPreprocess:
    @pytest.fixture
    def vg_inputs(self, tmp_path):
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        data = []
        sizes = [(60, 80), (100, 50), (70, 70), (90, 120)]
        for i, (h, w) in enumerate(sizes, start=1):
            _write_jpg(str(img_dir / f"{i}.jpg"), h, w, seed=i)
            data.append({
                "id": i,
                "regions": [
                    {"phrase": "A red box, on the left!", "x": 5, "y": 5,
                     "width": 20, "height": 15},
                    {"phrase": "the blue Sky above — wide", "x": 1, "y": 1,
                     "width": w - 1, "height": h // 2},
                ],
            })
        region_json = tmp_path / "regions.json"
        region_json.write_text(json.dumps(data))
        splits = {"train": [1, 2], "val": [3], "test": [4]}
        split_json = tmp_path / "splits.json"
        split_json.write_text(json.dumps(splits))
        return tmp_path, str(region_json), str(img_dir), str(split_json)

    def test_roundtrip(self, vg_inputs):
        tmp_path, region_json, img_dir, split_json = vg_inputs
        h5 = str(tmp_path / "vg.h5")
        js = str(tmp_path / "vg.json")
        preprocess_vg.run(region_json, img_dir, split_json, h5, js,
                          image_size=64, max_token_length=15,
                          min_token_instances=1, num_workers=2)
        loader = VGDataLoader(data_h5=h5, data_json=js)
        assert loader.num_images == 4
        assert loader.max_image_size == 64
        assert loader.num_regions == 8
        assert loader.getSeqLength() == 15
        # slab pointers 1-indexed, 2 regions each
        np.testing.assert_array_equal(loader.img_to_first_box, [1, 3, 5, 7])
        np.testing.assert_array_equal(loader.img_to_last_box, [2, 4, 6, 8])
        np.testing.assert_array_equal(loader.split, [0, 0, 1, 2])
        # resized dims: longest edge = 64
        assert loader.image_widths[0] == 64          # 60x80 → w=64
        assert loader.image_heights[0] == int(64 * 60 / 80)
        # boxes inside resized image, positive sizes
        assert (loader.boxes[:, 2] >= 0).all() and (loader.boxes[:, 3] >= 0).all()
        assert (loader.boxes[:, 0] <= 64).all()
        # tokenization: punctuation stripped, lowercase
        tok = set(loader.vocab.token_to_idx)
        assert {"a", "red", "box", "on", "the", "left"} <= tok
        assert not any("," in t or "!" in t for t in tok)
        img, boxes, labels, info = loader.get_batch({"split": 0,
                                                     "iterate": True})
        assert img.shape[1] == loader.image_heights[0]
        assert boxes.shape == (1, 2, 4) and labels.shape == (1, 2, 15)

    def test_over_length_captions_dropped(self, vg_inputs):
        tmp_path, region_json, img_dir, split_json = vg_inputs
        h5 = str(tmp_path / "vg2.h5")
        js = str(tmp_path / "vg2.json")
        preprocess_vg.run(region_json, img_dir, split_json, h5, js,
                          image_size=64, max_token_length=5,
                          min_token_instances=1, num_workers=1)
        loader = VGDataLoader(data_h5=h5, data_json=js)
        # 'a red box on the left' (6 tokens) dropped; 5-token one kept
        assert loader.num_regions == 4

    def test_unk_mapping(self, vg_inputs):
        tmp_path, region_json, img_dir, split_json = vg_inputs
        h5 = str(tmp_path / "vg3.h5")
        js = str(tmp_path / "vg3.json")
        preprocess_vg.run(region_json, img_dir, split_json, h5, js,
                          image_size=64, max_token_length=15,
                          min_token_instances=5, num_workers=1)
        with open(js) as f:
            info = json.load(f)
        assert "<UNK>" in info["token_to_idx"]


class TestFace2TextPreprocess:
    @pytest.fixture
    def f2t_inputs(self, tmp_path):
        img_dir = tmp_path / "celeba"
        img_dir.mkdir()
        names = [f"{i:06d}.jpg" for i in range(1, 7)]
        for i, nm in enumerate(names):
            _write_jpg(str(img_dir / nm), 218, 178, seed=i)

        def entries(nms):
            return [{"filename": nm,
                     "description": ["A young woman with long hair.",
                                     "She has a big smile!"]}
                    for nm in nms]
        paths = {}
        for split, nms in (("train", names[:4]), ("val", names[4:5]),
                           ("test", names[5:])):
            p = tmp_path / f"{split}.json"
            p.write_text(json.dumps(entries(nms)))
            paths[split] = str(p)
        # attribute CSV in CelebA layout
        import csv
        attr_path = tmp_path / "attrs.csv"
        with open(attr_path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["image_id"] + [f"attr_{i}" for i in range(40)])
            rng = np.random.RandomState(0)
            for nm in names:
                wr.writerow([nm] + list(rng.choice([-1, 1], 40)))
        return tmp_path, paths, str(attr_path), str(img_dir)

    def test_roundtrip(self, f2t_inputs):
        tmp_path, paths, attr_csv, img_dir = f2t_inputs
        h5 = str(tmp_path / "f2t.h5")
        js = str(tmp_path / "f2t.json")
        preprocess_face2text.run(paths["train"], paths["val"], paths["test"],
                                 attr_csv, img_dir, h5, js,
                                 min_token_instances=1, num_workers=2)
        loader = AlexDataLoader(data_h5=h5, data_json=js)
        assert loader.num_images == 6
        np.testing.assert_array_equal(loader.split, [0] * 4 + [1, 2])
        # 0-indexed inclusive phrase slabs, 2 phrases per image
        np.testing.assert_array_equal(loader.img_to_first_phr,
                                      np.arange(6) * 2)
        np.testing.assert_array_equal(loader.img_to_last_phr,
                                      np.arange(6) * 2 + 1)
        assert loader.attributes.shape == (6, 40)
        # max_token_length derived from data
        assert loader.seq_length == 6   # 'a young woman with long hair'
        imgs, labels, info, attrs = loader.get_batch(
            {"split": 0, "iterate": True}, 2)
        assert imgs.shape == (2, 218, 178, 3)
        assert (attrs >= 0).all()       # clamped
        # caption decodes back to the cleaned string
        s = loader.vocab.decode_row(labels[0])
        assert s == "a young woman with long hair"
