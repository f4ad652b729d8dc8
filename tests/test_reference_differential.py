"""Differential parity: run the REFERENCE preprocessor (imported from
/root/reference — no torch dependency) and ours on identical raw inputs
and diff the artifacts field by field.

The one documented divergence is vocabulary id assignment: the reference
iterates a Python set (hash order, PARITY.md), so label matrices are
compared after decoding through each side's own dicts; everything else
must match exactly. Skipped when the reference checkout is absent.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


def _load_reference_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_jpg(path, h, w, seed):
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(path)


@pytest.fixture(scope="module")
def vg_raw(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vg_raw")
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    data = []
    sizes = [(60, 80), (100, 50), (70, 70), (90, 120), (64, 64)]
    phrases = [
        "A red box, on the left!",
        "the blue Sky above — wide",
        "two people walking together",
        "a red box on the right",
        "the sky above",
    ]
    for i, (h, w) in enumerate(sizes, start=1):
        _write_jpg(str(img_dir / f"{i}.jpg"), h, w, seed=i)
        data.append({
            "id": i,
            "regions": [
                {"phrase": phrases[(i - 1) % len(phrases)],
                 "x": 5, "y": 5, "width": 20, "height": 15},
                {"phrase": phrases[i % len(phrases)],
                 "x": 1, "y": 1, "width": w - 1, "height": h // 2},
            ],
        })
    region_json = tmp / "regions.json"
    region_json.write_text(json.dumps(data))
    splits = {"train": [1, 2, 5], "val": [3], "test": [4]}
    split_json = tmp / "splits.json"
    split_json.write_text(json.dumps(splits))
    return tmp, str(region_json), str(img_dir), str(split_json)


def test_vg_preprocessor_matches_reference(vg_raw):
    import h5py

    from imagecaptioning_tpu.data import preprocess_vg

    tmp, region_json, img_dir, split_json = vg_raw

    ref_h5 = str(tmp / "ref.h5")
    ref_js = str(tmp / "ref.json")
    ref = _load_reference_module("preprocess.py", "ref_preprocess")
    ref.main(types.SimpleNamespace(
        region_data=region_json, image_dir=img_dir, split_json=split_json,
        h5_output=ref_h5, json_output=ref_js, image_size=64,
        max_token_length=15, min_token_instances=1, tokens_type="words",
        num_workers=2, max_images=-1))

    our_h5 = str(tmp / "ours.h5")
    our_js = str(tmp / "ours.json")
    preprocess_vg.run(region_json, img_dir, split_json, our_h5, our_js,
                      image_size=64, max_token_length=15,
                      min_token_instances=1, num_workers=2)

    with h5py.File(ref_h5) as fr, h5py.File(our_h5) as fo:
        for field in ("original_heights", "original_widths",
                      "image_heights", "image_widths", "split",
                      "lengths", "boxes", "img_to_first_box",
                      "img_to_last_box", "box_to_img"):
            np.testing.assert_array_equal(
                np.asarray(fr[field]), np.asarray(fo[field]),
                err_msg=f"field {field}")
        np.testing.assert_array_equal(np.asarray(fr["images"]),
                                      np.asarray(fo["images"]))
        ref_labels = np.asarray(fr["labels"])
        our_labels = np.asarray(fo["labels"])

    with open(ref_js) as f:
        ref_dicts = json.load(f)
    with open(our_js) as f:
        our_dicts = json.load(f)
    # identical vocab SET; ids may differ (set-iteration order, PARITY.md)
    assert set(ref_dicts["token_to_idx"]) == set(our_dicts["token_to_idx"])
    assert ref_dicts["filename_to_idx"] == our_dicts["filename_to_idx"]

    # labels equal after decoding through each side's own dicts
    def decode(mat, dicts):
        i2t = dicts["idx_to_token"]
        return [" ".join(i2t[str(int(i))] for i in row if int(i) != 0)
                for row in mat]

    assert decode(ref_labels, ref_dicts) == decode(our_labels, our_dicts)


@pytest.fixture(scope="module")
def f2t_raw(tmp_path_factory):
    import csv

    tmp = tmp_path_factory.mktemp("f2t_raw")
    img_dir = tmp / "celeba"
    img_dir.mkdir()
    names = [f"{i:06d}.jpg" for i in range(1, 9)]
    for i, nm in enumerate(names):
        _write_jpg(str(img_dir / nm), 218, 178, seed=i)
    descs = [
        ["A young woman with long hair.", "She has a big smile!"],
        ["An older man, with a beard — and glasses."],
        ["a smiling woman"],
        ["The man has short black hair.", "He looks serious."],
        ["a young man with curly hair"],
        ["A woman with blond hair."],
        ["An old man."],
        ["the woman is smiling broadly"],
    ]
    paths = {}
    chunks = {"train": names[:5], "val": names[5:6], "test": names[6:]}
    off = 0
    for split, nms in chunks.items():
        entries = [{"filename": nm, "description": descs[off + j]}
                   for j, nm in enumerate(nms)]
        off += len(nms)
        p = tmp / f"{split}.json"
        p.write_text(json.dumps(entries))
        paths[split] = str(p)
    attr_path = tmp / "attrs.csv"
    with open(attr_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["image_id"] + [f"attr_{i}" for i in range(40)])
        rng = np.random.RandomState(0)
        for nm in names:
            wr.writerow([nm] + [int(x) for x in rng.choice([-1, 1], 40)])
    return tmp, paths, str(attr_path), str(img_dir)


def test_face2text_preprocessor_matches_reference(f2t_raw):
    import h5py

    from imagecaptioning_tpu.data import preprocess_face2text

    tmp, paths, attr_csv, img_dir = f2t_raw
    ref_h5, ref_js = str(tmp / "ref.h5"), str(tmp / "ref.json")
    ref = _load_reference_module("AlexCap/my_model_preprocess.py",
                                 "ref_f2t_preprocess")
    ns = types.SimpleNamespace(
        train_data=paths["train"], val_data=paths["val"],
        test_data=paths["test"], attr_data=attr_csv, image_dir=img_dir,
        h5_output=ref_h5, json_output=ref_js,
        image_height=218, image_width=178, max_token_length=0,
        min_token_instances=1, tokens_type="words", num_workers=2)
    # the reference's split_data reads the module-global `args` (it only
    # runs as a script); provide it
    ref.args = ns
    ref.main(ns)

    our_h5, our_js = str(tmp / "ours.h5"), str(tmp / "ours.json")
    preprocess_face2text.run(
        paths["train"], paths["val"], paths["test"], attr_csv, img_dir,
        our_h5, our_js, image_height=218, image_width=178,
        max_token_length=0, min_token_instances=1, num_workers=2)

    with h5py.File(ref_h5) as fr, h5py.File(our_h5) as fo:
        for field in ("split", "attributes", "lengths",
                      "img_to_first_phr", "img_to_last_phr"):
            np.testing.assert_array_equal(
                np.asarray(fr[field]), np.asarray(fo[field]),
                err_msg=f"field {field}")
        np.testing.assert_array_equal(np.asarray(fr["images"]),
                                      np.asarray(fo["images"]))
        ref_labels = np.asarray(fr["labels"])
        our_labels = np.asarray(fo["labels"])
    assert ref_labels.shape == our_labels.shape

    with open(ref_js) as f:
        ref_dicts = json.load(f)
    with open(our_js) as f:
        our_dicts = json.load(f)
    assert set(ref_dicts["token_to_idx"]) == set(our_dicts["token_to_idx"])
    assert ref_dicts["filename_to_idx"] == our_dicts["filename_to_idx"]
    assert ref_dicts["attributes_labels"] == our_dicts["attributes_labels"]

    def decode(mat, dicts):
        i2t = dicts["idx_to_token"]
        return [" ".join(i2t[str(int(i))] for i in row if int(i) != 0)
                for row in mat]

    assert decode(ref_labels, ref_dicts) == decode(our_labels, our_dicts)
