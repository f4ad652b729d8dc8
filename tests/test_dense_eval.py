"""Dense-captioning eval protocol + VG loader + GT model decode tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioning_tpu.data import synthetic
from imagecaptioning_tpu.data.vg_loader import (IMAGENET_MEAN, IMAGENET_STD,
                                                VGDataLoader,
                                                normalize_images)
from imagecaptioning_tpu.eval import dense_eval
from imagecaptioning_tpu.eval.dense_eval import (DenseCaptioningEvaluator,
                                                 GTDenseCaptioningEvaluator,
                                                 corners_iou,
                                                 eval_box_recalls,
                                                 merge_boxes, pluck_boxes,
                                                 xcycwh_to_corners)


def make_loader(**kw):
    arrays, info = synthetic.make_vg_arrays(**kw)
    return VGDataLoader(arrays=arrays, info=info)


class TestVGLoader:
    def test_reference_get_batch(self):
        loader = make_loader(num_images=6, regions_per_image=3)
        img, boxes, labels, info = loader.get_batch({"split": 0,
                                                     "iterate": True})
        s = loader.max_image_size
        assert img.shape == (1, s, s, 3)          # square synthetic images
        assert boxes.shape == (1, 3, 4)
        assert labels.shape == (1, 3, loader.getSeqLength())
        assert info[0]["split_bounds"][0] == 1
        # normalized like the reference: (x/255 - mean) / std
        raw = np.asarray(loader.images[loader.split_ix[0][0]],
                         np.float32) / 255.0
        want = (raw - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(img[0], want, rtol=1e-5)

    def test_iterator_wraps(self):
        loader = make_loader(num_images=6, regions_per_image=2)
        n_train = len(loader.train_ix)
        for _ in range(n_train + 1):
            loader.get_batch({"split": 0, "iterate": True})
        assert loader.iterators[0] < n_train

    def test_padded_batches_static_shapes(self):
        loader = make_loader(num_images=6, regions_per_image=3)
        rm = 5
        batches = list(loader.padded_batches(0, 2, max_regions=rm))
        assert len(batches) == 2
        b = batches[0]
        s = loader.max_image_size
        assert b["image"].shape == (2, s, s, 3)
        assert b["boxes"].shape == (2, rm, 4)
        assert b["labels"].shape == (2, rm, loader.getSeqLength())
        assert b["box_mask"].shape == (2, rm)
        assert (b["box_mask"].sum(axis=1) == 3).all()
        # padded boxes are finite and in-bounds
        assert np.isfinite(b["boxes"]).all()

    def test_padded_batches_start_cursor(self):
        # `start` is the resume cursor (reference traingt.py:51): the
        # first pass continues mid-split, identical batches thereafter.
        loader = make_loader(num_images=8, regions_per_image=2)
        full = list(loader.padded_batches(0, 2, max_regions=3))
        from_cursor = list(loader.padded_batches(0, 2, max_regions=3,
                                                 start=2))
        assert len(from_cursor) == len(full) - 1
        for got, want in zip(from_cursor, full[1:]):
            np.testing.assert_array_equal(got["image"], want["image"])
            np.testing.assert_array_equal(got["labels"], want["labels"])
        # cursor wraps modulo the split size
        wrapped = next(loader.padded_batches(0, 2, max_regions=3,
                                             start=len(loader.train_ix)))
        np.testing.assert_array_equal(wrapped["image"], full[0]["image"])

    def test_region_slab_one_indexed(self):
        loader = make_loader(num_images=4, regions_per_image=3)
        boxes, labels = loader.region_slab(1)
        np.testing.assert_array_equal(labels, loader.labels[3:6])

    def test_normalize_images_matches_host(self):
        rng = np.random.RandomState(0)
        u8 = rng.randint(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
        got = np.asarray(normalize_images(u8))
        want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestBoxMerging:
    def test_merge_two_clusters(self):
        # two tight pairs far apart → 2 clusters
        boxes = np.array([
            [0, 0, 10, 10], [0.5, 0, 10.5, 10],     # IoU ≈ 0.9
            [100, 100, 110, 110], [100, 100.5, 110, 110.5],
        ], np.float64)
        clusters = merge_boxes(boxes, 0.7)
        sets = sorted(tuple(sorted(c.tolist())) for c in clusters)
        assert sets == [(0, 1), (2, 3)]

    def test_pluck_means_and_texts(self):
        boxes = np.array([[0, 0, 10, 10], [2, 0, 12, 10]], np.float64)
        clusters = [np.array([0, 1])]
        merged, texts = pluck_boxes(clusters, boxes, ["a", "b"])
        np.testing.assert_allclose(merged[0], [1, 0, 11, 10])
        assert texts == [["a", "b"]]

    def test_merge_matches_torch_reference_semantics(self):
        rng = np.random.RandomState(7)
        n = 12
        x1 = rng.uniform(0, 50, n)
        y1 = rng.uniform(0, 50, n)
        boxes = np.stack([x1, y1, x1 + rng.uniform(5, 30, n),
                          y1 + rng.uniform(5, 30, n)], axis=1)

        # independent reimplementation of the reference loop
        def ref_merge(b):
            d = corners_iou(b, b)
            out = []
            while True:
                good = d >= 0.7
                s = good.sum(axis=0)
                top = int(np.argmax(s))
                if s[top] == 0:
                    break
                ix = np.nonzero(good[top])[0]
                out.append(ix)
                d[ix, :] = 0
                d[:, ix] = 0
            return out

        got = [c.tolist() for c in merge_boxes(boxes, 0.7)]
        want = [c.tolist() for c in ref_merge(boxes.copy())]
        assert got == want

    def test_box_recalls(self):
        gt = np.array([[10, 10, 5, 5], [30, 30, 5, 5]], np.float32)
        props = np.concatenate([gt, np.array([[80, 80, 4, 4]] * 8,
                                             np.float32)])
        stats = eval_box_recalls(props, gt, ns=[1, 2, 10])
        assert stats["0.50_recall_at_2"] == 1.0
        assert stats["0.50_recall_at_1"] == 0.5
        assert stats["0.90_recall_at_10"] == 1.0


class TestEvaluators:
    def test_perfect_predictions_full_protocol(self):
        ev = DenseCaptioningEvaluator()
        gt_boxes = np.array([[20, 20, 10, 10], [60, 60, 12, 12]], np.float32)
        caps = ["a red box", "a blue box"]
        ev.addResult(np.array([2.0, 1.0]), gt_boxes, caps, gt_boxes, caps)
        res = ev.evaluate()
        # identical boxes and captions: detection AP = 1 at every overlap
        assert res["detmap"] == pytest.approx(1.0)
        # METEOR of identical sentences > 0.25 ⇒ every language cell = 1
        assert res["map"] == pytest.approx(1.0)
        assert res["meteor"] > 0.9

    def test_no_overlap_predictions_score_zero(self):
        ev = DenseCaptioningEvaluator()
        gt_boxes = np.array([[20, 20, 10, 10]], np.float32)
        pred_boxes = np.array([[200, 200, 10, 10]], np.float32)
        ev.addResult(np.array([1.0]), pred_boxes, ["far away"],
                     gt_boxes, ["a red box"])
        res = ev.evaluate()
        assert res["map"] == 0.0 and res["detmap"] == 0.0

    def test_duplicate_detection_not_double_counted(self):
        ev = DenseCaptioningEvaluator()
        gt = np.array([[20, 20, 10, 10], [80, 80, 10, 10]], np.float32)
        # duplicate of GT#0 outranks the only match of GT#1
        pred = np.array([[20, 20, 10, 10], [20, 20, 10, 10],
                         [80, 80, 10, 10]], np.float32)
        ev.addResult(np.array([3.0, 2.0, 1.0]), pred,
                     ["a box", "a box", "other box"],
                     gt, ["a box", "other box"])
        # the lower-logprob duplicate gets ok=0
        oks = [r["ok"] for r in ev.records]
        assert oks == [1, 0, 1]
        res = ev.evaluate()
        # tp=[1,0,1]: precision dips to 2/3 past recall 0.5 →
        # AP = (51·1 + 50·(2/3))/101
        want = (51 * 1.0 + 50 * (2 / 3)) / 101
        assert res["detmap"] == pytest.approx(want, rel=1e-6)

    def test_gt_evaluator_perfect(self):
        ev = GTDenseCaptioningEvaluator()
        boxes = np.array([[20, 20, 10, 10], [60, 60, 12, 12]], np.float32)
        caps = ["a man with a hat", "a window on the wall"]
        ev.addResult(boxes, caps, caps)
        res = ev.evaluate()
        assert res["map"] == pytest.approx(1.0)
        assert res["meteor"] > 0.9
        assert set(res["ap_breakdown"]) == {
            "score0", "score0.05", "score0.1", "score0.15",
            "score0.2", "score0.25"}

    def test_gt_evaluator_merges_duplicate_gt(self):
        ev = GTDenseCaptioningEvaluator()
        # two near-identical GT boxes merge into 1 cluster → npos=1,
        # second prediction is a duplicate (ok=0)
        boxes = np.array([[20, 20, 10, 10], [20.5, 20, 10, 10]], np.float32)
        ev.addResult(boxes, ["a box", "a box"], ["a box", "a box"])
        assert ev.npos == 1
        assert [r["ok"] for r in ev.records] == [1, 0]


class TestGTModelEval:
    def _model_and_vars(self, loader, use_lstm, split=0):
        import jax

        from imagecaptioning_tpu.models.densecap import GTDenseCaptioner
        model = GTDenseCaptioner(
            vocab_size=loader.getVocabSize(),
            seq_length=loader.getSeqLength(),
            use_lstm=use_lstm, embedding_size=32, rnn_size=32,
            embed_size=32, num_layers=1, heads=2)
        b = next(loader.padded_batches(split, 2))
        images = normalize_images(b["image"])
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "sampling": rng},
                               images, jnp.asarray(b["boxes"]),
                               jnp.asarray(b["labels"]), train=False)
        return model, variables

    @pytest.mark.parametrize("use_lstm", [True, False])
    def test_eval_split_gt_runs(self, use_lstm):
        loader = make_loader(num_images=8, regions_per_image=2,
                             image_size=64, seed=3)
        # make val split big enough for a batch of 2
        loader.split[:] = 1
        loader.split_ix = {0: [], 1: list(range(8)), 2: []}
        model, variables = self._model_and_vars(loader, use_lstm, split=1)
        res = dense_eval.eval_split_gt(model, variables, loader,
                                       split=1, batch_size=2,
                                       max_images=4)
        assert res["num_images"] >= 4
        assert np.isfinite(res["loss_results"])
        assert 0.0 <= res["ap_results"]["map"] <= 1.0

    def test_region_beam1_matches_greedy(self):
        import jax

        from imagecaptioning_tpu.models import api
        loader = make_loader(num_images=4, regions_per_image=2,
                             image_size=64, seed=4)
        model, variables = self._model_and_vars(loader, use_lstm=True)
        b = next(loader.padded_batches(0, 2))
        images = normalize_images(b["image"])
        boxes = jnp.asarray(b["boxes"])
        t = loader.getSeqLength() + 1
        greedy = api.make_region_greedy_fn(model, t)(variables, images,
                                                     boxes)
        beam = api.make_region_beam_fn(model, t, 1)(variables, images,
                                                    boxes)
        # beam-1 tokens match greedy up to (and including) the first END
        end = model.spec.end
        g = np.asarray(greedy)
        bm = np.asarray(beam.tokens[:, 0])
        for row_g, row_b in zip(g, bm):
            stop = np.where(row_g == end)[0]
            k = int(stop[0]) + 1 if len(stop) else len(row_g)
            np.testing.assert_array_equal(row_g[:k], row_b[:k])
