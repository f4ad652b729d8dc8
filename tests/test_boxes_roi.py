"""Box-op golden tests + ROI-align parity against torch's
affine_grid/grid_sample (the reference's exact sampling path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagecaptioning_tpu.ops import boxes as B
from imagecaptioning_tpu.ops.box_sampler import sample_boxes
from imagecaptioning_tpu.ops.nms import nms
from imagecaptioning_tpu.ops.roi_align import (roi_align, roi_align_pallas_fwd,
                                               roi_align_pallas)


class TestBoxOps:
    def test_roundtrip_conversions(self):
        rng = np.random.RandomState(0)
        b = jnp.asarray(rng.rand(10, 4) * 100 + 5)
        np.testing.assert_allclose(
            np.asarray(B.x1y1x2y2_to_xcycwh(B.xcycwh_to_x1y1x2y2(b))),
            np.asarray(b), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(B.xywh_to_xcycwh(B.xcycwh_to_xywh(b))),
            np.asarray(b), rtol=1e-6)

    def test_iou_golden(self):
        a = jnp.asarray([[5.0, 5.0, 9.0, 9.0]])   # x1..x2 = 1..9
        b = jnp.asarray([[9.0, 9.0, 9.0, 9.0]])   # x1..x2 = 5..13
        # corner overlap 4x4=16(area in continuous corner space); each 8x8
        iou = float(B.box_iou(a, b)[0, 0])
        assert iou == pytest.approx(16.0 / (64 + 64 - 16), rel=1e-6)

    def test_iou_matches_torchvision_formula(self):
        rng = np.random.RandomState(1)
        a = rng.rand(6, 4) * 50 + 10
        b = rng.rand(4, 4) * 50 + 10
        got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
        # torch box_iou on corner boxes (continuous convention)
        def corners(x):
            out = np.stack([x[:, 0] - (x[:, 2] - 1) / 2,
                            x[:, 1] - (x[:, 3] - 1) / 2,
                            x[:, 0] + (x[:, 2] - 1) / 2,
                            x[:, 1] + (x[:, 3] - 1) / 2], 1)
            return torch.from_numpy(out)
        ta, tb = corners(a), corners(b)
        area = lambda t: (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])
        lt = torch.max(ta[:, None, :2], tb[None, :, :2])
        rb = torch.min(ta[:, None, 2:], tb[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        want = inter / (area(ta)[:, None] + area(tb)[None] - inter)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)

    def test_apply_invert_roundtrip(self):
        rng = np.random.RandomState(2)
        anchors = jnp.asarray(rng.rand(8, 4) * 40 + 20)
        trans = jnp.asarray(rng.randn(8, 4) * 0.2)
        boxes = B.apply_box_transform(anchors, trans)
        back = B.invert_box_transform(anchors, boxes)
        np.testing.assert_allclose(np.asarray(back), np.asarray(trans),
                                   rtol=1e-3, atol=1e-4)

    def test_apply_box_transform_log_scale_clamp(self):
        """max_log_scale caps exp growth (Detectron-style; threshold
        matches the reference criterion's |t| > 10 garbage mask) —
        diverged deltas must not overflow fp32 into inf/NaN."""
        anchors = jnp.asarray([[50.0, 50.0, 20.0, 20.0]])
        wild = jnp.asarray([[0.0, 0.0, 200.0, -200.0]])   # exp(200) = inf
        unclamped = B.apply_box_transform(anchors, wild)
        assert not bool(jnp.isfinite(unclamped).all())    # ref behavior
        clamped = B.apply_box_transform(anchors, wild, max_log_scale=10.0)
        assert bool(jnp.isfinite(clamped).all())
        np.testing.assert_allclose(np.asarray(clamped)[0, 2],
                                   20.0 * np.exp(10.0), rtol=1e-5)
        # identity for in-range deltas: clamp is inactive below ±10
        mild = jnp.asarray([[0.1, -0.2, 0.3, -0.4]])
        np.testing.assert_allclose(
            np.asarray(B.apply_box_transform(anchors, mild,
                                             max_log_scale=10.0)),
            np.asarray(B.apply_box_transform(anchors, mild)))

    def test_field_centers_vgg(self):
        # 4 maxpools (VGG16 through conv5): x0 = 1+0.5+1+2+4 = 8.5? compute:
        x0, y0, sx, sy = B.field_centers(4)
        assert sx == 16 and sy == 16
        assert x0 == 1 + 0.5 + 1 + 2 + 4

    def test_clip_boxes(self):
        b = jnp.asarray([[50.0, 50.0, 200.0, 10.0]])
        clipped, valid = B.clip_boxes(b, h=100, w=100)
        corners = np.asarray(B.xcycwh_to_x1y1x2y2(clipped))[0]
        assert corners[0] >= 1 and corners[2] <= 100
        assert bool(valid[0])

    def test_merge_boxes_host(self):
        bx = np.array([[10, 10, 8, 8], [10.5, 10, 8, 8], [50, 50, 8, 8]],
                      dtype=np.float32)
        merged, assign = B.merge_boxes_host(bx, 0.7)
        assert merged.shape[0] == 2
        assert assign[0] == assign[1] != assign[2]


class TestNMS:
    def test_nms_suppresses_overlaps(self):
        bx = jnp.asarray([[10.0, 10, 8, 8], [10.5, 10, 8, 8],
                          [50.0, 50, 8, 8], [10.2, 10, 8, 8]])
        scores = jnp.asarray([0.9, 0.8, 0.7, 0.95])
        idx, ok = nms(bx, scores, iou_thresh=0.5, max_out=4)
        kept = set(np.asarray(idx)[np.asarray(ok)].tolist())
        assert kept == {3, 2}

    def test_nms_respects_valid_mask(self):
        bx = jnp.asarray([[10.0, 10, 8, 8], [50.0, 50, 8, 8]])
        scores = jnp.asarray([0.9, 0.8])
        idx, ok = nms(bx, scores, 0.5, 2, valid=jnp.asarray([False, True]))
        kept = np.asarray(idx)[np.asarray(ok)].tolist()
        assert kept == [1]


class TestSampler:
    def test_sampler_basic(self):
        gt = jnp.asarray([[20.0, 20, 10, 10], [60.0, 60, 10, 10]])
        gt_mask = jnp.asarray([True, True])
        props = jnp.asarray([
            [20.0, 20, 10, 10],    # IoU 1 with gt0 → pos
            [21.0, 20, 10, 10],    # high IoU → pos
            [60.0, 60, 10, 10],    # IoU 1 with gt1 → pos
            [90.0, 90, 10, 10],    # IoU 0 → neg
            [5.0, 90, 10, 10],     # neg
        ])
        res = sample_boxes(jax.random.PRNGKey(0), props, gt, gt_mask,
                           num_pos=4, num_neg=4)
        pos = set(np.asarray(res.pos_idx)[np.asarray(res.pos_mask)].tolist())
        assert {0, 2}.issubset(pos | {0, 2})  # best-per-GT forced positive
        # negatives come only from {3, 4}
        neg = set(np.asarray(res.neg_idx)[np.asarray(res.neg_mask)].tolist())
        assert neg.issubset({3, 4}) and len(neg) > 0
        # matched GT for the exact-overlap proposals is correct
        pos_list = np.asarray(res.pos_idx).tolist()
        tgt = np.asarray(res.pos_target_idx)
        for slot, p in enumerate(pos_list):
            if p == 0 and res.pos_mask[slot]:
                assert tgt[slot] == 0
            if p == 2 and res.pos_mask[slot]:
                assert tgt[slot] == 1


def _torch_roi(feat_hwc, boxes, image_hw, out=7):
    """Reference path: BoxToAffine math + affine_grid + grid_sample."""
    H, W = image_hw
    f = torch.from_numpy(np.asarray(feat_hwc).transpose(2, 0, 1))[None]
    outs = []
    for (xc, yc, w, h) in np.asarray(boxes):
        theta = torch.zeros(1, 2, 3, dtype=torch.float64)
        theta[0, 0, 2] = float((xc * 2 - 1 - W) / (W - 1))
        theta[0, 1, 2] = float((yc * 2 - 1 - H) / (H - 1))
        theta[0, 0, 0] = float(w / W)
        theta[0, 1, 1] = float(h / H)
        grid = F.affine_grid(theta, [1, 1, out, out], align_corners=False)
        s = F.grid_sample(f.double(), grid, align_corners=False)
        outs.append(s[0].numpy().transpose(1, 2, 0))
    return np.stack(outs)


class TestRoiAlign:
    def test_matches_torch_grid_sample(self):
        rng = np.random.RandomState(3)
        feat = rng.rand(12, 16, 5).astype(np.float32)
        image_hw = (192.0, 256.0)   # stride 16
        boxes = np.stack([
            rng.uniform(60, 200, 4),          # xc
            rng.uniform(60, 130, 4),          # yc
            rng.uniform(30, 100, 4),          # w
            rng.uniform(30, 100, 4),          # h
        ], axis=1).astype(np.float32)
        want = _torch_roi(feat, boxes, image_hw)
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                   image_hw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_full_image_box_is_near_identity(self):
        # sanity from the reference's sanitycheck.py idea: pooling the
        # full-image box on a feature map the same size as out_hw
        # reproduces the map.
        rng = np.random.RandomState(4)
        feat = rng.rand(7, 7, 3).astype(np.float32)
        H = W = 7.0
        box = jnp.asarray([[(W + 1) / 2, (H + 1) / 2, W, H]])
        got = np.asarray(roi_align(jnp.asarray(feat), box, (H, W), (7, 7)))[0]
        want = _torch_roi(feat, np.asarray(box), (H, W))[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_pallas_interpret_matches_einsum(self):
        rng = np.random.RandomState(5)
        feat = rng.rand(8, 8, 4).astype(np.float32)
        boxes = np.array([[64.0, 64, 60, 60], [30.0, 40, 20, 24]],
                         dtype=np.float32)
        a = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                 (128.0, 128.0)))
        b = np.asarray(roi_align_pallas_fwd(
            jnp.asarray(feat), jnp.asarray(boxes), (128.0, 128.0),
            interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_gradients_flow(self):
        rng = np.random.RandomState(6)
        feat = jnp.asarray(rng.rand(8, 8, 4).astype(np.float32))
        boxes = jnp.asarray([[64.0, 64, 60, 60]])

        def loss(f):
            return roi_align(f, boxes, (128.0, 128.0)).sum()

        g = jax.grad(loss)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestBatchedPallasRoi:
    def test_batched_interpret_matches_einsum(self):
        from imagecaptioning_tpu.ops.roi_align import (
            roi_align_batch, roi_align_batch_pallas_fwd)
        rng = np.random.RandomState(9)
        feats = rng.rand(3, 8, 8, 4).astype(np.float32)
        boxes = np.stack([rng.uniform(60, 200, (3, 5)),
                          rng.uniform(60, 130, (3, 5)),
                          rng.uniform(30, 100, (3, 5)),
                          rng.uniform(30, 100, (3, 5))],
                         axis=-1).astype(np.float32)
        a = np.asarray(roi_align_batch(jnp.asarray(feats),
                                       jnp.asarray(boxes), (128.0, 128.0)))
        b = np.asarray(roi_align_batch_pallas_fwd(
            jnp.asarray(feats), jnp.asarray(boxes), (128.0, 128.0),
            interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_batched_pallas_gradients(self):
        from imagecaptioning_tpu.ops.roi_align import roi_align_batch_pallas

        # interpret-mode fwd is wrapped by the custom vjp; grads flow
        rng = np.random.RandomState(10)
        feats = jnp.asarray(rng.rand(2, 6, 6, 3).astype(np.float32))
        boxes = jnp.asarray([[[40.0, 40, 30, 30]], [[50.0, 50, 20, 20]]])

        import jax as _jax
        from functools import partial
        from imagecaptioning_tpu.ops import roi_align as ra

        # route fwd through interpret mode for the CPU test
        def loss(f):
            out = ra.roi_align_batch_pallas_fwd(f, boxes, (96.0, 96.0),
                                                (7, 7), interpret=True)
            return out.sum()

        def loss_einsum(f):
            return ra.roi_align_batch(f, boxes, (96.0, 96.0)).sum()

        # interpret-mode fwd values match einsum → the custom-vjp
        # backward (shared einsum math, exercised on-TPU separately)
        # is consistent; here check grads are finite and nonzero.
        np.testing.assert_allclose(np.asarray(loss(feats)),
                                   np.asarray(loss_einsum(feats)),
                                   rtol=1e-5)
        g_ref = _jax.grad(loss_einsum)(feats)
        assert np.isfinite(np.asarray(g_ref)).all()
        assert float(jnp.abs(g_ref).sum()) > 0

    def test_gt_model_pallas_flag_matches_einsum(self):
        import jax as _jax
        from imagecaptioning_tpu.models.densecap import GTDenseCaptioner
        from imagecaptioning_tpu.ops import roi_align as ra

        # interpret mode on CPU for the flagged model path
        orig = ra.roi_align_batch_pallas_fwd
        ra_patched = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            ra.roi_align_batch_pallas_fwd = ra_patched
            rng = np.random.RandomState(11)
            images = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
            boxes = jnp.asarray(rng.uniform(8, 24, (2, 3, 4))
                                .astype(np.float32))
            labels = jnp.asarray(rng.randint(1, 20, (2, 3, 5))
                                 .astype(np.int32))
            kw = dict(vocab_size=24, seq_length=5, use_lstm=True,
                      embedding_size=16, rnn_size=16, vgg_stages=2)
            m1 = GTDenseCaptioner(**kw)
            m2 = GTDenseCaptioner(**kw, use_pallas_roi=True)
            k = _jax.random.PRNGKey(0)
            v = m1.init({"params": k, "sampling": k}, images, boxes,
                        labels, train=False)
            o1 = m1.apply(v, images, boxes, labels, train=False)
            o2 = m2.apply(v, images, boxes, labels, train=False)
            np.testing.assert_allclose(np.asarray(o1.logits),
                                       np.asarray(o2.logits),
                                       rtol=2e-5, atol=2e-5)
        finally:
            ra.roi_align_batch_pallas_fwd = orig


class TestSamplerReplacementSemantics:
    def test_positive_padding_slots_masked_out(self):
        # 2 real positives, num_pos=4: the reference samples <=num_pos
        # positives WITHOUT replacement (BoxSampler.py:61-63), so the
        # two padding slots must not count in losses.
        gt = jnp.asarray([[20.0, 20, 10, 10]])
        props = jnp.asarray([
            [20.0, 20, 10, 10],    # IoU 1 -> pos
            [21.0, 20, 10, 10],    # high IoU -> pos
            [90.0, 90, 10, 10],    # neg
            [70.0, 90, 10, 10],    # neg
            [90.0, 70, 10, 10],    # neg
            [60.0, 60, 10, 10],    # neg
        ])
        res = sample_boxes(jax.random.PRNGKey(1), props, gt,
                           jnp.asarray([True]), num_pos=4, num_neg=4)
        assert int(np.asarray(res.pos_mask).sum()) == 2
        # padding slots still carry valid positive indices (static
        # gather safe: they cycle through the real picks)
        assert set(np.asarray(res.pos_idx).tolist()) == {0, 1}

    def test_negative_replacement_counts(self):
        # 1 real negative, num_neg=4: the reference fills the batch with
        # replacement when negatives run short (BoxSampler.py:66-69),
        # and those duplicates DO count - all slots stay valid.
        gt = jnp.asarray([[20.0, 20, 10, 10]])
        props = jnp.asarray([
            [20.0, 20, 10, 10],    # pos
            [21.0, 20, 10, 10],    # pos
            [19.0, 20, 10, 10],    # pos
            [90.0, 90, 10, 10],    # the only neg
        ])
        res = sample_boxes(jax.random.PRNGKey(2), props, gt,
                           jnp.asarray([True]), num_pos=3, num_neg=4)
        assert np.asarray(res.neg_mask).all()
        assert (np.asarray(res.neg_idx) == 3).all()

    def test_no_positives_all_masked(self):
        gt = jnp.asarray([[20.0, 20, 10, 10]])
        props = jnp.asarray([[90.0, 90, 10, 10], [70.0, 90, 10, 10],
                             [50.0, 90, 10, 10], [30.0, 90, 10, 10]])
        res = sample_boxes(jax.random.PRNGKey(3), props, gt,
                           jnp.asarray([False]),   # no real GT
                           num_pos=2, num_neg=2)
        assert not np.asarray(res.pos_mask).any()


class TestRoiBoxGradients:
    """The bilinear sampler must be differentiable in the BOX COORDS —
    DenseCap trains its RPN end-to-end through the sampler. Pin the
    einsum formulation's box gradient against torch autograd through
    affine_grid/grid_sample, and require the Pallas custom_vjp to
    produce the same (not zero)."""

    def _torch_box_grad(self, feat_hwc, box, image_hw, g, out=7):
        H, W = image_hw
        f = torch.from_numpy(
            np.asarray(feat_hwc).transpose(2, 0, 1))[None].double()
        xc, yc, w, h = [torch.tensor(float(v), dtype=torch.float64,
                                     requires_grad=True) for v in box]
        theta = torch.stack([
            torch.stack([w / W, torch.zeros((), dtype=torch.float64),
                         (xc * 2 - 1 - W) / (W - 1)]),
            torch.stack([torch.zeros((), dtype=torch.float64), h / H,
                         (yc * 2 - 1 - H) / (H - 1)]),
        ])[None]
        grid = F.affine_grid(theta, [1, 1, out, out], align_corners=False)
        s = F.grid_sample(f, grid, align_corners=False)
        loss = (s[0].permute(1, 2, 0) * torch.from_numpy(g).double()).sum()
        loss.backward()
        return np.array([xc.grad, yc.grad, w.grad, h.grad])

    def test_einsum_box_grad_matches_torch(self):
        rng = np.random.RandomState(7)
        feat = rng.rand(12, 16, 3).astype(np.float32)
        image_hw = (192.0, 256.0)
        boxes = np.array([[120.3, 80.7, 55.2, 48.9],
                          [60.0, 100.5, 33.3, 71.1]], np.float32)
        g = rng.rand(2, 7, 7, 3).astype(np.float32)

        def loss_fn(b):
            out = roi_align(jnp.asarray(feat), b, image_hw)
            return jnp.sum(out * jnp.asarray(g))

        got = np.asarray(jax.grad(loss_fn)(jnp.asarray(boxes)))
        for i in range(2):
            want = self._torch_box_grad(feat, boxes[i], image_hw, g[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-4)

    def test_pallas_vjp_matches_einsum(self, monkeypatch):
        from imagecaptioning_tpu.ops import roi_align as ra

        rng = np.random.RandomState(8)
        feat = rng.rand(8, 8, 4).astype(np.float32)
        image_hw = (128.0, 128.0)
        boxes = np.array([[60.0, 70.0, 40.0, 30.0]], np.float32)
        g = rng.rand(1, 7, 7, 4).astype(np.float32)

        # CPU test: route the kernel forward through interpret mode; the
        # custom-vjp backward under test is backend-independent.
        orig = ra.roi_align_pallas_fwd
        monkeypatch.setattr(
            ra, "roi_align_pallas_fwd",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))

        def loss_e(f, b):
            return jnp.sum(ra.roi_align(f, b, image_hw) * jnp.asarray(g))

        def loss_p(f, b):
            return jnp.sum(ra.roi_align_pallas(f, b, image_hw)
                           * jnp.asarray(g))

        fe, be = jax.grad(loss_e, argnums=(0, 1))(jnp.asarray(feat),
                                                  jnp.asarray(boxes))
        fp, bp = jax.grad(loss_p, argnums=(0, 1))(jnp.asarray(feat),
                                                  jnp.asarray(boxes))
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fe),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bp), np.asarray(be),
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(be)).max() > 0   # grads actually flow


def test_forced_positive_survives_padded_gt_rows():
    """Padded GT rows all scatter False at proposal 0; a real GT whose
    argmax proposal IS index 0 must keep its forced positive
    (duplicate-index scatter uses max, not order-unspecified set)."""
    from imagecaptioning_tpu.ops.box_sampler import candidate_masks

    proposals = jnp.asarray([[30.0, 30, 18, 18],    # best for the real GT
                             [90.0, 90, 10, 10],
                             [70.0, 20, 10, 10],
                             [20.0, 80, 10, 10]])
    gt = jnp.asarray([[32.0, 32, 20, 20],           # real
                      [1.0, 1, 1, 1],               # padding
                      [1.0, 1, 1, 1]])              # padding
    gt_mask = jnp.asarray([True, False, False])
    pos, neg, _ = candidate_masks(proposals, gt, gt_mask)
    assert bool(pos[0])                 # forced positive not erased
    assert not bool(neg[0])
