"""Tests for the inventory-parity components the reference ships as
dead/scratch code: OurCrossEntropyCriterion, MakeBoxes, optim_updates,
and the json_modify.py fixups. Each is pinned against torch (the
reference's substrate) or against the composition it must equal."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from imagecaptioning_tpu.data import fixups
from imagecaptioning_tpu.ops import boxes as B
from imagecaptioning_tpu.ops import losses
from imagecaptioning_tpu.train import optim_updates as OU


class TestLogSoftmaxNLL:
    def test_matches_torch_unweighted(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(7, 11).astype(np.float32)
        targets = rng.randint(0, 11, size=(7,))
        ours = float(losses.log_softmax_nll(jnp.asarray(logits),
                                            jnp.asarray(targets)))
        ref = torch.nn.NLLLoss()(
            torch.nn.LogSoftmax(dim=1)(torch.tensor(logits)),
            torch.tensor(targets)).item()
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_matches_torch_weighted(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(9, 5).astype(np.float32)
        targets = rng.randint(0, 5, size=(9,))
        w = rng.rand(5).astype(np.float32) + 0.1
        ours = float(losses.log_softmax_nll(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
        ref = torch.nn.NLLLoss(weight=torch.tensor(w))(
            torch.nn.LogSoftmax(dim=1)(torch.tensor(logits)),
            torch.tensor(targets)).item()
        assert ours == pytest.approx(ref, abs=1e-6)


class TestMakeBoxes:
    def test_equals_anchor_transform_composition(self):
        # MakeBoxes must equal MakeAnchors ∘ ApplyBoxTransform — the
        # live decomposition the reference uses instead.
        rng = np.random.RandomState(2)
        n, k, hf, wf = 2, 3, 4, 5
        trans = rng.randn(n, 4 * k, hf, wf).astype(np.float32) * 0.1
        anchor_wh = jnp.asarray(rng.rand(k, 2).astype(np.float32) * 50 + 10)
        x0, y0, sx, sy = B.field_centers(4)
        got_boxes, got_anchors = B.make_boxes(
            jnp.asarray(trans), anchor_wh, x0, y0, sx, sy)
        anchors = B.make_anchors(anchor_wh, x0, y0, sx, sy, hf, wf)
        anchors = jnp.broadcast_to(anchors[None], (n, k, hf, wf, 4))
        t = jnp.moveaxis(trans.reshape(n, k, 4, hf, wf), 2, -1)
        want = B.apply_box_transform(anchors, t).reshape(n, -1, 4)
        np.testing.assert_allclose(np.asarray(got_boxes), np.asarray(want),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_anchors),
                                   np.asarray(anchors.reshape(n, -1, 4)))

    def test_identity_deltas_reproduce_anchors(self):
        anchor_wh = jnp.asarray([[16.0, 32.0]])
        trans = jnp.zeros((1, 4, 2, 3), jnp.float32)
        got_boxes, got_anchors = B.make_boxes(trans, anchor_wh,
                                              1.0, 1.0, 8.0, 8.0)
        np.testing.assert_allclose(np.asarray(got_boxes),
                                   np.asarray(got_anchors))
        # center grid: xc = x0 + sx*j
        np.testing.assert_allclose(np.asarray(got_boxes[0, :3, 0]),
                                   [1.0, 9.0, 17.0])


class TestOptimUpdates:
    """Each rule pinned against a literal numpy port of the reference's
    update math (optim_updates.py:1-57) over a 2-leaf pytree."""

    def _tree(self, rng):
        return {"a": jnp.asarray(rng.randn(3, 2).astype(np.float32)),
                "b": jnp.asarray(rng.randn(4).astype(np.float32))}

    def test_sgd(self):
        rng = np.random.RandomState(3)
        p, g = self._tree(rng), self._tree(rng)
        out = OU.sgd(p, g, lr=0.1)
        np.testing.assert_allclose(np.asarray(out["a"]),
                                   np.asarray(p["a"]) - 0.1 * np.asarray(g["a"]),
                                   rtol=1e-6)

    def test_sgdm_two_steps(self):
        rng = np.random.RandomState(4)
        p, g = self._tree(rng), self._tree(rng)
        st = OU.sgdm_init(p)
        p1, st = OU.sgdm(p, g, st, lr=0.1, alpha=0.9)
        p2, st = OU.sgdm(p1, g, st, lr=0.1, alpha=0.9)
        # v1 = lr*g ; v2 = a*v1 + lr*g ; x2 = x - v1 - v2
        v1 = 0.1 * np.asarray(g["a"])
        v2 = 0.9 * v1 + 0.1 * np.asarray(g["a"])
        np.testing.assert_allclose(np.asarray(p2["a"]),
                                   np.asarray(p["a"]) - v1 - v2, rtol=1e-5)

    def test_sgdmom_nesterov(self):
        rng = np.random.RandomState(5)
        p, g = self._tree(rng), self._tree(rng)
        st = OU.sgdmom_init(p)
        p1, st = OU.sgdmom(p, g, st, lr=0.1, alpha=0.9)
        # first step: m_old=0, m = -lr*g, x += (1+a)*m
        np.testing.assert_allclose(
            np.asarray(p1["b"]),
            np.asarray(p["b"]) - 1.9 * 0.1 * np.asarray(g["b"]), rtol=1e-5)

    def test_adagrad_accumulates(self):
        rng = np.random.RandomState(6)
        p, g = self._tree(rng), self._tree(rng)
        st = OU.adagrad_init(p)
        p1, st = OU.adagrad(p, g, st, lr=0.5, epsilon=1e-10)
        ga = np.asarray(g["a"])
        np.testing.assert_allclose(
            np.asarray(p1["a"]),
            np.asarray(p["a"]) - 0.5 * ga / (np.abs(ga) + 1e-10), rtol=1e-5)

    def test_rmsprop(self):
        rng = np.random.RandomState(7)
        p, g = self._tree(rng), self._tree(rng)
        st = OU.rmsprop_init(p)
        p1, _ = OU.rmsprop(p, g, st, lr=0.01, alpha=0.99, epsilon=1e-8)
        ga = np.asarray(g["a"])
        denom = np.sqrt(0.01 * ga * ga) + 1e-8
        np.testing.assert_allclose(np.asarray(p1["a"]),
                                   np.asarray(p["a"]) - 0.01 * ga / denom,
                                   rtol=1e-5)

    def test_adam_matches_torch(self):
        rng = np.random.RandomState(8)
        p = rng.randn(5, 3).astype(np.float32)
        g = rng.randn(5, 3).astype(np.float32)
        tp = torch.tensor(p, requires_grad=True)
        opt = torch.optim.Adam([tp], lr=1e-2, betas=(0.9, 0.999), eps=1e-8)
        jp, st = {"w": jnp.asarray(p)}, None
        st = OU.adam_init(jp)
        for _ in range(3):
            tp.grad = torch.tensor(g)
            opt.step()
            jp, st = OU.adam(jp, {"w": jnp.asarray(g)}, st, lr=1e-2)
        np.testing.assert_allclose(np.asarray(jp["w"]),
                                   tp.detach().numpy(), rtol=1e-4, atol=1e-6)

    def test_jittable(self):
        p = {"a": jnp.ones((2, 2))}
        g = {"a": jnp.full((2, 2), 0.5)}
        st = OU.adam_init(p)
        p2, st2 = jax.jit(lambda p, g, s: OU.adam(p, g, s, lr=0.1))(p, g, st)
        assert np.isfinite(np.asarray(p2["a"])).all()
        assert int(st2["t"]) == 1


class TestFixups:
    def test_strip_backbone_keys(self):
        sd = {"resnet_backbone.conv1.weight": 1, "llm.embed.weight": 2,
              "head.resnet_backbone_extra": 3}
        out = fixups.strip_backbone_keys(sd)
        assert out == {"llm.embed.weight": 2}

    def test_merge_duplicate_test_descriptions(self):
        recs = [
            {"filename": "a.jpg", "description": "short"},
            {"filename": "a.jpg", "description": "a much longer caption"},
            {"filename": "b.jpg", "description": "only one"},
            {"filename": "a.jpg", "description": "separate group"},
        ]
        out = fixups.merge_duplicate_test_descriptions(recs)
        assert [r["filename"] for r in out] == ["a.jpg", "b.jpg", "a.jpg"]
        # longest of the merged group wins, wrapped in a list
        assert out[0]["description"] == ["a much longer caption"]
        assert out[1]["description"] == ["only one"]
        assert out[2]["description"] == ["separate group"]

    def test_channel_mean_std_matches_reference_estimator(self):
        rng = np.random.RandomState(9)
        imgs = rng.randint(0, 256, size=(4, 8, 6, 3), dtype=np.uint8)
        mean, std = fixups.channel_mean_std(imgs)
        x = imgs.astype(np.float64) / 255.0
        want_mean = x.mean(axis=(1, 2)).mean(axis=0)
        want_std = np.stack([x[i].std(axis=(0, 1)) for i in range(4)]).mean(0)
        np.testing.assert_allclose(mean, want_mean, rtol=1e-9)
        np.testing.assert_allclose(std, want_std, rtol=1e-6)


# A stand-in scorer process speaking the METEOR-1.5 stdio protocol
# (SCORE -> stats line, EVAL -> float), so the bridge is testable
# without a JVM: score = unigram overlap F1 between candidate and the
# best reference.
_FAKE_METEOR = r"""
import sys
for line in sys.stdin:
    parts = [p.strip() for p in line.split('|||')]
    if parts[0] == 'SCORE':
        refs, cand = parts[1:-1], parts[-1].split()
        best = 0.0
        for ref in refs:
            r = ref.split()
            ov = len(set(r) & set(cand))
            if r and cand:
                best = max(best, 2.0 * ov / (len(r) + len(cand)))
        print('%d %.6f' % (len(refs), best), flush=True)
    elif parts[0] == 'EVAL':
        print(parts[1].split()[1], flush=True)
"""


class TestMeteorBridge:
    def _scorer(self):
        import sys

        from imagecaptioning_tpu.eval import meteor_bridge
        return meteor_bridge.ExternalMeteor(
            cmd=[sys.executable, "-u", "-c", _FAKE_METEOR])

    def test_unavailable_without_jar(self, tmp_path):
        from imagecaptioning_tpu.eval import meteor_bridge
        assert not meteor_bridge.available("")
        assert not meteor_bridge.available(str(tmp_path / "missing.jar"))
        with pytest.raises(RuntimeError, match="unavailable"):
            meteor_bridge.ExternalMeteor(jar_path="")

    def test_score_protocol_roundtrip(self):
        with self._scorer() as m:
            assert m.score("a b c", ["a b c"]) == pytest.approx(1.0)
            assert m.score("a b", ["a b c d", "z"]) == pytest.approx(
                2 * 2 / (4 + 2))
            # delimiter sanitization: '|||' stripped from payloads
            assert m.score("a ||| b", ["a b"]) == pytest.approx(1.0)

    def test_score_records_batch_contract(self):
        records = [
            {"candidate": "a b", "references": ["a b"]},
            {"candidate": "x", "references": ["y"]},
        ]
        with self._scorer() as m:
            out = m.score_records(records)
        assert out["scores"] == [pytest.approx(1.0), pytest.approx(0.0)]
        assert out["average_score"] == pytest.approx(0.5)

    def test_thread_safety(self):
        from concurrent.futures import ThreadPoolExecutor
        with self._scorer() as m:
            with ThreadPoolExecutor(max_workers=8) as pool:
                got = list(pool.map(
                    lambda i: m.score("w%d" % i, ["w%d" % i]), range(32)))
        assert got == [pytest.approx(1.0)] * 32

    def test_cli_batch_mode(self, tmp_path, monkeypatch):
        import sys

        from imagecaptioning_tpu.eval import meteor_bridge
        inp = tmp_path / "input.json"
        outp = tmp_path / "output.json"
        inp.write_text(json.dumps(
            [{"candidate": "a b", "references": ["a b"]}]))
        real = meteor_bridge.ExternalMeteor
        monkeypatch.setattr(
            meteor_bridge, "ExternalMeteor",
            lambda jar_path: real(cmd=[sys.executable, "-u", "-c",
                                       _FAKE_METEOR]))
        meteor_bridge.main([str(inp), str(outp)])
        blob = json.loads(outp.read_text())
        assert blob["average_score"] == pytest.approx(1.0)
