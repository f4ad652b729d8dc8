"""Target construction + loss parity tests.

The loss tests pin torch-parity numerically: torch (CPU) is the
reference implementation of label-smoothed / ignore-index cross-entropy
(reference AlexCap/CustomLoss.py:7-14).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from imagecaptioning_tpu.ops import losses, tokens


class TestTargets:
    def test_decoder_input_prepends_start(self):
        gt = jnp.array([[5, 6, 0], [7, 0, 0]], dtype=jnp.int32)
        out = tokens.decoder_input(gt, start_token=99)
        np.testing.assert_array_equal(
            np.asarray(out), [[99, 5, 6, 0], [99, 7, 0, 0]])

    def test_decoder_target_scan_from_1(self):
        # Reference LanguageModule.get_target(make_target=True): first NULL
        # at t>=1 becomes END; full-length rows get END in the pad column.
        gt = jnp.array([[5, 6, 0], [7, 8, 9], [0, 0, 0]], dtype=jnp.int32)
        out = tokens.decoder_target(gt, end_token=42, scan_from=1)
        np.testing.assert_array_equal(
            np.asarray(out),
            [[5, 6, 42, 0], [7, 8, 9, 42], [0, 42, 0, 0]])

    def test_decoder_target_scan_from_0(self):
        # Transformer variant scans from t=0 (TransformerModule.py:296).
        gt = jnp.array([[0, 0], [3, 0]], dtype=jnp.int32)
        out = tokens.decoder_target(gt, end_token=9, scan_from=0)
        np.testing.assert_array_equal(np.asarray(out), [[9, 0, 0], [3, 9, 0]])

    def test_reference_parity_loop(self):
        # Cross-check the vectorized form against a literal port of the
        # reference's python loop on random data.
        rng = np.random.RandomState(0)
        gt = rng.randint(0, 5, size=(16, 7)).astype(np.int32)
        end = 42
        ref = np.concatenate([gt, np.zeros((16, 1), np.int32)], axis=1)
        for i in range(16):
            for t in range(1, 8):
                if ref[i, t] == 0:
                    ref[i, t] = end
                    break
        out = tokens.decoder_target(jnp.asarray(gt), end, scan_from=1)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_densecap_token_spec(self):
        spec = tokens.TokenSpec.densecap(100)
        assert (spec.start, spec.end, spec.num_embeddings) == (98, 99, 103)


class TestLossParity:
    @pytest.mark.parametrize("smoothing", [0.0, 0.1])
    def test_smoothed_ce_matches_torch(self, smoothing):
        rng = np.random.RandomState(1)
        n, t, c = 4, 6, 11
        logits = rng.randn(n, t, c).astype(np.float32)
        targets = rng.randint(0, c, size=(n, t)).astype(np.int64)
        targets[0, 3] = 0
        targets[2, :] = 0  # fully-ignored row
        want = torch.nn.CrossEntropyLoss(
            reduction="mean", ignore_index=0, label_smoothing=smoothing)(
            torch.from_numpy(logits).view(-1, c),
            torch.from_numpy(targets).view(-1)).item()
        got = float(losses.smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets),
            label_smoothing=smoothing))
        assert got == pytest.approx(want, rel=1e-5)

    def test_temporal_ce_matches_torch_mean_over_valid(self):
        rng = np.random.RandomState(2)
        logits = rng.randn(3, 5, 9).astype(np.float32)
        targets = rng.randint(1, 9, size=(3, 5)).astype(np.int64)
        targets[1, 4] = 0
        want = torch.nn.CrossEntropyLoss(reduction="mean", ignore_index=0)(
            torch.from_numpy(logits).view(-1, 9),
            torch.from_numpy(targets).view(-1)).item()
        got = float(losses.temporal_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_sum_ce_divides_by_nonnull_count(self):
        # DenseCap LSTMLoss.CustomCrossEntropyLoss: sum over non-null
        # divided by the NON-NULL count (`size = target.nonzero().numel()
        # / 2`, LSTMLoss.py:36) — differential-pinned in
        # test_reference_differential.py.
        rng = np.random.RandomState(3)
        logits = rng.randn(2, 4, 7).astype(np.float32)
        targets = np.array([[1, 2, 0, 0], [3, 0, 0, 0]], dtype=np.int64)
        ce = torch.nn.CrossEntropyLoss(reduction="sum", ignore_index=0)(
            torch.from_numpy(logits).view(-1, 7),
            torch.from_numpy(targets).view(-1)).item()
        want = ce / 3.0
        got = float(losses.sum_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_logistic_criterion_matches_bce(self):
        rng = np.random.RandomState(4)
        scores = rng.randn(32).astype(np.float32)
        labels = (rng.rand(32) > 0.5).astype(np.float32)
        want = torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(scores), torch.from_numpy(labels)).item()
        got = float(losses.logistic_criterion(
            jnp.asarray(scores), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_doubly_stochastic_regularizer(self):
        alphas = jnp.ones((2, 4, 10)) / 4.0  # sums to 1 → zero penalty
        assert float(losses.doubly_stochastic_regularizer(alphas)) == pytest.approx(0.0)
        alphas2 = jnp.zeros((2, 4, 10))
        assert float(losses.doubly_stochastic_regularizer(alphas2)) == pytest.approx(1.0)

    def test_box_regression_masks_insane_targets(self):
        pred = jnp.zeros((3, 4))
        tgt = jnp.array([[1.0, 0, 0, 0], [100.0, 0, 0, 0], [2.0, 0, 0, 0]])
        got = float(losses.box_regression_loss(pred, tgt, weight=1.0))
        # rows 0 and 2 sane: smooth_l1(1)=0.5, smooth_l1(2)=1.5; mean over
        # 4 coords; the reference's SmoothL1Loss 'mean' keeps the masked
        # row in the denominator (3 rows), contributing zero.
        want = ((0.5 / 4) + (1.5 / 4)) / 3
        assert got == pytest.approx(want, rel=1e-6)
