"""Shortened quality-parity run (see quality_parity.py): the reference's
own torch modules trained next to our framework from identical ported
init on identical batches must produce matching loss curves across the
frozen→finetune boundary, and each side's own eval harness must score
its decodes near-identically."""

import os
import sys

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


def _qp():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    try:
        import quality_parity as qp
    finally:
        sys.path.pop(0)
    return qp


def test_miniature_training_run_matches():
    qp = _qp()
    # 40 steps, boundary at 20: both optimizer phases exercised
    report = qp.run(steps=40, bs=8, lr=4e-4, num_images=24,
                    seq_length=8, hw=32)
    a = report["agreement"]

    # fp32 curves track each other closely on both sides of the
    # unfreeze (the boundary is where lr-masked-Adam vs fresh-Adam
    # semantics would diverge — gate_until keeps them identical)
    assert a["max_rel_loss_diff_all"] < 2e-3, a
    assert a["mean_rel_loss_diff_all"] < 5e-4, a

    # decodes from identically-trained models score identically under
    # each side's own NLTK harness (identical curves do not guarantee
    # identical argmax decodes — this pins the eval path end to end)
    assert a["meteor_abs_diff"] < 0.02, a
    assert a["bleu_abs_diff"] < 0.02, a


def test_attention_family_training_run_matches():
    """Same differential for the Show-Attend-Tell family: per-step
    LSTMCell + additive attention + f_beta gate + doubly-stochastic
    regularizer, under optimization."""
    qp = _qp()
    report = qp.run(steps=30, bs=8, lr=4e-4, num_images=24,
                    seq_length=8, hw=32, family="attention")
    a = report["agreement"]
    assert a["max_rel_loss_diff_all"] < 2e-3, a
    assert a["meteor_abs_diff"] < 0.02, a
