"""Shortened quality-parity run (see quality_parity.py): the reference's
own torch modules trained next to our framework from identical ported
init on identical batches must produce matching loss curves across the
frozen→finetune boundary, and each side's own eval harness must score
its decodes near-identically."""

import os
import sys

import numpy as np
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

    # the process-wide torch.Tensor.cuda shim the torch side installs
    # must not leak to later in-process callers
    import torch
    assert "lambda" not in repr(torch.Tensor.cuda)


def test_transformer_family_training_run_matches():
    """The transformer family under the REAL two-group AdamW
    (train_Transformer.py:72-83): llm at (lr, wd=0.1), features at base
    lr=0 with weight_decay=lr — the encoder never updates, even after
    the requires_grad_(True) unfreeze at the boundary."""
    qp = _qp()
    report = qp.run(steps=30, bs=8, num_images=24,
                    seq_length=8, hw=32, family="transformer")
    a = report["agreement"]
    assert a["max_rel_loss_diff_all"] < 2e-3, a
    assert a["meteor_abs_diff"] < 0.02, a


def test_vitb_family_training_run_matches():
    """The ViT-B family in the pretrained flagship shape: frozen mini
    ViT encoder with torchvision naming + the reference's own
    VitbModel.Decoder, AdamW via the collect_params split
    (train_ViTB.py:51-73)."""
    qp = _qp()
    report = qp.run(steps=30, bs=8, num_images=24,
                    seq_length=8, hw=32, family="vitb")
    a = report["agreement"]
    assert a["max_rel_loss_diff_all"] < 2e-3, a
    assert a["meteor_abs_diff"] < 0.02, a


def test_control_run_reports_divergence_envelope():
    """--control reruns the torch side from rel-1e-7 perturbed init and
    with per-step 1e-7 noise, reports both torch-vs-torch envelopes,
    and runs the trajectory-pinned defect probe: torch params entering
    probed steps, ported into our model, must reproduce that step's
    loss to fp32 epsilon (drift = iterated feedback, not a biased
    step)."""
    qp = _qp()
    report = qp.run(steps=10, bs=8, lr=4e-4, num_images=24,
                    seq_length=8, hw=32, control=True)
    a = report["agreement"]
    assert "control_max_rel_diff_all" in a
    assert np.isfinite(a["control_max_rel_diff_all"])
    assert len(report["control"]["losses"]) == 10
    assert "control_step_max_rel_diff_all" in a
    assert np.isfinite(a["control_step_max_rel_diff_all"])

    d = report["trajectory_defect"]
    # probes include step 0, both sides of the boundary, and the tail
    assert 0 in d["steps"] and (len(report["torch"]["losses"]) - 1) \
        in d["steps"]
    # fp32-epsilon agreement at EVERY probe — this is the core claim
    assert a["trajectory_defect_max_rel_loss_diff"] < 1e-5, d
