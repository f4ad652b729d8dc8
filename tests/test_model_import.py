"""Full trained-checkpoint import (`convert_checkpoint.py import-model`):
the reference's saved `model.state_dict()` → our captioner variables.

Each family's state_dict is synthesized from reference-shaped torch
twins (the reference's OWN decoder modules via refload + hand-built
encoders with torchvision's exact module naming — torchvision itself is
not installed in this environment). The import must (a) auto-detect the
family, (b) infer the architecture dims, (c) produce a tree structurally
identical to the matching captioner's `init`, and (d) — for the resnet
encoder, whose `features.N` Sequential renumbering is new here —
reproduce the torch logits through the full model.

Reference: `AlexCap/LSTMModel.py:18-27` (the encoder Sequential),
`train_LSTM.py:122-125` (checkpoint = `model.state_dict()`),
`AlexCap/VitbModel.py:159-168` (`proj`/`class_token`/`encoder` naming).
"""

import os

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")

V, W, H, T, B = 20, 16, 24, 7, 2


def _refload(relpath, name):
    from imagecaptioning_tpu.utils.refload import load_reference_module
    return load_reference_module(relpath, name)


def _assert_export_roundtrip(twin, variables, family):
    """export_reference_captioner must invert the import bit-exactly,
    and the exported dict must load into the torch twin (strict=True —
    every key present, every shape right)."""
    import torch

    from imagecaptioning_tpu.utils import torch_port as tp

    sd = {k: np.asarray(v) for k, v in twin.state_dict().items()}
    exported, meta = tp.export_reference_captioner(variables)
    assert meta["family"] == family
    assert set(exported) == set(sd), sorted(set(exported) ^ set(sd))
    for k in sd:
        np.testing.assert_array_equal(np.asarray(exported[k]), sd[k],
                                      err_msg=k)
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in exported.items()}, strict=True)


def _assert_same_structure(got, want_template):
    """Same key paths AND same shapes as a freshly-initialized tree."""
    from imagecaptioning_tpu.utils.pretrained import flatten_tree
    got, want = flatten_tree(got), flatten_tree(want_template)
    assert set(got) == set(want), sorted(set(got) ^ set(want))
    for k in want:
        assert np.shape(got[k]) == np.shape(want[k]), (
            k, np.shape(got[k]), np.shape(want[k]))


def _seq_resnet_twin():
    """`nn.Sequential(*resnet.children())[:-2]` (LSTMModel.py:26-27) with
    torchvision's real stage widths but one bottleneck per stage."""
    import torch.nn as tnn
    from test_backbones import TorchBottleneck, _randomize_bn_stats

    blocks, inplanes = [], 64
    for stage, planes in enumerate((64, 128, 256, 512)):
        stride = 1 if stage == 0 else 2
        blocks.append(tnn.Sequential(
            TorchBottleneck(inplanes, planes, stride=stride,
                            downsample=True)))
        inplanes = planes * 4
    seq = tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
        tnn.ReLU(), tnn.MaxPool2d(3, 2, 1), *blocks)
    _randomize_bn_stats(seq)
    return seq


@pytest.fixture(scope="module")
def lstm_resnet_twin():
    """Reference-keyed LSTM-family checkpoint over the resnet encoder."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(11)
    ref_mod = _refload("AlexCap/LanguageModule.py", "mi_ref_lm")

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = _seq_resnet_twin()
            self.llm = ref_mod.LanguageModel(
                vocab_size=V, embedding_size=W, image_vector_dim=2048,
                rnn_size=H, seq_length=T, num_layers=1,
                idx_to_token={}, dropout=0.0, device="cpu")

        def forward(self, images, gt):
            f = self.features(images)
            f = f.reshape(f.size(0), f.size(1), -1).permute(0, 2, 1)
            return self.llm(f, gt)

    return Twin().eval()


def test_lstm_resnet_import_matches_torch_logits(lstm_resnet_twin):
    import torch

    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.captioners import LSTMCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    sd = lstm_resnet_twin.state_dict()
    variables, meta = tp.convert_reference_captioner(sd)
    assert meta["family"] == "lstm"
    assert meta["encoder"] == "resnet-custom"
    assert meta["backbone_stages"] == (1, 1, 1, 1)
    assert meta["vocab_size"] == V and meta["rnn_size"] == H
    assert meta["embedding_size"] == W and meta["num_layers"] == 1

    model = LSTMCaptioner(vocab_size=V, embedding_size=W, rnn_size=H,
                          num_layers=1, dropout=0.0, use_vggface=False,
                          backbone_stages=meta["backbone_stages"])
    rng = np.random.RandomState(5)
    img = rng.rand(B, 64, 64, 3).astype(np.float32)
    gt = rng.randint(1, V + 1, size=(B, T)).astype(np.int64)
    gt[0, 4:] = 0

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(gt.astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])
    _assert_same_structure(variables["batch_stats"], init["batch_stats"])

    with torch.no_grad():
        want = lstm_resnet_twin(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(gt)).numpy()
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, variables["params"]),
         "batch_stats": jax.tree.map(jnp.asarray,
                                     variables["batch_stats"])},
        jnp.asarray(img), jnp.asarray(gt.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out.logits), want,
                               rtol=1e-4, atol=1e-4)

    _assert_export_roundtrip(lstm_resnet_twin, variables, "lstm")


def test_import_model_cli_roundtrip(lstm_resnet_twin, tmp_path):
    """torch.save'd checkpoint → CLI import-model → restore_params."""
    import torch

    from convert_checkpoint import main as cc_main
    from imagecaptioning_tpu.utils import torch_port as tp
    from imagecaptioning_tpu.utils.checkpoint import restore_params
    from imagecaptioning_tpu.utils.pretrained import flatten_tree

    src = tmp_path / "best_model_LSTM_resnet_ft6_bs12_clip.pth"
    torch.save(lstm_resnet_twin.state_dict(), str(src))
    dst = tmp_path / "ckpt_lstm"
    cc_main(["import-model", "--src", str(src), "--dst", str(dst)])

    params, batch_stats = restore_params(str(dst))
    want, _ = tp.convert_reference_captioner(lstm_resnet_twin.state_dict())
    for got_tree, want_tree in ((params, want["params"]),
                                (batch_stats, want["batch_stats"])):
        got, ref = flatten_tree(got_tree), flatten_tree(want_tree)
        assert set(got) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]))

    # and back out: export-model over the imported dir must reproduce
    # the original torch checkpoint bit-for-bit
    back = tmp_path / "back.pth"
    cc_main(["export-model", "--src", str(dst), "--dst", str(back)])
    sd_back = torch.load(str(back))
    sd_orig = lstm_resnet_twin.state_dict()
    assert set(sd_back) == set(sd_orig)
    for k in sd_orig:
        np.testing.assert_array_equal(sd_back[k].numpy(),
                                      sd_orig[k].numpy(), err_msg=k)


def test_attention_vggface_import_structure():
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.captioners import AttentionCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    torch.manual_seed(12)
    ref_att = _refload("AlexCap/AttentionLanguageModule.py", "mi_ref_att")
    trunk = tp.build_torch_vgg_trunk()

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = trunk.features
            self.llm = ref_att.Decoder(
                vocab_size=V, embedding_size=W, image_vector_dim=512,
                rnn_size=H, seq_length=T, idx_to_token={}, dropout=0.0,
                device="cpu")

    twin = Twin()
    sd = twin.state_dict()
    variables, meta = tp.convert_reference_captioner(sd)
    _assert_export_roundtrip(twin, variables, "attention")
    assert meta["family"] == "attention" and meta["encoder"] == "vggface"
    assert (meta["vocab_size"], meta["embedding_size"],
            meta["rnn_size"]) == (V, W, H)

    model = AttentionCaptioner(vocab_size=V, embedding_size=W, rnn_size=H,
                               dropout=0.0, use_vggface=True)
    rng = np.random.RandomState(6)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(B, 32, 32, 3).astype(np.float32)),
        jnp.asarray(rng.randint(1, V + 1, size=(B, T)).astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])
    assert variables["batch_stats"] == {}


def test_transformer_vggface_import_structure():
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.captioners import TransformerCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    torch.manual_seed(13)
    ref_tr = _refload("AlexCap/TransformerModule.py", "mi_ref_tr")
    trunk = tp.build_torch_vgg_trunk()
    L, E = 2, 32

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = trunk.features
            self.llm = ref_tr.Transformer(
                src_vocab_size=V, fc_dim=512, token_dict={},
                max_length=T, patch_size=2, embed_size=E,
                num_layers=L, heads=4, dropout=0.0, device="cpu")

    twin = Twin()
    sd = twin.state_dict()
    variables, meta = tp.convert_reference_captioner(sd)
    _assert_export_roundtrip(twin, variables, "transformer")
    assert meta["family"] == "transformer" and meta["encoder"] == "vggface"
    assert (meta["vocab_size"], meta["embed_size"],
            meta["num_layers"]) == (V, E, L)

    model = TransformerCaptioner(vocab_size=V, max_length=T, embed_size=E,
                                 num_layers=L, heads=4, dropout=0.0,
                                 use_vggface=True, patch_size_override=2)
    rng = np.random.RandomState(7)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(B, 32, 32, 3).astype(np.float32)),
        jnp.asarray(rng.randint(1, V + 1, size=(B, T)).astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])


def _gt_twin(use_lstm):
    """AlexGTModel.AlexCapModel's state_dict layout (AlexDenseModel.py:
    20-47): trunk + VGG classifier[:-1], BOTH also registered inside
    `net.*`, plus the reference's own dense caption head."""
    import torch
    import torch.nn as tnn

    from imagecaptioning_tpu.utils import torch_port as tp

    torch.manual_seed(15)
    trunk = tp.build_torch_vgg_trunk()

    class Twin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = trunk.features
            self.classifier = tnn.Sequential(
                tnn.Linear(25088, 4096), tnn.ReLU(), tnn.Dropout(0.0),
                tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(0.0))
            self.net = tnn.Sequential()
            self.net.add_module("vgg16_backbone", self.features)
            self.net.add_module("full_conv", self.classifier)
            if use_lstm:
                lm = _refload("AlexGTModel/AlexDenseLangage.py",
                              "mi_ref_gtlm")
                self.llm = lm.LanguageModel(V, W, 4096, H, T, 1, {},
                                            0.0, "cpu", False)
            else:
                tr = _refload("AlexGTModel/AlexTransformer.py",
                              "mi_ref_gttr")
                self.llm = tr.Transformer(
                    src_vocab_size=V + 3, fc_dim=4096, token_dict={},
                    max_length=T + 1, embed_size=32, num_layers=2,
                    heads=4, dropout=0.0, device="cpu")

    return Twin()


def test_gt_lstm_import_structure_and_roundtrip():
    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.densecap import GTDenseCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    twin = _gt_twin(use_lstm=True)
    variables, meta = tp.convert_reference_captioner(twin.state_dict())
    assert meta == {"family": "gt", "use_lstm": True, "vocab_size": V,
                    "embedding_size": W, "rnn_size": H, "num_layers": 1}

    model = GTDenseCaptioner(vocab_size=V, seq_length=T, use_lstm=True,
                             embedding_size=W, rnn_size=H, dropout=0.0)
    rng = np.random.RandomState(9)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
        jnp.asarray([[[32.0, 32.0, 30.0, 30.0], [20.0, 20.0, 16.0, 16.0]]]),
        jnp.asarray(rng.randint(1, V + 1, size=(1, 2, T)).astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])
    _assert_export_roundtrip(twin, variables, "gt")


def test_gt_transformer_import_structure_and_roundtrip():
    import torch

    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.densecap import GTDenseCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    twin = _gt_twin(use_lstm=False)
    # the GT transformer's encoder word_embedding and position rows 1+
    # never participate in the forward pass (length-1 ROI sequence,
    # AlexTransformer.py:111,313-316); the export re-emits them as
    # zeros, so zero them here for the bit-equality round trip
    with torch.no_grad():
        twin.llm.encoder.word_embedding.weight.zero_()
        twin.llm.encoder.position_embedding.weight[1:].zero_()

    variables, meta = tp.convert_reference_captioner(twin.state_dict())
    assert meta == {"family": "gt", "use_lstm": False, "vocab_size": V,
                    "embed_size": 32, "num_layers": 2}

    model = GTDenseCaptioner(vocab_size=V, seq_length=T, use_lstm=False,
                             embed_size=32, num_layers=2, heads=4,
                             dropout=0.0)
    rng = np.random.RandomState(10)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)),
        jnp.asarray([[[32.0, 32.0, 30.0, 30.0], [20.0, 20.0, 16.0, 16.0]]]),
        jnp.asarray(rng.randint(1, V + 1, size=(1, 2, T)).astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])
    _assert_export_roundtrip(twin, variables, "gt")


def test_vitb_import_structure_and_dims():
    """The real VitbModel stores torchvision's conv_proj as `proj`
    (VitbModel.py:159) — the importer must rename it back, infer the
    ViT dims from the checkpoint, and emit a ViTCaptioner-shaped tree."""
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.models.captioners import ViTCaptioner
    from imagecaptioning_tpu.utils import torch_port as tp

    torch.manual_seed(14)
    mod = _refload("AlexCap/VitbModel.py", "mi_ref_vitb")
    HID, L, HEADS, MLP, PATCH, IMG = 32, 2, 4, 64, 16, 64
    n_tokens = (IMG // PATCH) ** 2 + 1

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(HID, eps=1e-6)
            self.self_attention = tnn.MultiheadAttention(
                HID, HEADS, batch_first=True)
            self.ln_2 = tnn.LayerNorm(HID, eps=1e-6)
            self.mlp = tnn.Sequential(tnn.Linear(HID, MLP), tnn.GELU(),
                                      tnn.Dropout(0.0),
                                      tnn.Linear(MLP, HID))

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            from collections import OrderedDict
            self.pos_embedding = tnn.Parameter(
                torch.empty(1, n_tokens, HID).normal_(std=0.02))
            self.layers = tnn.Sequential(OrderedDict(
                (f"encoder_layer_{i}", Block()) for i in range(L)))
            self.ln = tnn.LayerNorm(HID, eps=1e-6)

    class Twin(tnn.Module):
        """VitTransformer's attribute naming (VitbModel.py:159-168)."""

        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, HID, PATCH, PATCH)
            self.class_token = tnn.Parameter(torch.zeros(1, 1, HID))
            self.encoder = Enc()
            self.decoder = mod.Decoder(
                trg_vocab_size=V + 3, embed_size=HID, num_layers=L,
                heads=HEADS, forward_expansion=4, dropout=0.0,
                device="cpu", max_length=T + 1)

    twin = Twin()
    sd = twin.state_dict()
    variables, meta = tp.convert_reference_captioner(sd, vit_heads=HEADS)
    _assert_export_roundtrip(twin, variables, "vitb")
    assert meta["family"] == "vitb"
    assert (meta["vocab_size"], meta["embedding_size"]) == (V, HID)
    assert (meta["vit_encoder_layers"], meta["num_layers"]) == (L, L)
    assert (meta["patch_size"], meta["image_size"]) == (PATCH, IMG)

    model = ViTCaptioner(vocab_size=V, max_length=T, embed_size=HID,
                         num_layers=L, heads=HEADS, dropout=0.0,
                         image_size=IMG, vit_patch=PATCH, vit_layers=L,
                         vit_heads=HEADS, vit_hidden=HID, vit_mlp=MLP)
    rng = np.random.RandomState(8)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32)),
        jnp.asarray(rng.randint(1, V + 1, size=(B, T)).astype(np.int32)))
    _assert_same_structure(variables["params"], init["params"])


def test_imported_checkpoint_serves_through_infer_cli(lstm_resnet_twin,
                                                      tmp_path):
    """The complete migration seam a reference user actually walks:
    `model.state_dict()` .pth → `convert_checkpoint.py import-model` →
    `infer.py` captions an image folder from the imported checkpoint
    (dims passed as --set overrides, printed by import-model's meta)."""
    import json

    import torch
    from PIL import Image

    import infer
    from convert_checkpoint import main as cc_main

    src = tmp_path / "best_model_LSTM_resnet_ft6_bs12_clip.pth"
    torch.save(lstm_resnet_twin.state_dict(), str(src))
    ckpt = tmp_path / "ckpt"
    cc_main(["import-model", "--src", str(src), "--dst", str(ckpt)])

    # dicts JSON with vocab_size == V (1-indexed real tokens, the
    # reference's my_model_preprocess.py dicts schema)
    t2i = {f"w{i}": i for i in range(1, V + 1)}
    dicts = tmp_path / "dicts.json"
    with open(dicts, "w") as f:
        json.dump({"token_to_idx": t2i,
                   "idx_to_token": {str(i): t for t, i in t2i.items()}},
                  f)
    imdir = tmp_path / "photos"
    imdir.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, size=(218, 178, 3),
                                    dtype=np.uint8)).save(
            str(imdir / f"p{i}.jpg"))

    res = infer.main([
        "--model-type", "lstm", "--ckpt", str(ckpt),
        "--dicts", str(dicts), "--images", str(imdir),
        "--seq-length", str(T), "--beam", "2",
        "--set", f"embedding_size={W}", f"lstm_size={H}",
        "backbone_stages=1,1,1,1", "use_vggface=False",
        "compute_dtype=float32"])
    assert len(res) == 2
    assert all(isinstance(c, str) for c in res.values())
