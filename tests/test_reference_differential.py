"""Differential parity: run the REFERENCE preprocessor (imported from
/root/reference — no torch dependency) and ours on identical raw inputs
and diff the artifacts field by field.

The one documented divergence is vocabulary id assignment: the reference
iterates a Python set (hash order, PARITY.md), so label matrices are
compared after decoding through each side's own dicts; everything else
must match exactly. Skipped when the reference checkout is absent.
"""

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


from imagecaptioning_tpu.utils.refload import (  # noqa: E402
    EasyDict as _EasyDict, load_reference_module)


def _ensure_torchvision_ops():
    """Give the torchvision stub an `ops.box_iou` (independent torch
    corner-IoU implementation) for reference modules that call it."""
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "ops"):
        tv.ops = types.ModuleType("torchvision.ops")
        sys.modules["torchvision.ops"] = tv.ops

        def box_iou(a, b):
            area = lambda t: ((t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1]))
            lt = torch.max(a[:, None, :2], b[None, :, :2])
            rb = torch.min(a[:, None, 2:], b[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[..., 0] * wh[..., 1]
            return inter / (area(a)[:, None] + area(b)[None] - inter)

        tv.ops.box_iou = box_iou
    return tv


# shared shim-and-import helper (utils/refload.py); the historic local
# name is kept because other test modules reach it via this module
_load_reference_module = load_reference_module


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


class TestReferenceLanguageModule:
    """Differential: the reference's LSTM decoder (AlexCap/
    LanguageModule.py, CPU-instantiable) with weights ported into our
    LanguageHead — teacher-forced logits, target construction, and
    greedy decode must agree."""

    V, W, D, H, T, B, P = 20, 16, 32, 24, 7, 3, 5

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.heads import LanguageHead
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(0)
        ref_mod = _load_reference_module("AlexCap/LanguageModule.py",
                                         "ref_language_module")
        ref = ref_mod.LanguageModel(
            vocab_size=self.V, embedding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, num_layers=1,
            idx_to_token={}, dropout=0.0, device="cpu")
        ref.eval()
        sd = ref.state_dict()

        head = LanguageHead(vocab_size=self.V, embedding_size=self.W,
                            rnn_size=self.H, num_layers=1, dropout=0.0)
        params = {
            "image_encoder": tp.convert_linear(sd, "image_encoder.encode"),
            "lookup_table": tp.convert_embedding(sd, "lookup_table"),
            "lstm": tp.convert_lstm(sd, "lstm", num_layers=1),
            "linear": tp.convert_linear(sd, "rnn.linear"),
        }
        params = jax.tree.map(jnp.asarray, params)
        return ref, head, params

    def _inputs(self):
        import torch
        rng = np.random.RandomState(7)
        img = rng.randn(self.B, self.P, self.D).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[0, 4:] = 0                      # mid-sequence padding
        gt[1, :] = rng.randint(1, self.V + 1, self.T)   # full row
        return img, gt, torch

    def test_teacher_forced_logits_match(self, pair):
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens

        ref, head, params = pair
        img, gt, torch = self._inputs()
        with torch.no_grad():
            want = ref(torch.from_numpy(img),
                       torch.from_numpy(gt)).numpy()
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V + 1)
        got = head.apply({"params": params}, jnp.asarray(img), dec_in,
                         deterministic=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)

    def test_get_target_matches(self, pair):
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens

        ref, head, params = pair
        _, gt, torch = self._inputs()
        want_in = ref.get_target(torch.from_numpy(gt)).numpy()
        want_tgt = ref.get_target(torch.from_numpy(gt),
                                  make_target=True).numpy()
        gt_j = jnp.asarray(gt.astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(tokens.decoder_input(gt_j, self.V + 1)), want_in)
        np.testing.assert_array_equal(
            np.asarray(tokens.decoder_target(gt_j, self.V + 2,
                                             scan_from=1)), want_tgt)

    def test_greedy_decode_matches(self, pair):
        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding

        ref, head, params = pair
        img, _, torch = self._inputs()
        with torch.no_grad():
            want = ref.predict_caption(torch.from_numpy(img)).numpy()

        state = head.apply({"params": params}, jnp.asarray(img),
                           method=head.init_state)

        def step(carry, toks, t):
            logits, carry = head.apply({"params": params}, toks, carry,
                                       method=head.step)
            return carry, logits, jnp.zeros((toks.shape[0], 1),
                                            jnp.float32)

        got, _ = decoding.greedy_decode(step, state, self.B, self.V + 1,
                                        self.T + 1)
        got = np.asarray(got)
        # the reference zeroes the tail after all rows emit END; compare
        # per row up to and including the first END
        for b in range(self.B):
            w = want[b]
            g = got[b]
            end = self.V + 2
            w_end = np.argmax(w == end) if (w == end).any() else len(w)
            g_end = np.argmax(g == end) if (g == end).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])


class TestReferenceTransformerModule:
    """Differential: the reference's from-scratch Transformer
    (AlexCap/TransformerModule.py, device-parameterized) with weights
    ported into ops/transformer — teacher-forced logits, target masks,
    and our KV-CACHED greedy decode vs the reference's full-prefix
    recomputation loop must agree."""

    V, FC, E, L, HEADS, T, B, PATCH = 20, 32, 32, 2, 4, 7, 3, 3

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(1)
        ref_mod = _load_reference_module("AlexCap/TransformerModule.py",
                                         "ref_transformer_module")
        ref = ref_mod.Transformer(
            src_vocab_size=self.V, fc_dim=self.FC, token_dict={},
            max_length=self.T, patch_size=self.PATCH,
            embed_size=self.E, num_layers=self.L, heads=self.HEADS,
            forward_expansion=4, dropout=0.0, device="cpu")
        ref.eval()
        sd = ref.state_dict()

        conv = tp.convert_reference_transformer(sd, num_layers=self.L)
        to_j = lambda tree: jax.tree.map(jnp.asarray, tree)
        return (ref, to_j(conv["fc"]), to_j(conv["encoder"]),
                to_j(conv["decoder"]))

    def _modules(self):
        from imagecaptioning_tpu.ops.transformer import Decoder, Encoder
        enc = Encoder(embed_size=self.E, num_layers=self.L,
                      heads=self.HEADS, forward_expansion=4, dropout=0.0,
                      patch_length=self.PATCH ** 2)
        dec = Decoder(vocab_out=self.V + 3, embed_size=self.E,
                      num_layers=self.L, heads=self.HEADS,
                      forward_expansion=4, dropout=0.0,
                      max_length=self.T + 1)
        return enc, dec

    def _inputs(self):
        import torch
        rng = np.random.RandomState(11)
        grid = rng.randn(self.B, self.PATCH ** 2, self.FC).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[0, 5:] = 0
        return grid, gt, torch

    def _encode(self, fc, enc_params, grid):
        import jax.numpy as jnp
        enc_mod, _ = self._modules()
        word_vec = jnp.maximum(
            jnp.asarray(grid) @ fc["kernel"] + fc["bias"], 0.0)
        return enc_mod.apply({"params": enc_params}, word_vec, None,
                             deterministic=True)

    def test_teacher_forced_logits_match(self, pair):
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens
        from imagecaptioning_tpu.ops.transformer import make_trg_mask

        ref, fc, enc_params, dec_params = pair
        grid, gt, torch = self._inputs()
        with torch.no_grad():
            want = ref(torch.from_numpy(grid), torch.from_numpy(gt)).numpy()
        _, dec_mod = self._modules()
        enc = self._encode(fc, enc_params, grid)
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V + 1)
        logits, _ = dec_mod.apply({"params": dec_params}, dec_in, enc,
                                  None, make_trg_mask(dec_in),
                                  deterministic=True)
        np.testing.assert_allclose(np.asarray(logits), want,
                                   rtol=2e-4, atol=2e-4)

    def test_trg_mask_matches(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops.transformer import make_trg_mask

        ref, *_ = pair
        _, gt, _ = self._inputs()
        for key_masking in (True, False):
            want = ref.make_trg_mask(torch.from_numpy(gt),
                                     key_masking).numpy()
            got = np.asarray(make_trg_mask(jnp.asarray(gt.astype(np.int32)),
                                           key_masking))
            np.testing.assert_array_equal(got, want)

    def test_cached_greedy_matches_reference_loop(self, pair):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding

        ref, fc, enc_params, dec_params = pair
        grid, _, _ = self._inputs()
        with torch.no_grad():
            want = ref(torch.from_numpy(grid),
                       torch.empty(0)).numpy()        # greedy loop

        _, dec_mod = self._modules()
        enc = self._encode(fc, enc_params, grid)
        max_steps = self.T + 1
        toks0 = jnp.zeros((self.B, max_steps), jnp.int32)
        _, variables = dec_mod.apply(
            {"params": dec_params}, toks0, enc, None, None,
            decode=True, decode_position=jnp.array(0, jnp.int32),
            mutable=["cache"])
        cache = variables["cache"]

        def step(carry, toks, t):
            (logits, _), mut = dec_mod.apply(
                {"params": dec_params, "cache": carry}, toks, enc,
                None, None, decode=True, decode_position=t,
                mutable=["cache"])
            return mut["cache"], logits[:, 0], jnp.zeros(
                (toks.shape[0], 1), jnp.float32)

        got, _ = decoding.greedy_decode(step, cache, self.B, self.V + 1,
                                        max_steps)
        got = np.asarray(got)
        end = self.V + 2
        for b in range(self.B):
            w, g = want[b], got[b]
            w_end = np.argmax(w == end) if (w == end).any() else len(w)
            g_end = np.argmax(g == end) if (g == end).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])


class TestReferenceAttentionModule:
    """Differential: the reference's Show-Attend-Tell decoder
    (AlexCap/AttentionLanguageModule.py) with weights ported into our
    AttentionHead. The reference hard-codes `.cuda()` on two buffers in
    its teacher-forced path; the fixture no-ops Tensor.cuda for the
    comparison (pure data movement, no math)."""

    V, W, D, H, T, B, P = 18, 16, 24, 20, 6, 3, 5

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.heads import AttentionHead

        torch.manual_seed(2)
        ref_mod = _load_reference_module(
            "AlexCap/AttentionLanguageModule.py", "ref_attention_module")
        ref = ref_mod.Decoder(
            vocab_size=self.V, embedding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, idx_to_token={}, dropout=0.0,
            device="cpu")
        ref.eval()
        ref.use_beam = False
        sd = {k: np.asarray(v) for k, v in ref.state_dict().items()}

        lin = lambda p: {"kernel": sd[f"{p}.weight"].T,
                         "bias": sd[f"{p}.bias"]}
        params = {
            "init_h": lin("init_h"),
            "init_c": lin("init_c"),
            "embedding": {"embedding": sd["embedding.weight"]},
            "att_W_kernel": sd["attention.W.weight"].T,
            "att_W_bias": sd["attention.W.bias"],
            "att_U_kernel": sd["attention.U.weight"].T,
            "att_U_bias": sd["attention.U.bias"],
            "att_v_kernel": sd["attention.v.weight"].T,
            "att_v_bias": sd["attention.v.bias"],
            "f_beta_kernel": sd["f_beta.weight"].T,
            "f_beta_bias": sd["f_beta.bias"],
            "deep_output_kernel": sd["deep_output.weight"].T,
            "deep_output_bias": sd["deep_output.bias"],
            "cell_w_ih": sd["lstm.weight_ih"],
            "cell_w_hh": sd["lstm.weight_hh"],
            "cell_b_ih": sd["lstm.bias_ih"],
            "cell_b_hh": sd["lstm.bias_hh"],
        }
        head = AttentionHead(vocab_size=self.V, embedding_size=self.W,
                             encoder_dim=self.D, rnn_size=self.H,
                             dropout=0.0)
        return ref, head, jax.tree.map(jnp.asarray, params)

    def _inputs(self):
        import torch
        rng = np.random.RandomState(13)
        img = rng.randn(self.B, self.P, self.D).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[2, 3:] = 0
        return img, gt, torch

    def test_teacher_forced_logits_and_alphas_match(self, pair,
                                                    monkeypatch):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens

        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        ref, head, params = pair
        img, gt, _ = self._inputs()
        with torch.no_grad():
            want_logits, want_alphas = ref(torch.from_numpy(img),
                                           torch.from_numpy(gt))
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V + 1)
        got_logits, got_alphas = head.apply(
            {"params": params}, jnp.asarray(img), dec_in,
            deterministic=True)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   want_logits.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_alphas),
                                   want_alphas.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_greedy_decode_matches(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding

        ref, head, params = pair
        img, _, _ = self._inputs()
        # the reference's greedy branch trips a torch-version shape
        # error on modern torch (`preds[:, t] = token` with token (B,1),
        # AttentionLanguageModule.py:109); run the same loop with only
        # that assignment shimmed (.squeeze(1)) using ref's own modules.
        with torch.no_grad():
            timg = torch.from_numpy(img)
            h, c = ref.get_init_lstm_state(timg)
            emb = ref.embedding(torch.full((self.B, 1), self.V + 1,
                                           dtype=torch.long))
            want = np.zeros((self.B, self.T + 1), np.int64)
            for step_t in range(self.T + 1):
                context, _ = ref.attention(timg, h)
                gate = torch.sigmoid(ref.f_beta(h))
                e = emb.squeeze(1) if emb.dim() == 3 else emb
                h, c = ref.lstm(torch.cat((e, gate * context), dim=1),
                                (h, c))
                token = ref.deep_output(h).argmax(1)
                want[:, step_t] = token.numpy()
                if bool((token == self.V + 2).all()):
                    break
                emb = ref.embedding(token.reshape(self.B, 1))

        feats = jnp.asarray(img)
        state = head.apply({"params": params}, feats,
                           method=head.init_state)
        w_s = head.apply({"params": params}, feats,
                         method=head.attention_keys)

        def step(carry, toks, t):
            logits, alpha, carry = head.apply(
                {"params": params}, feats, toks, carry, w_s,
                method=head.step)
            return carry, logits, alpha

        got, _ = decoding.greedy_decode(step, state, self.B, self.V + 1,
                                        self.T + 1)
        got = np.asarray(got)
        end = self.V + 2
        for b in range(self.B):
            w, g = want[b], got[b]
            w_end = np.argmax(w == end) if (w == end).any() else len(w)
            g_end = np.argmax(g == end) if (g == end).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])


class TestReferenceDenseCapOps:
    """Differential: the reference's DenseCap op modules (loaded with
    their directory on sys.path for bare intra-package imports) vs our
    jnp ops, on shared random inputs."""

    @pytest.fixture(scope="class", autouse=True)
    def _path(self):
        d = os.path.join(REF_ROOT, "DenseCap", "densecap")
        sys.path.insert(0, d)
        yield
        sys.path.remove(d)

    def test_apply_and_invert_box_transform(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import boxes as B
        abt = _load_reference_module("DenseCap/densecap/ApplyBoxTransform.py",
                                     "ref_abt").ApplyBoxTransform()
        ibt = _load_reference_module("DenseCap/densecap/InvertBoxTransform.py",
                                     "ref_ibt").InvertBoxTransform()
        rng = np.random.RandomState(3)
        anchors = (rng.rand(12, 4) * 50 + 20).astype(np.float32)
        trans = (rng.randn(12, 4) * 0.3).astype(np.float32)
        with torch.no_grad():
            want = abt([torch.from_numpy(anchors),
                        torch.from_numpy(trans)]).numpy()
        got = np.asarray(B.apply_box_transform(jnp.asarray(anchors),
                                               jnp.asarray(trans)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        with torch.no_grad():
            want_inv = ibt(torch.from_numpy(anchors),
                           torch.from_numpy(want)).numpy()
        got_inv = np.asarray(B.invert_box_transform(jnp.asarray(anchors),
                                                    jnp.asarray(want)))
        np.testing.assert_allclose(got_inv, want_inv, rtol=1e-4, atol=1e-5)

    def test_box_to_affine_theta(self):
        import torch

        from imagecaptioning_tpu.ops.roi_align import roi_weights
        bta = _load_reference_module("DenseCap/densecap/BoxToAffine.py",
                                     "ref_bta").BoxToAffine()
        H, W = 96.0, 128.0
        bta.setSize(int(H), int(W))
        boxes = np.asarray([[40.0, 30.0, 24.0, 18.0],
                            [64.5, 48.25, 31.0, 47.5]], np.float32)
        with torch.no_grad():
            theta = bta(torch.from_numpy(boxes)).numpy()  # (B, 2, 3)
        # our separable weights embed the same theta: recompute the
        # normalized center/scale from theta and compare to the values
        # roi_weights derives from (xc, w) directly
        for i, (xc, yc, w, h) in enumerate(boxes):
            np.testing.assert_allclose(theta[i, 0, 2],
                                       (2 * xc - 1 - W) / (W - 1), rtol=1e-6)
            np.testing.assert_allclose(theta[i, 1, 2],
                                       (2 * yc - 1 - H) / (H - 1), rtol=1e-6)
            np.testing.assert_allclose(theta[i, 0, 0], w / W, rtol=1e-6)
            np.testing.assert_allclose(theta[i, 1, 1], h / H, rtol=1e-6)

    def test_logistic_criterion(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import losses
        lc = _load_reference_module("DenseCap/densecap/LogisticCriterion.py",
                                    "ref_lc").LogisticCriterion()
        rng = np.random.RandomState(4)
        scores = rng.randn(40, 1).astype(np.float32)
        labels = rng.randint(0, 2, size=(40,)).astype(np.float32)
        with torch.no_grad():
            want = float(lc(torch.from_numpy(scores),
                            torch.from_numpy(labels)))
        got = float(losses.logistic_criterion(jnp.asarray(scores),
                                              jnp.asarray(labels)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_box_regression_criterion(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import boxes as B
        from imagecaptioning_tpu.ops import losses
        brc_mod = _load_reference_module(
            "DenseCap/densecap/BoxRegressionCriterion.py", "ref_brc")
        w = 0.7
        brc = brc_mod.BoxRegressionCriterion("cpu", w=w)
        rng = np.random.RandomState(5)
        anchors = (rng.rand(10, 4) * 40 + 30).astype(np.float32)
        targets = (rng.rand(10, 4) * 40 + 30).astype(np.float32)
        # one row with a wild target -> |trans| > 10 masked out
        targets[3] = [1e5, 1e5, 1.0, 1.0]
        preds = (rng.randn(10, 4) * 0.2).astype(np.float32)
        with torch.no_grad():
            want = float(brc(
                [torch.from_numpy(anchors), torch.from_numpy(preds)],
                torch.from_numpy(targets)))
        trans_target = B.invert_box_transform(jnp.asarray(anchors),
                                              jnp.asarray(targets))
        got = float(losses.box_regression_loss(
            jnp.asarray(preds), trans_target, weight=w))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_lstm_loss_variants(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import losses
        mod = _load_reference_module("DenseCap/densecap/LSTMLoss.py",
                                     "ref_lstmloss")
        rng = np.random.RandomState(6)
        logits = rng.randn(4, 9, 23).astype(np.float32)
        targets = rng.randint(0, 23, size=(4, 9)).astype(np.int64)
        targets[0, 5:] = 0
        with torch.no_grad():
            want_sum = float(mod.CustomCrossEntropyLoss()(
                torch.from_numpy(logits), torch.from_numpy(targets)))
        got_sum = float(losses.sum_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets.astype(np.int32))))
        np.testing.assert_allclose(got_sum, want_sum, rtol=1e-5)

    def test_custom_loss_label_smoothed(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import losses
        mod = _load_reference_module("AlexCap/CustomLoss.py",
                                     "ref_customloss")
        rng = np.random.RandomState(8)
        logits = rng.randn(3, 8, 23).astype(np.float32)
        targets = rng.randint(0, 23, size=(3, 8)).astype(np.int64)
        targets[1, 4:] = 0
        with torch.no_grad():
            want = float(mod.CustomCrossEntropyLoss()(
                torch.from_numpy(logits), torch.from_numpy(targets)))
        got = float(losses.smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets.astype(np.int32))))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_make_anchors(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import boxes as B
        mod = _load_reference_module("DenseCap/densecap/MakeAnchors.py",
                                     "ref_makeanchors")
        anchors_wh = np.asarray([[45.0, 90.0], [90.0, 45.0],
                                 [64.0, 64.0]], np.float32)
        x0, y0, sx, sy = 8.5, 8.5, 16.0, 16.0
        hf, wf = 4, 5
        ref = mod.MakeAnchors(x0, y0, sx, sy,
                              torch.from_numpy(anchors_wh.T))
        with torch.no_grad():
            want = ref(torch.zeros(1, 4 * 3, hf, wf)).numpy()
        got = np.asarray(B.make_anchors(jnp.asarray(anchors_wh),
                                        x0, y0, sx, sy, hf, wf))
        # ref layout (1, 4k, H, W) -> (k, H, W, 4); ours (k, H, W, 4)?
        want_r = want.reshape(3, 4, hf, wf).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want_r, rtol=1e-5, atol=1e-5)


class TestReferenceLossVariants:
    def test_densecap_temporal_sum_ce(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import losses
        d = os.path.join(REF_ROOT, "DenseCap", "densecap")
        sys.path.insert(0, d)
        try:
            mod = _load_reference_module("DenseCap/densecap/LSTMLoss.py",
                                         "ref_lstmloss_t")
        finally:
            sys.path.remove(d)
        rng = np.random.RandomState(9)
        logits = rng.randn(3, 6, 15).astype(np.float32)
        targets = rng.randint(0, 15, size=(3, 6)).astype(np.int64)
        targets[1, 2:] = 0
        with torch.no_grad():
            want = float(mod.TemporalCrossEntropyLoss()(
                torch.from_numpy(logits), torch.from_numpy(targets)))
        got = float(losses.temporal_sum_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets.astype(np.int32))))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_gt_mean_reduction_ce(self):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import losses
        mod = _load_reference_module("AlexGTModel/LSTMLoss.py",
                                     "ref_gt_lstmloss")
        rng = np.random.RandomState(10)
        logits = rng.randn(3, 6, 15).astype(np.float32)
        targets = rng.randint(0, 15, size=(3, 6)).astype(np.int64)
        targets[0, 4:] = 0
        with torch.no_grad():
            want = float(mod.CustomCrossEntropyLoss()(
                torch.from_numpy(logits), torch.from_numpy(targets)))
        got = float(losses.temporal_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets.astype(np.int32))))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestReferenceBoxSampler:
    """Differential: the deterministic mask stage of the reference's
    BoxSampler (pos/neg candidate masks + per-GT argmax forcing +
    bounds handling + negative flooding) vs ops.box_sampler.
    torchvision.ops.box_iou is stubbed with an independent torch
    corner-IoU implementation."""

    def _run_reference(self, proposals, gt, bounds):
        import torch

        _ensure_torchvision_ops()
        for d in (REF_ROOT, os.path.join(REF_ROOT, "DenseCap", "densecap")):
            if d not in sys.path:
                sys.path.insert(0, d)
        try:
            mod = _load_reference_module("DenseCap/densecap/BoxSampler.py",
                                         "ref_boxsampler")
            # box_utils materializes tensors on the config device
            # ('cuda:0' in the committed config); run on CPU
            sys.modules["box_utils"].opt["device"] = "cpu"
            sampler = mod.BoxSampler({"low_thresh": 0.3,
                                      "high_thresh": 0.7,
                                      "batch_size": 8, "device": "cpu"})
            sampler.setBounds(types.SimpleNamespace(**bounds))
            torch.manual_seed(0)
            sampler([torch.from_numpy(proposals)[None],
                     torch.from_numpy(gt)[None]])
            return (np.asarray(sampler.pos_mask, bool),
                    np.asarray(sampler.neg_mask, bool))
        finally:
            for d in (REF_ROOT,
                      os.path.join(REF_ROOT, "DenseCap", "densecap")):
                if d in sys.path:
                    sys.path.remove(d)

    @pytest.mark.parametrize("with_bounds", [False, True])
    def test_candidate_masks_match(self, with_bounds):
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import boxes as B
        from imagecaptioning_tpu.ops.box_sampler import candidate_masks

        rng = np.random.RandomState(21)
        n, m = 40, 3
        proposals = np.stack([
            rng.uniform(10, 90, n), rng.uniform(10, 90, n),
            rng.uniform(8, 40, n), rng.uniform(8, 40, n)], 1
        ).astype(np.float32)
        gt = np.asarray([[30.0, 30, 20, 20], [70.0, 60, 16, 24],
                         [50.0, 80, 12, 12]], np.float32)
        if with_bounds:
            bounds = {"x_min": 1, "y_min": 1, "x_max": 85, "y_max": 85}
        else:
            bounds = {"x_min": None, "y_min": None,
                      "x_max": None, "y_max": None}
        want_pos, want_neg = self._run_reference(proposals, gt, bounds)

        if with_bounds:
            corners = B.xcycwh_to_x1y1x2y2(jnp.asarray(proposals))
            in_bounds = jnp.logical_and(
                jnp.logical_and(corners[:, 0] >= bounds["x_min"],
                                corners[:, 1] >= bounds["y_min"]),
                jnp.logical_and(corners[:, 2] <= bounds["x_max"],
                                corners[:, 3] <= bounds["y_max"]))
        else:
            in_bounds = None
        got_pos, got_neg, _ = candidate_masks(
            jnp.asarray(proposals), jnp.asarray(gt),
            jnp.ones(m, bool), in_bounds=in_bounds)
        np.testing.assert_array_equal(np.asarray(got_pos), want_pos)
        np.testing.assert_array_equal(np.asarray(got_neg), want_neg)

    def test_negative_flooding_matches(self):
        # every proposal overlaps some GT above the low threshold -> the
        # reference floods negatives with all non-positives
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops.box_sampler import candidate_masks

        proposals = np.asarray([[30.0, 30, 20, 20], [31.0, 30, 20, 20],
                                [33.0, 31, 22, 20], [29.0, 28, 18, 18]],
                               np.float32)
        gt = np.asarray([[30.0, 30, 20, 20]], np.float32)
        bounds = {"x_min": None, "y_min": None, "x_max": None,
                  "y_max": None}
        want_pos, want_neg = self._run_reference(proposals, gt, bounds)
        got_pos, got_neg, _ = candidate_masks(
            jnp.asarray(proposals), jnp.asarray(gt), jnp.ones(1, bool))
        np.testing.assert_array_equal(np.asarray(got_pos), want_pos)
        np.testing.assert_array_equal(np.asarray(got_neg), want_neg)


class TestReferenceDenseCapEvaluator:
    """Differential: the reference's DenseCap mAP evaluator
    (DenseCap/eval/eval_utils.py, CPU) vs ours on identical
    detections/GT — greedy matching, merge protocol, AP grid, METEOR."""

    def _records(self):
        rng = np.random.RandomState(30)
        images = []
        captions = ["a red car", "a tall tree", "the blue door",
                    "a small dog", "green grass", "an open window"]
        for i in range(3):
            ngt = 2 + i % 2
            gt_boxes = np.stack([
                rng.uniform(40, 160, ngt), rng.uniform(40, 160, ngt),
                rng.uniform(20, 60, ngt), rng.uniform(20, 60, ngt)],
                1).astype(np.float32)
            gt_text = [captions[(i + j) % len(captions)]
                       for j in range(ngt)]
            nd = 4
            det_boxes = gt_boxes[rng.randint(0, ngt, nd)] + \
                rng.randn(nd, 4).astype(np.float32) * np.asarray(
                    [6, 6, 4, 4], np.float32)
            det_boxes[:, 2:] = np.abs(det_boxes[:, 2:]) + 8
            det_text = [captions[rng.randint(0, len(captions))]
                        for _ in range(nd)]
            logprobs = rng.randn(nd).astype(np.float64)
            images.append((logprobs, det_boxes, det_text,
                           gt_boxes, gt_text))
        return images

    def test_full_protocol_matches(self):
        import torch

        from imagecaptioning_tpu.eval.dense_eval import \
            DenseCaptioningEvaluator

        _ensure_torchvision_ops()
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        try:
            mod = _load_reference_module("DenseCap/eval/eval_utils.py",
                                         "ref_eval_utils")
            sys.modules["DenseCap.densecap.box_utils"].opt["device"] = "cpu"
        except KeyError:
            pass
        finally:
            sys.path.remove(REF_ROOT)

        # the punkt_tab model for nltk.word_tokenize is not installed;
        # captions in this pipeline are pre-tokenized space-joined
        # strings, on which whitespace split is equivalent
        mod.word_tokenize = lambda s: s.split()
        # nor is the wordnet corpus: the reference would crash in its
        # synonym stage; give it the same wordnet-free degradation our
        # scorer falls back to, so both sides compute identical METEOR
        from imagecaptioning_tpu.eval.scorer import meteor_pair
        mod.meteor = lambda refs, cand: meteor_pair(refs, cand)
        ref_eval = mod.DenseCaptioningEvaluator({"id": ""})
        our_eval = DenseCaptioningEvaluator()
        for (lp, db, dt, gb, gt_text) in self._records():
            ref_eval.addResult(torch.from_numpy(lp),
                               torch.from_numpy(db), dt,
                               torch.from_numpy(gb), gt_text)
            our_eval.addResult(lp, db, dt, gb, gt_text)

        want = ref_eval.evaluate()
        got = our_eval.evaluate()
        np.testing.assert_allclose(float(got["map"]), float(want["map"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(got["detmap"]),
                                   float(want["detmap"]), rtol=1e-6)
        # key formats may differ; compare the numeric AP grids
        want_grid = sorted(float(v) for v in want["ap_breakdown"].values())
        got_grid = sorted(float(v) for v in got["ap_breakdown"].values())
        np.testing.assert_allclose(got_grid, want_grid, rtol=1e-6)
        want_det = sorted(float(v) for v in want["det_breakdown"].values())
        got_det = sorted(float(v) for v in got["det_breakdown"].values())
        np.testing.assert_allclose(got_det, want_det, rtol=1e-6)
        # the reference's evaluate() does not return METEOR (it feeds
        # the per-record scores into the AP grid only); ours surfaces
        # the mean as 'meteor' — verified equal via the matching grids


class TestReferenceGTLanguageModule:
    """Differential: the GT dense LSTM captioner (AlexGTModel/
    AlexDenseLangage.py, live non-curriculum path) vs our LanguageHead.
    The reference concatenates [image; START; gt] into one LSTM pass and
    drops the first output; ours warms the state on the image vector
    then feeds [START; gt] — mathematically identical, pinned here."""

    V, W, D, H, T, B = 22, 16, 40, 24, 6, 3

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.heads import LanguageHead
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(4)
        mod = _load_reference_module("AlexGTModel/AlexDenseLangage.py",
                                     "ref_gt_language")
        ref = mod.LanguageModel(
            vocab_size=self.V, input_encoding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, num_layers=1, idx_to_token={},
            dropout=0.0, device="cpu", curriculum_learning=False)
        ref.eval()
        sd = ref.state_dict()
        head = LanguageHead(vocab_size=self.V, embedding_size=self.W,
                            rnn_size=self.H, num_layers=1, dropout=0.0,
                            output_dropout=False)
        params = {
            "image_encoder": tp.convert_linear(sd, "image_encoder.encode"),
            "lookup_table": tp.convert_embedding(sd, "lookup_table"),
            "lstm": tp.convert_lstm(sd, "lstm", num_layers=1),
            "linear": tp.convert_linear(sd, "rnn.linear"),
        }
        return ref, head, jax.tree.map(jnp.asarray, params)

    def test_teacher_forced_logits_match(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens

        ref, head, params = pair
        rng = np.random.RandomState(17)
        codes = rng.randn(self.B, self.D).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[1, 3:] = 0
        with torch.no_grad():
            want = ref(torch.from_numpy(codes),
                       torch.from_numpy(gt)).numpy()
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V + 1)
        got = head.apply({"params": params},
                         jnp.asarray(codes)[:, None, :], dec_in,
                         deterministic=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)

    def test_greedy_decode_matches(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding

        ref, head, params = pair
        rng = np.random.RandomState(18)
        codes = rng.randn(self.B, self.D).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(codes), torch.empty(0)).numpy()

        state = head.apply({"params": params},
                           jnp.asarray(codes)[:, None, :],
                           method=head.init_state)

        def step(carry, toks, t):
            logits, carry = head.apply({"params": params}, toks, carry,
                                       method=head.step)
            return carry, logits, jnp.zeros((toks.shape[0], 1),
                                            jnp.float32)

        got, _ = decoding.greedy_decode(step, state, self.B, self.V + 1,
                                        self.T + 1)
        got = np.asarray(got)
        end = self.V + 2
        for b in range(self.B):
            w, g = want[b], got[b]
            w_end = np.argmax(w == end) if (w == end).any() else len(w)
            g_end = np.argmax(g == end) if (g == end).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])


class _GTTransformerFixture:
    """Shared ported-weights fixture for the GT transformer tests."""

    V3, FC, E, L, HEADS, T, B = 23, 40, 32, 2, 4, 6, 3  # V3 = V + 3

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(6)
        mod = _load_reference_module("AlexGTModel/AlexTransformer.py",
                                     "ref_gt_transformer")
        ref = mod.Transformer(
            src_vocab_size=self.V3, fc_dim=self.FC, token_dict={},
            max_length=self.T + 1, embed_size=self.E,
            num_layers=self.L, heads=self.HEADS, forward_expansion=4,
            dropout=0.0, device="cpu")
        ref.eval()
        sd = ref.state_dict()

        def norm(prefix):
            return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.bias"])}

        def block(prefix):
            return {
                "attention": {k: tp.convert_linear(
                    sd, f"{prefix}.attention.{k}")
                    for k in ("values", "keys", "queries", "fc_out")},
                "norm1": norm(f"{prefix}.norm1"),
                "norm2": norm(f"{prefix}.norm2"),
                "ff1": tp.convert_linear(sd, f"{prefix}.feed_forward.0"),
                "ff2": tp.convert_linear(sd, f"{prefix}.feed_forward.2"),
            }

        # enc input length is 1 (a single projected ROI code): only row
        # 0 of the reference's position table is ever used
        enc_params = {"position_embedding":
                      np.asarray(sd["encoder.position_embedding.weight"])[:1]}
        for i in range(self.L):
            enc_params[f"layer_{i}"] = block(f"encoder.layers.{i}")
        dec_params = {
            "word_embedding": tp.convert_embedding(
                sd, "decoder.word_embedding"),
            "position_embedding":
                np.asarray(sd["decoder.position_embedding.weight"]),
            "fc_out": tp.convert_linear(sd, "decoder.fc_out"),
        }
        for i in range(self.L):
            dec_params[f"layer_{i}"] = {
                "norm": norm(f"decoder.layers.{i}.norm"),
                "attention": {k: tp.convert_linear(
                    sd, f"decoder.layers.{i}.attention.{k}")
                    for k in ("values", "keys", "queries", "fc_out")},
                "transformer_block": block(
                    f"decoder.layers.{i}.transformer_block"),
            }
        fc = tp.convert_linear(sd, "fc.0")
        to_j = lambda tree: jax.tree.map(jnp.asarray, tree)
        return ref, to_j(fc), to_j(enc_params), to_j(dec_params)

class TestReferenceGTTransformer(_GTTransformerFixture):
    """Differential: the GT dense transformer (AlexGTModel/
    AlexTransformer.py — no sqrt(E) embedding scaling, causal-only
    target mask, sos/eos = V+3−2/V+3−1) with ported weights vs our
    GTDenseCaptioner transformer components."""

    def test_teacher_forced_logits_match_on_live_positions(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens
        from imagecaptioning_tpu.ops.transformer import (Decoder, Encoder,
                                                         make_trg_mask)

        ref, fc, enc_params, dec_params = pair
        rng = np.random.RandomState(23)
        codes = rng.randn(self.B, self.FC).astype(np.float32)
        V = self.V3 - 3
        gt = rng.randint(1, V + 1, size=(self.B, self.T)).astype(np.int64)
        gt[1, 3:] = 0
        with torch.no_grad():
            want = ref(torch.from_numpy(codes),
                       torch.from_numpy(gt)).numpy()

        enc_mod = Encoder(embed_size=self.E, num_layers=self.L,
                          heads=self.HEADS, forward_expansion=4,
                          dropout=0.0, patch_length=1)
        dec_mod = Decoder(vocab_out=self.V3, embed_size=self.E,
                          num_layers=self.L, heads=self.HEADS,
                          forward_expansion=4, dropout=0.0,
                          max_length=self.T + 1, scale_embedding=False)
        word_vec = jnp.maximum(
            jnp.asarray(codes)[:, None, :] @ fc["kernel"] + fc["bias"], 0.0)
        enc = enc_mod.apply({"params": enc_params}, word_vec, None,
                            deterministic=True)
        # sos = V3-2 == V+1 numerically (the documented equivalence)
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V3 - 2)
        logits, _ = dec_mod.apply({"params": dec_params}, dec_in, enc,
                                  None, make_trg_mask(dec_in),
                                  deterministic=True)
        got = np.asarray(logits)
        # our mask additionally hides NULL keys; on live positions
        # (query t with no NULL at or before t) the two are identical —
        # compare there (captions are front-packed)
        for b in range(self.B):
            live = np.where(np.asarray(dec_in[b]) > 0)[0]
            first_null = (np.argmax(np.asarray(dec_in[b]) == 0)
                          if (np.asarray(dec_in[b]) == 0).any()
                          else len(np.asarray(dec_in[b])))
            live = [t for t in live if t < max(first_null, 1)]
            np.testing.assert_allclose(got[b, live], want[b, live],
                                       rtol=2e-4, atol=2e-4)


class TestReferenceVitbDecoder:
    """Differential: the ViT-B captioner's own decoder copy
    (AlexCap/VitbModel.py:114-149 — sqrt(E) scaling AND returns the last
    block's cross-attention alphas) vs ops/transformer.Decoder."""

    V3, E, L, HEADS, T, B, P = 21, 32, 2, 4, 6, 3, 5

    def test_logits_and_alphas_match(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.ops import tokens
        from imagecaptioning_tpu.ops.transformer import (Decoder,
                                                         make_trg_mask)
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(7)
        if REF_ROOT not in sys.path:        # VitbModel imports AlexCap.*
            sys.path.insert(0, REF_ROOT)
        try:
            mod = _load_reference_module("AlexCap/VitbModel.py",
                                         "ref_vitb")
        finally:
            sys.path.remove(REF_ROOT)
        ref = mod.Decoder(trg_vocab_size=self.V3, embed_size=self.E,
                          num_layers=self.L, heads=self.HEADS,
                          forward_expansion=4, dropout=0.0,
                          device="cpu", max_length=self.T + 1)
        ref.eval()
        sd = ref.state_dict()

        def norm(prefix):
            return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.bias"])}

        def block(prefix):
            return {
                "attention": {k: tp.convert_linear(
                    sd, f"{prefix}.attention.{k}")
                    for k in ("values", "keys", "queries", "fc_out")},
                "norm1": norm(f"{prefix}.norm1"),
                "norm2": norm(f"{prefix}.norm2"),
                "ff1": tp.convert_linear(sd, f"{prefix}.feed_forward.0"),
                "ff2": tp.convert_linear(sd, f"{prefix}.feed_forward.2"),
            }

        dec_params = {
            "word_embedding": tp.convert_embedding(sd, "word_embedding"),
            "position_embedding":
                np.asarray(sd["position_embedding.weight"]),
            "fc_out": tp.convert_linear(sd, "fc_out"),
        }
        for i in range(self.L):
            dec_params[f"layer_{i}"] = {
                "norm": norm(f"layers.{i}.norm"),
                "attention": {k: tp.convert_linear(
                    sd, f"layers.{i}.attention.{k}")
                    for k in ("values", "keys", "queries", "fc_out")},
                "transformer_block": block(f"layers.{i}.transformer_block"),
            }
        dec_params = jax.tree.map(jnp.asarray, dec_params)

        rng = np.random.RandomState(29)
        enc = rng.randn(self.B, self.P, self.E).astype(np.float32)
        V = self.V3 - 3
        gt = rng.randint(1, V + 1, size=(self.B, self.T)).astype(np.int64)
        gt[0, 4:] = 0
        dec_in_np = np.concatenate(
            [np.full((self.B, 1), V + 1, np.int64), gt], axis=1)

        # reference target mask: AlexCap's key-masked causal product
        keep = (dec_in_np > 0).astype(np.float32)
        trg_mask_np = (np.tril(np.ones((self.T + 1, self.T + 1)))[None] *
                       (keep[:, :, None] * keep[:, None, :]))[:, None]
        with torch.no_grad():
            want_logits, want_alphas = ref(
                torch.from_numpy(dec_in_np), torch.from_numpy(enc),
                None, torch.from_numpy(trg_mask_np.astype(np.float32)))

        dec_mod = Decoder(vocab_out=self.V3, embed_size=self.E,
                          num_layers=self.L, heads=self.HEADS,
                          forward_expansion=4, dropout=0.0,
                          max_length=self.T + 1)
        dec_in = jnp.asarray(dec_in_np.astype(np.int32))
        got_logits, got_alphas = dec_mod.apply(
            {"params": dec_params}, dec_in, jnp.asarray(enc), None,
            make_trg_mask(dec_in), deterministic=True)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   want_logits.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_alphas),
                                   want_alphas.numpy(),
                                   rtol=2e-4, atol=1e-5)


class TestReferenceGTBeam:
    """Differential: the GT LSTM batched beam (AlexDenseLangage.py:
    171-210 — log-softmax scores, frozen finished beams via
    next_prob[end,:END]=-100/[END]=0) is the same formulation as our
    `beam_search(use_logprobs=True)`; with ported weights the TOP beam
    must match token-for-token."""

    V, W, D, H, T, B, K = 22, 16, 40, 24, 6, 3, 3

    def test_top_beam_matches(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding
        from imagecaptioning_tpu.models.heads import LanguageHead
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(5)
        mod = _load_reference_module("AlexGTModel/AlexDenseLangage.py",
                                     "ref_gt_language_beam")
        ref = mod.LanguageModel(
            vocab_size=self.V, input_encoding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, num_layers=1, idx_to_token={},
            dropout=0.0, device="cpu", curriculum_learning=False)
        ref.eval()
        sd = ref.state_dict()
        head = LanguageHead(vocab_size=self.V, embedding_size=self.W,
                            rnn_size=self.H, num_layers=1, dropout=0.0,
                            output_dropout=False)
        params = jax.tree.map(jnp.asarray, {
            "image_encoder": tp.convert_linear(sd, "image_encoder.encode"),
            "lookup_table": tp.convert_embedding(sd, "lookup_table"),
            "lstm": tp.convert_lstm(sd, "lstm", num_layers=1),
            "linear": tp.convert_linear(sd, "rnn.linear"),
        })

        rng = np.random.RandomState(19)
        codes = rng.randn(self.B, self.D).astype(np.float32)
        with torch.no_grad():
            want = ref.beam_search(torch.from_numpy(codes),
                                   self.K).numpy()   # (B, K, T)

        from imagecaptioning_tpu.models.api import (
            _lstm_carry_from_batch_major, _lstm_carry_to_batch_major)

        feats = jnp.asarray(codes)[:, None, :]
        feats_k = decoding.expand_for_beams(feats, self.K)
        state = _lstm_carry_to_batch_major(
            head.apply({"params": params}, feats_k,
                       method=head.init_state))

        def step(carry, toks, t):
            st = _lstm_carry_from_batch_major(carry)
            logits, st = head.apply({"params": params}, toks, st,
                                    method=head.step)
            return (_lstm_carry_to_batch_major(st), logits,
                    jnp.zeros((toks.shape[0], 1), jnp.float32))

        # the reference decodes seq_length steps (loop range(1, T) after
        # the step-0 top-k)
        res = decoding.beam_search(step, state, self.B, self.K,
                                   start_token=self.V + 1,
                                   end_token=self.V + 2,
                                   max_steps=self.T, use_logprobs=True)
        got = np.asarray(res.tokens)                 # (B, K, T) best-first
        end = self.V + 2
        for b in range(self.B):
            w, g = want[b, 0].astype(np.int64), got[b, 0]
            w_end = np.argmax(w == end) if (w == end).any() else len(w)
            g_end = np.argmax(g == end) if (g == end).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])


class TestReferenceGTLanguageTwoLayer:
    """Differential: the 2-layer GT LSTM config (the reference's
    committed `2layers_lstm_gt_finetuned_drop0.5` experiment) — covers
    multi-layer torch LSTM weight porting + stacked-state threading."""

    V, W, D, H, T, B = 22, 16, 40, 24, 6, 3

    def test_two_layer_teacher_forced_matches(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.heads import LanguageHead
        from imagecaptioning_tpu.ops import tokens
        from imagecaptioning_tpu.utils import torch_port as tp

        torch.manual_seed(11)
        mod = _load_reference_module("AlexGTModel/AlexDenseLangage.py",
                                     "ref_gt_language_2l")
        ref = mod.LanguageModel(
            vocab_size=self.V, input_encoding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, num_layers=2, idx_to_token={},
            dropout=0.0, device="cpu", curriculum_learning=False)
        ref.eval()
        sd = ref.state_dict()
        head = LanguageHead(vocab_size=self.V, embedding_size=self.W,
                            rnn_size=self.H, num_layers=2, dropout=0.0,
                            output_dropout=False)
        params = jax.tree.map(jnp.asarray, {
            "image_encoder": tp.convert_linear(sd, "image_encoder.encode"),
            "lookup_table": tp.convert_embedding(sd, "lookup_table"),
            "lstm": tp.convert_lstm(sd, "lstm", num_layers=2),
            "linear": tp.convert_linear(sd, "rnn.linear"),
        })

        rng = np.random.RandomState(31)
        codes = rng.randn(self.B, self.D).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[0, 2:] = 0
        with torch.no_grad():
            want = ref(torch.from_numpy(codes),
                       torch.from_numpy(gt)).numpy()
        dec_in = tokens.decoder_input(jnp.asarray(gt.astype(np.int32)),
                                      self.V + 1)
        got = head.apply({"params": params},
                         jnp.asarray(codes)[:, None, :], dec_in,
                         deterministic=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)


class TestReferenceGTTransformerBeam(_GTTransformerFixture):
    """Differential: the GT transformer's per-sample log-prob beam
    (AlexTransformer.py:309-345, frozen-END semantics) vs our fused
    cached beam with the same ported weights."""

    def test_top_beam_matches(self, pair):
        import torch

        import jax.numpy as jnp
        from imagecaptioning_tpu.models import decoding
        from imagecaptioning_tpu.ops.transformer import Decoder, Encoder

        ref, fc, enc_params, dec_params = pair
        rng = np.random.RandomState(41)
        codes = rng.randn(self.B, self.FC).astype(np.float32)
        K = 3
        max_steps = self.T + 1            # ref.max_length
        with torch.no_grad():
            wants = [ref.beam_search(torch.from_numpy(codes[i:i + 1]),
                                     K).numpy() for i in range(self.B)]

        enc_mod = Encoder(embed_size=self.E, num_layers=self.L,
                          heads=self.HEADS, forward_expansion=4,
                          dropout=0.0, patch_length=1)
        dec_mod = Decoder(vocab_out=self.V3, embed_size=self.E,
                          num_layers=self.L, heads=self.HEADS,
                          forward_expansion=4, dropout=0.0,
                          max_length=max_steps, scale_embedding=False)
        word_vec = jnp.maximum(
            jnp.asarray(codes)[:, None, :] @ fc["kernel"] + fc["bias"],
            0.0)
        enc = enc_mod.apply({"params": enc_params}, word_vec, None,
                            deterministic=True)
        enc_k = decoding.expand_for_beams(enc, K)
        toks0 = jnp.zeros((self.B * K, max_steps), jnp.int32)
        _, variables = dec_mod.apply(
            {"params": dec_params}, toks0, enc_k, None, None,
            decode=True, decode_position=jnp.array(0, jnp.int32),
            mutable=["cache"])
        cache = variables["cache"]

        def step(carry, toks, t):
            (logits, _), mut = dec_mod.apply(
                {"params": dec_params, "cache": carry}, toks, enc_k,
                None, None, decode=True, decode_position=t,
                mutable=["cache"])
            return mut["cache"], logits[:, 0], jnp.zeros(
                (toks.shape[0], 1), jnp.float32)

        sos, eos = self.V3 - 2, self.V3 - 1
        res = decoding.beam_search(step, cache, self.B, K,
                                   start_token=sos, end_token=eos,
                                   max_steps=max_steps,
                                   use_logprobs=True)
        got = np.asarray(res.tokens)
        for b in range(self.B):
            w = wants[b][0].astype(np.int64)    # ref row 0 = best beam
            g = got[b, 0]
            w_end = np.argmax(w == eos) if (w == eos).any() else len(w)
            g_end = np.argmax(g == eos) if (g == eos).any() else len(g)
            assert w_end == g_end, (b, w, g)
            np.testing.assert_array_equal(g[:g_end], w[:w_end])
