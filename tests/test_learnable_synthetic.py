"""The learnable synthetic dataset (captions derived from rendered
image content) and the backbone_stages config knob that make the
committed evidence run (evidence_run.py) possible."""

import numpy as np

from imagecaptioning_tpu.data.synthetic import (
    make_learnable_face2text_arrays)


def test_learnable_dataset_schema_and_determinism():
    a1, info1 = make_learnable_face2text_arrays(num_images=24, seed=3)
    a2, _ = make_learnable_face2text_arrays(num_images=24, seed=3)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k], err_msg=k)
    # Face2Text schema (my_model_preprocess.py:282-330)
    assert a1["images"].shape == (24, 218, 178, 3)
    assert a1["images"].dtype == np.uint8
    assert a1["labels"].shape[0] == 48           # 2 captions/image
    assert set(np.unique(a1["split"])) == {0, 1, 2}
    assert a1["attributes"].shape == (24, 40)
    assert (a1["img_to_last_phr"] - a1["img_to_first_phr"] == 1).all()
    assert len(info1["token_to_idx"]) == len(info1["idx_to_token"])


def test_learnable_captions_describe_the_image():
    """The caption's color words must match the rendered bands — the
    property that makes held-out METEOR measure grounding."""
    from imagecaptioning_tpu.data.synthetic import _HAIR, _SHIRT
    from imagecaptioning_tpu.data.tokenizer import Vocab

    arrays, info = make_learnable_face2text_arrays(num_images=12, seed=0,
                                                   noise=0.0)
    vocab = Vocab(info["token_to_idx"], info["idx_to_token"])
    h = arrays["images"].shape[1]
    for i in range(12):
        cap = vocab.decode_row(
            arrays["labels"][arrays["img_to_first_phr"][i]])
        img = arrays["images"][i]
        # sample the hair band below the optional hat strip (top 10%)
        hair_px = tuple(img[int(0.2 * h), 5])
        shirt_px = tuple(img[-5, 5])            # shirt band
        hair_word = [w for w, c in _HAIR.items() if c == hair_px]
        shirt_word = [w for w, c in _SHIRT.items() if c == shirt_px]
        assert hair_word and hair_word[0] in cap.split(), (cap, hair_px)
        assert shirt_word and shirt_word[0] in cap.split(), (cap, shirt_px)


def test_learnable_vg_schema_and_grounding():
    """VG-schema variant: region captions must describe the rendered
    rectangle (color + top/bottom half) at the box's position."""
    from imagecaptioning_tpu.data.synthetic import (_BOX_COLORS,
                                                    make_learnable_vg_arrays)
    from imagecaptioning_tpu.data.tokenizer import Vocab

    arrays, info = make_learnable_vg_arrays(num_images=6, image_size=128,
                                            seed=1, noise=0.0)
    assert arrays["images"].shape == (6, 128, 128, 3)
    assert arrays["boxes"].shape == (24, 4)           # 4 regions/image
    assert (arrays["img_to_first_box"][1:]
            == arrays["img_to_last_box"][:-1] + 1).all()   # 1-indexed slabs
    vocab = Vocab(info["token_to_idx"], info["idx_to_token"])
    for i in range(6):
        for r in range(4):
            k = arrays["img_to_first_box"][i] - 1 + r
            cap = vocab.decode_row(arrays["labels"][k]).split()
            xc, yc, w, h = arrays["boxes"][k]
            # pixel at the box center carries the caption's color
            px = tuple(arrays["images"][i, int(yc - 1), int(xc - 1)])
            color = [c for c, v in _BOX_COLORS.items() if v == px]
            assert color and color[0] in cap, (cap, px)
            half = ("top", "upper") if yc <= 64 else ("bottom", "lower")
            assert any(wd in cap for wd in half), (cap, yc)


def test_build_model_honors_backbone_stages():
    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.models.captioners import build_model

    cfg = get_lstm_config().replace(backbone_stages=(1, 1, 1, 1))
    model = build_model(cfg, vocab_size=16, seq_length=5)
    assert model.backbone_stages == (1, 1, 1, 1)
    # () keeps the family default (ResNet-101)
    model = build_model(get_lstm_config(), 16, 5)
    assert model.backbone_stages == (3, 4, 23, 3)


def test_build_model_honors_vit_dims_and_patch_override():
    from imagecaptioning_tpu.config import get_config
    from imagecaptioning_tpu.models.captioners import build_model

    cfg = get_config("vitb").replace(
        vit_dims=(224, 32, 2, 4, 32, 64), embedding_size=32,
        num_layers=2, num_heads=4)
    model = build_model(cfg, vocab_size=16, seq_length=5)
    assert (model.image_size, model.vit_patch) == (224, 32)
    assert (model.vit_layers, model.vit_heads) == (2, 4)
    assert (model.vit_hidden, model.vit_mlp) == (32, 64)
    # () keeps the real ViT-B/16 encoder
    model = build_model(get_config("vitb"), 16, 5)
    assert (model.vit_layers, model.vit_hidden) == (12, 768)

    # patch_size_override reaches the encoder's learned position table
    # (its length is patch_size**2); 0 would derive 14 from use_vggface
    import jax
    import jax.numpy as jnp

    from imagecaptioning_tpu.models.captioners import TransformerCaptioner
    m = TransformerCaptioner(vocab_size=16, max_length=5, embed_size=8,
                             num_layers=1, heads=1, use_vggface=True,
                             patch_size_override=2)
    variables = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3), jnp.float32),
                       jnp.ones((1, 5), jnp.int32), train=False))
    pos = variables["params"]["encoder"]["position_embedding"]
    assert pos.shape == (4, 8), pos.shape
