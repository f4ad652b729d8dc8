"""Dense captioning models — GT-box path and full RPN path, TPU-native.

Reference behavior reproduced (SURVEY §2.3/2.4):

- `GTDenseCaptioner` ← AlexGTModel (`AlexDenseModel.py`,
  `AlexLocLayer.py`, `AlexDenseLangage.py`, `AlexTransformer.py`):
  VGG16 trunk → bilinear ROI pooling of **ground-truth** boxes →
  VGG classifier head (4096-d region codes) → LSTM or transformer
  caption head per region; optional scheduled-sampling curriculum
  (`teacher_prob`, traingt.py:72-73, AlexDenseLangage.py:149-169).
- `DenseCapRPN` ← DenseCap (`DenseCapModel.py`, `LocalizationLayer.py`):
  VGG trunk split conv1/conv2 at the finetune boundary, RPN head
  (3×3 conv → k anchor scores + 4k zero-init box deltas,
  LocalizationLayer.py:48-52), pos/neg box sampling 128/128, ROI
  pooling, recognition base, objectness + box-regression + captioning
  losses (5-term weighted sum, DenseCapModel.py:222-269). Note the
  reference *declares* `nn.CTCLoss` but actually applies masked CE
  (DenseCapModel.py:141 vs :253) — we implement the CE that actually
  runs. Test path: clip → NMS(0.7) → top-proposal budget → ROI pool →
  captions (LocalizationLayer.py:195-255).

TPU-native re-design: images are batched with *padded region slabs*
(R_max regions + mask) instead of the reference's hard N=1 assert
(DenseCapModel.py:226); ROI pooling is the matmul-form `ops.roi_align`;
the RPN sampler is the fixed-shape masked sampler; the whole
forward+losses is one jit-able function.

Token convention: DenseCap transformers use sos=V-2/eos=V-1
(`Transformer.py:240-241`); LSTM heads use the AlexCap V+1/V+2
convention with an image-first input (`LanguageModel.py:83-101`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagecaptioning_tpu.models.backbones.vgg import (VGGClassifierHead,
                                                      VGGFeatures)
from imagecaptioning_tpu.models.heads import LanguageHead
from imagecaptioning_tpu.ops import boxes as boxlib
from imagecaptioning_tpu.ops import losses, tokens
from imagecaptioning_tpu.ops.box_sampler import sample_boxes
from imagecaptioning_tpu.ops.nms import nms
from imagecaptioning_tpu.ops.roi_align import (roi_align,
                                               roi_align_batch_pallas)
from imagecaptioning_tpu.ops.transformer import Decoder, Encoder, make_trg_mask


class GTDenseOutput(NamedTuple):
    logits: jnp.ndarray      # (N, R, T+1, V+3)
    region_codes: jnp.ndarray  # (N, R, 4096)


class GTDenseCaptioner(nn.Module):
    """Ground-truth-box dense captioner (the working AlexGTModel path)."""

    vocab_size: int
    seq_length: int
    use_lstm: bool = True
    embedding_size: int = 512
    rnn_size: int = 512
    num_lstm_layers: int = 1
    embed_size: int = 256         # transformer head width
    num_layers: int = 3           # transformer head depth (AlexTransformer:206)
    heads: int = 4
    dropout: float = 0.0
    roi_size: Tuple[int, int] = (7, 7)
    vgg_stages: int = 5           # trunk depth (5 = full VGG16; tests shrink)
    use_pallas_roi: bool = False  # explicit Pallas ROI kernel (TPU path)
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.features = VGGFeatures(include_final_pool=True,
                                    end_stage=self.vgg_stages,
                                    dtype=self.compute_dtype)
        self.classifier = VGGClassifierHead(dtype=self.compute_dtype)
        if self.use_lstm:
            self.llm = LanguageHead(
                vocab_size=self.vocab_size,
                embedding_size=self.embedding_size,
                rnn_size=self.rnn_size,
                num_layers=self.num_lstm_layers,
                dropout=self.dropout,
                output_dropout=False)   # AlexDenseLangage.py:53-55
        else:
            self.fc = nn.Dense(self.embed_size)
            self.encoder = Encoder(
                embed_size=self.embed_size, num_layers=self.num_layers,
                heads=self.heads, forward_expansion=4,
                dropout=self.dropout, patch_length=1)
            self.decoder = Decoder(
                vocab_out=self.vocab_size + 3, embed_size=self.embed_size,
                num_layers=self.num_layers, heads=self.heads,
                forward_expansion=4, dropout=self.dropout,
                max_length=self.seq_length + 1,
                scale_embedding=False)   # AlexTransformer.py:188: no sqrt(E)

    @property
    def spec(self) -> tokens.TokenSpec:
        if self.use_lstm:
            return tokens.TokenSpec.alexcap(self.vocab_size)
        return tokens.TokenSpec.densecap(self.vocab_size + 3)

    def encode_regions(self, images, gt_boxes, train: bool = False):
        """images (N, H, W, 3), gt_boxes (N, R, 4) xcycwh in image coords
        → region codes (N, R, 4096)."""
        feats = self.features(images, train=False)       # (N, Hf, Wf, 512)
        n, hf, wf, c = feats.shape
        ih, iw = images.shape[1], images.shape[2]
        if self.use_pallas_roi:
            pooled = roi_align_batch_pallas(
                feats.astype(jnp.float32), gt_boxes,
                (float(ih), float(iw)), self.roi_size)
        else:
            pooled = jax.vmap(
                lambda f, bx: roi_align(f, bx, (float(ih), float(iw)),
                                        self.roi_size))(feats, gt_boxes)
        flat = pooled.reshape(n, gt_boxes.shape[1], -1)  # HWC-flattened
        codes = self.classifier(flat, deterministic=not train)
        return codes.astype(jnp.float32)

    def __call__(self, images, gt_boxes, gt_labels, train: bool = False,
                 teacher_prob: Optional[jnp.ndarray] = None) -> GTDenseOutput:
        """gt_labels (N, R, T). Regions flattened into the batch axis for
        the caption head — one big batched decode instead of the
        reference's per-image python loop."""
        n, r, t = gt_labels.shape
        codes = self.encode_regions(images, gt_boxes, train=train)
        flat_codes = codes.reshape(n * r, 1, -1)
        flat_labels = gt_labels.reshape(n * r, t)

        if self.use_lstm:
            start = self.vocab_size + 1
            dec_in = tokens.decoder_input(flat_labels, start)
            if train and teacher_prob is not None:
                logits = self._scheduled_sampling(flat_codes, dec_in,
                                                  teacher_prob)
            else:
                logits = self.llm(flat_codes, dec_in,
                                  deterministic=not train)
        else:
            spec = self.spec
            word_vec = nn.relu(self.fc(flat_codes))
            enc = self.encoder(word_vec, None, deterministic=not train)
            dec_in = tokens.decoder_input(flat_labels, spec.start)
            trg_mask = make_trg_mask(dec_in, key_masking=True)
            logits, _ = self.decoder(dec_in, enc, None, trg_mask,
                                     deterministic=not train)
        return GTDenseOutput(logits.reshape(n, r, t + 1, -1), codes)

    def _scheduled_sampling(self, flat_codes, dec_in, teacher_prob):
        """Curriculum decoding (AlexDenseLangage.py:149-169): at each step
        feed the teacher token with prob `teacher_prob`, else the model's
        own argmax; bernoulli draws use the 'sampling' rng stream.

        Unrolled over the ≤T+1 steps rather than `lax.scan`: module calls
        inside a raw scan leak tracers during flax init, and at these
        caption lengths (T≤16) unrolling compiles fine — the reference
        itself steps a Python loop (AlexDenseLangage.py:151)."""
        state = self.llm.init_state(flat_codes)
        rng = self.make_rng("sampling")
        b, t1 = dec_in.shape

        logits_list = []
        prev_model_tok = dec_in[:, 0]
        for t in range(t1):
            teacher_tok = dec_in[:, t]
            use_teacher = jax.random.bernoulli(
                jax.random.fold_in(rng, t), teacher_prob, (b,))
            tok = jnp.where(jnp.logical_or(use_teacher, t == 0),
                            teacher_tok, prev_model_tok)
            logits, state = self.llm.step(tok[:, None], state)
            prev_model_tok = jnp.argmax(logits, axis=-1).astype(dec_in.dtype)
            logits_list.append(logits)
        return jnp.stack(logits_list, axis=1)

    # --- decode API (drives models.decoding greedy/beam) ---------------
    def encode_flat(self, images, gt_boxes, train: bool = False):
        """Decode-ready per-region conditioning, (N*R, 1, D): raw 4096-d
        codes for the LSTM head, encoder output for the transformer."""
        codes = self.encode_regions(images, gt_boxes, train=train)
        n, r, d = codes.shape
        flat = codes.reshape(n * r, 1, d)
        if self.use_lstm:
            return flat
        word_vec = nn.relu(self.fc(flat))
        return self.encoder(word_vec, None, deterministic=True)

    def init_decode(self, flat_enc):
        if self.use_lstm:
            return self.llm.init_state(flat_enc)
        return flat_enc

    def decode_step(self, carry, toks, t):
        if self.use_lstm:
            logits, carry = self.llm.step(toks, carry)
            return carry, logits, jnp.zeros((toks.shape[0], 1), jnp.float32)
        logits, _ = self.decoder(toks, carry, None, None,
                                 decode=True, decode_position=t)
        return carry, logits[:, 0], jnp.zeros((toks.shape[0], 1),
                                              jnp.float32)

    def loss(self, out: GTDenseOutput, gt_labels, region_mask) -> jnp.ndarray:
        """Masked caption CE over real regions (AlexGTModel LSTMLoss
        variant: mean reduction over non-null, `AlexGTModel/LSTMLoss.py`)."""
        n, r, t1, v = out.logits.shape
        spec = self.spec
        flat_labels = gt_labels.reshape(n * r, -1)
        target = tokens.decoder_target(flat_labels, spec.end,
                                       scan_from=1 if self.use_lstm else 0)
        target = jnp.where(region_mask.reshape(n * r, 1) > 0, target, 0)
        return losses.temporal_cross_entropy(
            out.logits.reshape(n * r, t1, v), target)


# ----------------------------------------------------------------- RPN

# The reference's anchor ladder — 12 hand-rounded (w, h) literals,
# 3 aspect ratios × 4 scales {64, 128, 256, 512}
# (LocalizationLayer.py:24-30) — as the default; sizes/ratios are
# configurable (the reference hard-codes the ladder for 720px VG
# images; detection quality on other image/box scales needs a ladder
# whose geometric step keeps anchor-GT IoU above the 0.7 positive
# threshold, see DenseConfig.anchor_sizes). The sentinel size/ratio
# tuples below mark "use the reference literals": NO (s·√r, s/√r)
# formula reproduces the reference's table exactly, because its
# entries are rounded inconsistently (45×90 at scale 64 but 181×362 at
# scale 256 — √2·64 = 90.51, √2·128 = 181.02), so when the defaults
# are requested `default_anchors` returns the verbatim table instead
# of generating one.
REFERENCE_ANCHOR_SIZES = (64.0, 128.0, 256.0, 512.0)
REFERENCE_ANCHOR_RATIOS = (0.5, 1.0, 2.0)
# LocalizationLayer.py:24-30, row-for-row (w, h); anchor_scale = 1.
REFERENCE_ANCHORS = (
    (45.0, 90.0), (90.0, 45.0), (64.0, 64.0),
    (90.0, 180.0), (180.0, 90.0), (128.0, 128.0),
    (181.0, 362.0), (362.0, 181.0), (256.0, 256.0),
    (362.0, 724.0), (724.0, 362.0), (512.0, 512.0),
)


def default_anchors(sizes=REFERENCE_ANCHOR_SIZES,
                    ratios=REFERENCE_ANCHOR_RATIOS) -> np.ndarray:
    """(len(sizes)·len(ratios), 2) anchor (w, h) table. The reference
    defaults return its literal hand-rounded table (exact numeric
    parity); any other ladder is generated as (s·√r, s/√r)."""
    if (tuple(sizes) == REFERENCE_ANCHOR_SIZES
            and tuple(ratios) == REFERENCE_ANCHOR_RATIOS):
        return np.asarray(REFERENCE_ANCHORS, dtype=np.float32)
    out = []
    for s in sizes:
        for r in ratios:
            out.append([s * np.sqrt(r), s / np.sqrt(r)])
    return np.asarray(out, dtype=np.float32)


class RPNOutput(NamedTuple):
    proposals: jnp.ndarray     # (N, A, 4) xcycwh
    scores: jnp.ndarray        # (N, A)
    trans: jnp.ndarray         # (N, A, 4)
    anchors: jnp.ndarray       # (A, 4)


class DenseCapRPN(nn.Module):
    """Full RPN dense-captioning model."""

    vocab_size: int
    seq_length: int
    num_pos: int = 128
    num_neg: int = 128
    test_proposals: int = 100
    embedding_size: int = 512
    rnn_size: int = 512
    roi_size: Tuple[int, int] = (7, 7)
    mid_obj_weight: float = 0.1
    mid_reg_weight: float = 0.05
    end_obj_weight: float = 0.1
    end_reg_weight: float = 0.1
    caption_weight: float = 1.0
    box_reg_decay: float = 5e-5
    # tw/th clipped to ±this before exp in the box transform. 10.0 =
    # the reference's own garbage threshold (its regression criterion
    # discards |t| > 10, BoxRegressionCriterion.py:18-25); the clamp
    # extends that contract to the forward so exp can't overflow → NaN
    # at aggressive learning rates. Detectron clamps the same way.
    box_transform_clamp: float = 10.0
    vgg_stages: int = 5           # trunk depth (5 = full VGG16; tests shrink)
    use_pallas_roi: bool = False  # explicit Pallas ROI kernel (TPU path)
    # Anchor ladder (len(sizes)×len(ratios) anchors per position);
    # default = the reference's 720px-VG ladder.
    anchor_sizes: Tuple[float, ...] = REFERENCE_ANCHOR_SIZES
    anchor_ratios: Tuple[float, ...] = REFERENCE_ANCHOR_RATIOS
    # False = the reference's detection-only RoiModel (RoiModel.py:198-239):
    # no caption head, 4-term total.
    with_captioning: bool = True
    # Opt-in stability DIVERGENCE (off = reference parity): actually add
    # the 0.5·box_reg_decay·‖trans‖² term to the total. The reference
    # computes it and then excludes it (RoiModel.py:238), leaving the
    # trans field on never-sampled anchors unregularized — measured on
    # the matched-ladder evidence run: ‖trans‖² grows 0.003 → 280 over
    # 300 iters while proposal recall@0.5 decays 0.53 → 0.33 off its
    # early peak. (The Lua original backprops this decay through its
    # RegularizeLayer; the torch port dropped that.)
    apply_box_decay: bool = False
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.conv_trunk = VGGFeatures(include_final_pool=False,
                                      end_stage=self.vgg_stages,
                                      dtype=self.compute_dtype)
        k = default_anchors(self.anchor_sizes, self.anchor_ratios).shape[0]
        self.rpn_conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=self.compute_dtype)
        self.rpn_scores = nn.Conv(k, (1, 1))
        self.rpn_trans = nn.Conv(4 * k, (1, 1),
                                 kernel_init=nn.initializers.zeros)
        self.recog_base = VGGClassifierHead(dtype=self.compute_dtype)
        self.objectness = nn.Dense(
            1, kernel_init=nn.initializers.normal(0.01))
        self.box_reg = nn.Dense(4, kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros)
        if self.with_captioning:
            self.llm = LanguageHead(
                vocab_size=self.vocab_size,
                embedding_size=self.embedding_size,
                rnn_size=self.rnn_size)

    def rpn_forward(self, feats, image_hw) -> RPNOutput:
        """feats (N, Hf, Wf, 512) → flattened per-anchor proposals."""
        n, hf, wf, _ = feats.shape
        x = nn.relu(self.rpn_conv(feats)).astype(jnp.float32)
        scores = self.rpn_scores(x)                      # (N, Hf, Wf, k)
        trans = self.rpn_trans(x)                        # (N, Hf, Wf, 4k)
        k = scores.shape[-1]
        # trunk without final pool: (stages-1) maxpools → stride 2^(s-1)
        x0, y0, sx, sy = boxlib.field_centers(self.vgg_stages - 1)
        anchors = boxlib.make_anchors(
            jnp.asarray(default_anchors(self.anchor_sizes,
                                        self.anchor_ratios)),
            x0, y0, sx, sy, hf, wf)
        anchors = jnp.transpose(anchors, (1, 2, 0, 3)).reshape(-1, 4)
        scores = scores.reshape(n, -1)
        trans = trans.reshape(n, hf, wf, k, 4).reshape(n, -1, 4)
        proposals = boxlib.apply_box_transform(
            anchors[None], trans, max_log_scale=self.box_transform_clamp)
        return RPNOutput(proposals, scores, trans, anchors)

    def proposals_only(self, images) -> RPNOutput:
        """Diagnostic entry: the raw RPN proposal field for `images`
        (anchors + predicted deltas, pre-NMS/pre-sampling) — feeds
        eval_split_rpn's anchor-assignment diagnostic (what fraction of
        GT boxes any anchor covers at the 0.7/0.5 sampling thresholds,
        and how full the positive-sample budget runs)."""
        feats = self.conv_trunk(images, train=False)
        return self.rpn_forward(
            feats, (float(images.shape[1]), float(images.shape[2])))

    def _region_codes(self, feats_i, boxes, image_hw, train):
        pooled = roi_align(feats_i, boxes, image_hw, self.roi_size)
        flat = pooled.reshape(boxes.shape[0], -1)
        return self.recog_base(flat, deterministic=not train)

    def _region_codes_batch(self, feats, boxes, image_hw, train):
        """(N, Hf, Wf, C) × (N, R, 4) → (N, R, 4096): ROI pooling +
        recognition base over ALL sampled regions at once — one large
        MXU matmul per fc layer instead of N vmapped small ones."""
        if self.use_pallas_roi:
            pooled = roi_align_batch_pallas(feats.astype(jnp.float32),
                                            boxes, image_hw, self.roi_size)
        else:
            pooled = jax.vmap(
                lambda f, bx: roi_align(f, bx, image_hw,
                                        self.roi_size))(feats, boxes)
        n, r = boxes.shape[:2]
        flat = pooled.reshape(n, r, -1)
        return self.recog_base(flat, deterministic=not train)

    def __call__(self, images, gt_boxes, gt_mask, gt_labels,
                 rng: Optional[jax.Array] = None,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """Training forward → loss dict. Batched over images; each image
        samples num_pos/num_neg boxes with static shapes. Sampling and
        the box losses run vmapped per image; ROI pooling and the
        recognition/objectness/box-reg heads run as single batched ops
        over all N·(pos+neg) regions."""
        ih, iw = images.shape[1], images.shape[2]
        image_hw = (float(ih), float(iw))
        feats = self.conv_trunk(images, train=False)
        rpn = self.rpn_forward(feats, image_hw)
        n = images.shape[0]
        if rng is None:
            rng = self.make_rng("sampling")

        def sample_image(rng_i, props, scores, trans, gt_b, gt_m, gt_l):
            _, in_bounds = boxlib.clip_boxes(props, ih, iw)
            s = sample_boxes(rng_i, props, gt_b, gt_m,
                             self.num_pos, self.num_neg,
                             in_bounds=in_bounds)
            pos_boxes = props[s.pos_idx]
            pos_anchors = rpn.anchors[s.pos_idx]
            pos_trans = trans[s.pos_idx]
            pos_scores = scores[s.pos_idx]
            neg_scores = scores[s.neg_idx]
            pos_target_boxes = gt_b[s.pos_target_idx]
            pos_labels = gt_l[s.pos_target_idx]

            # mid losses on RPN outputs
            obj_scores = jnp.concatenate([pos_scores, neg_scores])
            obj_targets = jnp.concatenate(
                [jnp.ones_like(pos_scores), jnp.zeros_like(neg_scores)])
            obj_w = jnp.concatenate([s.pos_mask, s.neg_mask]).astype(
                jnp.float32)
            # masked LogisticCriterion (LogisticCriterion.py:17-30)
            mid_obj = (jax.nn.softplus(
                jnp.where(obj_targets > 0, -obj_scores, obj_scores))
                * obj_w).sum() / jnp.maximum(obj_w.sum(), 1.0)
            target_trans = boxlib.invert_box_transform(pos_anchors,
                                                       pos_target_boxes)
            mid_reg = losses.box_regression_loss(
                pos_trans, target_trans, valid_mask=s.pos_mask)

            all_boxes = jnp.concatenate([pos_boxes,
                                         props[s.neg_idx]], axis=0)
            return (mid_obj, mid_reg, all_boxes, pos_boxes,
                    pos_target_boxes, pos_labels, s.pos_mask,
                    obj_targets, obj_w)

        rngs = jax.random.split(rng, n)
        (mid_obj, mid_reg, all_boxes, pos_boxes, pos_target_boxes,
         pos_labels, pos_mask, obj_targets, obj_w) = jax.vmap(
            sample_image)(rngs, rpn.proposals, rpn.scores, rpn.trans,
                          gt_boxes, gt_mask, gt_labels)

        # region heads, batched over every sampled box in the batch
        codes = self._region_codes_batch(feats, all_boxes, image_hw, train)
        end_scores = self.objectness(codes)[..., 0]        # (N, P+Nn)
        end_obj = (jax.nn.softplus(
            jnp.where(obj_targets > 0, -end_scores, end_scores))
            * obj_w).sum(axis=1) / jnp.maximum(obj_w.sum(axis=1), 1.0)

        pos_codes = codes[:, :self.num_pos]
        final_trans = self.box_reg(pos_codes.astype(jnp.float32))
        target_trans2 = boxlib.invert_box_transform(pos_boxes,
                                                    pos_target_boxes)
        end_reg = jax.vmap(
            lambda p, t, m: losses.box_regression_loss(p, t, valid_mask=m))(
            final_trans, target_trans2, pos_mask)

        loss_dict = {
            "mid_objectness": self.mid_obj_weight * mid_obj.mean(),
            "mid_box_reg": self.mid_reg_weight * mid_reg.mean(),
            "end_objectness": self.end_obj_weight * end_obj.mean(),
            "end_box_reg": self.end_reg_weight * end_reg.mean(),
        }

        if self.with_captioning:
            # captioning on all positives across the batch
            flat_codes = pos_codes.reshape(-1, 1, 4096)
            flat_labels = jnp.where(pos_mask.reshape(-1, 1) > 0,
                                    pos_labels.reshape(
                                        -1, pos_labels.shape[-1]), 0)
            start = self.vocab_size + 1
            dec_in = tokens.decoder_input(flat_labels, start)
            logits = self.llm(flat_codes, dec_in, deterministic=not train)
            target = tokens.decoder_target(flat_labels, self.vocab_size + 2,
                                           scan_from=1)
            target = jnp.where(pos_mask.reshape(-1, 1) > 0, target, 0)
            loss_dict["captioning"] = (self.caption_weight *
                                       losses.sum_cross_entropy(logits,
                                                                target))

        loss_dict["total"] = sum(loss_dict.values())
        # RegularizeLayer side-channel: 0.5·w·‖trans‖² recorded but NOT
        # summed into the total — the reference computes box_decay_loss
        # and then excludes it (RoiModel.py:238, RegularizeLayer.py:10-14).
        # apply_box_decay=True opts into summing it (see field docstring).
        loss_dict["box_decay"] = (0.5 * self.box_reg_decay *
                                  jnp.sum(rpn.trans.astype(jnp.float32)**2))
        if self.apply_box_decay:
            loss_dict["total"] = loss_dict["total"] + loss_dict["box_decay"]
        # Diagnostic (not a loss): how full the positive-sample budget
        # runs. ~M/num_pos (GT count over budget) means positives come
        # only from the argmax-per-GT fallback — the anchor ladder never
        # clears the 0.7 IoU threshold and box-reg/objectness learn from
        # a starved, repeated positive set.
        loss_dict["pos_occupancy"] = pos_mask.astype(jnp.float32).mean()
        return loss_dict

    def forward_test(self, images, nms_thresh: float = 0.7,
                     final_nms_thresh: float = 0.3):
        """Detection inference: RPN → clip → NMS(0.7) → budget → ROI →
        objectness + box refinement. Returns (boxes, scores, codes,
        keep_mask) with a static proposal budget."""
        ih, iw = images.shape[1], images.shape[2]
        image_hw = (float(ih), float(iw))
        feats = self.conv_trunk(images, train=False)
        rpn = self.rpn_forward(feats, image_hw)

        def keep_proposals(props, scores):
            clipped, valid = boxlib.clip_boxes(props, ih, iw)
            idx, keep = nms(clipped, scores, nms_thresh,
                            self.test_proposals, valid=valid)
            return clipped[idx], keep

        boxes_kept, keep = jax.vmap(keep_proposals)(rpn.proposals,
                                                    rpn.scores)
        codes = self._region_codes_batch(feats, boxes_kept, image_hw,
                                         train=False)

        def per_image(boxes_kept, keep, codes):
            obj = self.objectness(codes)[:, 0]
            refined = boxlib.apply_box_transform(
                boxes_kept, self.box_reg(codes.astype(jnp.float32)),
                max_log_scale=self.box_transform_clamp)
            # final NMS on refined boxes
            fidx, fkeep = nms(refined, obj, final_nms_thresh,
                              self.test_proposals,
                              valid=keep)
            return (refined[fidx], obj[fidx], codes[fidx],
                    jnp.logical_and(fkeep, keep[fidx]))

        return jax.vmap(per_image)(boxes_kept, keep, codes)

    def generate_captions(self, codes, greedy_steps: int):
        """Per-region greedy captions from region codes (N*R, 4096)."""
        flat = codes.reshape(-1, 1, codes.shape[-1])
        state = self.llm.init_state(flat)
        start = self.vocab_size + 1
        b = flat.shape[0]

        def body(carry, _):
            state, tok = carry
            logits, state = self.llm.step(tok, state)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            return (state, nxt), nxt[:, 0]

        (_, _), toks = jax.lax.scan(
            body, (state, jnp.full((b, 1), start, jnp.int32)),
            None, length=greedy_steps)
        return jnp.swapaxes(toks, 0, 1)
