"""Training drivers for the dense-captioning families.

`train_gt` reproduces the `traingt.py` loop (SURVEY §2.2): hard
`max_iter`/`pad`, optional curriculum `teacher_prob =
40000/(40000+exp(iter/40000))` (`traingt.py:72-73`), Adam with additive
weight decay, CNN frozen until one epoch of images then `features[10:]`
unfrozen (`traingt.py:58-64,87-88` — conv1_*/conv2_* stay frozen
forever), eval by the GT mAP protocol with best-checkpoint selection on
val mAP (`traingt.py:95-109`), loss/result history JSONs in the
reference schema.

`train_rpn` is the `DenseCap/train.py` equivalent: the 5-loss dict per
step (mid/end objectness + box-reg, captioning), frozen conv1/conv2
(`train.py:62-64`). The committed reference driver is broken (unpacks
5 values from a 4-tuple, `train.py:49`); this is the repaired loop.

TPU-native: each iteration — uint8→normalized preprocess, VGG trunk,
(RPN sampling,) ROI pooling, caption head, backward, Adam — is one
donated jit program over batched images with padded region slabs.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagecaptioning_tpu.config.dense_configs import (DenseConfig,
                                                      name_gt_model)
from imagecaptioning_tpu.data import synthetic
from imagecaptioning_tpu.data.vg_loader import VGDataLoader, normalize_images
from imagecaptioning_tpu.eval import dense_eval
from imagecaptioning_tpu.models.densecap import DenseCapRPN, GTDenseCaptioner
from imagecaptioning_tpu.train.step import TrainState
from imagecaptioning_tpu.utils import checkpoint as ckptlib
from imagecaptioning_tpu.utils.io import LossHistory, ResultsHistory
from imagecaptioning_tpu.utils.tb import TBWriter


def make_vg_loader(cfg: DenseConfig, synthetic_fallback: bool = True,
                   synthetic_images: int = 8,
                   image_size: int = 64,
                   synthetic_seq_length: int = 8,
                   synthetic_learnable: bool = False) -> VGDataLoader:
    if os.path.exists(cfg.data_h5) and os.path.exists(cfg.data_json):
        return VGDataLoader(data_h5=cfg.data_h5, data_json=cfg.data_json,
                            seed=cfg.seed,
                            debug_max_train_images=cfg.debug_max_train_images)
    if not synthetic_fallback:
        raise FileNotFoundError(cfg.data_h5)
    if synthetic_learnable:
        # region captions describe the rendered content — held-out
        # mAP/METEOR measure grounding (evidence_run.py --model gt)
        arrays, info = synthetic.make_learnable_vg_arrays(
            num_images=synthetic_images, image_size=image_size,
            seq_length=synthetic_seq_length, seed=cfg.seed)
    else:
        arrays, info = synthetic.make_vg_arrays(
            num_images=synthetic_images, image_size=image_size,
            seq_length=synthetic_seq_length, seed=cfg.seed)
    return VGDataLoader(arrays=arrays, info=info, seed=cfg.seed)


def teacher_prob_schedule(it) -> jnp.ndarray:
    """Curriculum schedule 40000/(40000+exp(iter/40000)) (`traingt.py:72`)."""
    k = 40000.0
    return k / (k + jnp.exp(jnp.asarray(it, jnp.float32) / k))


def _vgg_label_fn(params, finetune: bool):
    """'frozen' = conv1_*/conv2_* (the reference never unfreezes
    features[:10]); 'encoder' = rest of the VGG trunk; 'head' = all else."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top in ("features", "conv_trunk"):
            sub = path[1].key if hasattr(path[1], "key") else str(path[1])
            if sub.startswith(("conv1_", "conv2_")):
                return "frozen" if finetune else "encoder"
            return "encoder"
        return "head"
    return jax.tree_util.tree_map_with_path(label, params)


def make_dense_optimizer(cfg: DenseConfig,
                         finetune_start_step: int) -> optax.GradientTransformation:
    """torch `Adam(params, lr, weight_decay=wd)` = additive L2 on the
    gradient *before* the Adam moments, not AdamW (`traingt.py:62`).
    `finetune_start_step` is in APPLIED-update units: under gradient
    accumulation the inner schedules tick once per optax.MultiSteps
    emission, so callers divide their micro-iteration boundary by
    grad_accum_steps."""
    def adam(lr_schedule):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=cfg.optim_beta1, b2=cfg.optim_beta2,
                                eps=cfg.optim_epsilon),
            optax.scale_by_learning_rate(lr_schedule))

    def clipped(inner):
        # stability ADDITION (off by default; the reference's dense
        # drivers never clip). GROUP-wise: clipping inside each
        # multi_transform group keeps the frozen conv1_/conv2_ grads
        # (whose updates are discarded) out of the norm — a pre-chain
        # global clip would silently over-clip the head whenever the
        # discarded trunk grads dominate the norm.
        if getattr(cfg, "grad_clip_norm", 0.0) > 0:
            return optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm), inner)
        return inner

    head_tx = clipped(adam(cfg.learning_rate))
    if cfg.finetune_cnn:
        def enc_schedule(step):
            return jnp.where(step >= finetune_start_step,
                             cfg.learning_rate, 0.0)
        enc_tx = clipped(adam(enc_schedule))
        frozen_tx = optax.set_to_zero()
    else:
        enc_tx = optax.set_to_zero()
        frozen_tx = optax.set_to_zero()
    tx = optax.multi_transform(
        {"encoder": enc_tx, "head": head_tx, "frozen": frozen_tx},
        lambda params: _vgg_label_fn(params, cfg.finetune_cnn))
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # k micro-batches averaged into one update (see optim.py).
        tx = optax.MultiSteps(
            tx, every_k_schedule=cfg.grad_accum_steps
        ).gradient_transformation()
    return tx


def build_gt_model(cfg: DenseConfig, vocab_size: int,
                   seq_length: int) -> GTDenseCaptioner:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return GTDenseCaptioner(
        vocab_size=vocab_size, seq_length=seq_length,
        use_lstm=cfg.use_lstm, embedding_size=cfg.input_encoding_size,
        rnn_size=cfg.rnn_size, num_lstm_layers=cfg.num_layers,
        dropout=cfg.drop_value if cfg.use_dropout else 0.0,
        vgg_stages=cfg.vgg_stages,
        use_pallas_roi=cfg.use_pallas_roi,
        compute_dtype=dtype)


def build_rpn_model(cfg: DenseConfig, vocab_size: int,
                    seq_length: int) -> DenseCapRPN:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return DenseCapRPN(
        vocab_size=vocab_size, seq_length=seq_length,
        num_pos=cfg.sampler_batch_size // 2,
        num_neg=cfg.sampler_batch_size // 2,
        test_proposals=min(cfg.test_num_proposals, 300),
        embedding_size=cfg.input_encoding_size, rnn_size=cfg.rnn_size,
        mid_obj_weight=cfg.mid_objectness_weight,
        mid_reg_weight=cfg.mid_box_reg_weight,
        end_obj_weight=cfg.end_objectness_weight,
        end_reg_weight=cfg.end_box_reg_weight,
        caption_weight=cfg.captioning_weight,
        box_reg_decay=cfg.box_reg_decay,
        with_captioning=not cfg.roi_only,
        vgg_stages=cfg.vgg_stages,
        use_pallas_roi=cfg.use_pallas_roi,
        anchor_sizes=tuple(cfg.anchor_sizes),
        anchor_ratios=tuple(cfg.anchor_ratios),
        apply_box_decay=cfg.apply_box_decay,
        compute_dtype=dtype)


def setup(cfg: DenseConfig, vocab_size: int, seq_length: int,
          state_template=None):
    """The reference's `SetupModule.setup(opt)` (DenseCap/models.py:10-42):
    build DenseCapModel / RoiModel / GT model from scratch, or restore
    the checkpoint named by `checkpoint_start_from` into
    `state_template`. Returns (model, restored_state_or_None)."""
    if cfg.model_type == "gt":
        model = build_gt_model(cfg, vocab_size, seq_length)
    else:
        model = build_rpn_model(cfg, vocab_size, seq_length)
    state = None
    if cfg.checkpoint_start_from and state_template is not None:
        state, _ = ckptlib.restore_checkpoint(cfg.checkpoint_start_from,
                                              state_template)
    return model, state


def _endless_batches(loader, cfg: DenseConfig, start_images: int = 0):
    """Endless pass over the train split; `start_images` fast-forwards
    the first epoch — the reference's resume cursor (traingt.py:51)."""
    while True:
        yield from loader.padded_batches(0, cfg.batch_size,
                                         max_regions=cfg.max_regions,
                                         shuffle=False, start=start_images)
        start_images = 0


def make_gt_train_step(model: GTDenseCaptioner, tx,
                       use_curriculum: bool, dtype):
    def train_step(state: TrainState, images_u8, boxes, labels, mask,
                   teacher_prob):
        rng, d_rng, s_rng = jax.random.split(state.rng, 3)
        x = normalize_images(images_u8, dtype=dtype)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, x, boxes, labels, train=True,
                teacher_prob=teacher_prob if use_curriculum else None,
                rngs={"dropout": d_rng, "sampling": s_rng})
            return model.loss(out, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state,
                           state.batch_stats, rng),
                {"captioning_loss": loss})
    return train_step


def train_gt(cfg: DenseConfig, *, max_iter_override: Optional[int] = None,
             eval_every_override: Optional[int] = None,
             synthetic_fallback: bool = True, synthetic_images: int = 8,
             synthetic_image_size: int = 64,
             synthetic_learnable: bool = False,
             verbose: bool = True) -> Dict:
    """The traingt.py loop. Returns a summary with histories + state."""
    if cfg.debug_nans:
        from imagecaptioning_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()
    loss_file, result_file, save_path = name_gt_model(cfg)
    loader = make_vg_loader(cfg, synthetic_fallback, synthetic_images,
                            synthetic_image_size,
                            synthetic_learnable=synthetic_learnable)
    model = build_gt_model(cfg, loader.getVocabSize(), loader.getSeqLength())
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    max_iter = max_iter_override or cfg.max_iters
    pad = cfg.loss_log_pad
    eval_every = eval_every_override or cfg.save_checkpoint_every
    finetune_start = len(loader.train_ix)      # traingt.py:87-88
    # the optimizer's step counter ticks once per APPLIED update; under
    # gradient accumulation the loop's micro-iterations run k× faster
    accum = max(getattr(cfg, "grad_accum_steps", 1), 1)
    tx = make_dense_optimizer(cfg, -(-finetune_start // accum))

    b0 = next(loader.padded_batches(0, cfg.batch_size,
                                    max_regions=cfg.max_regions))
    rng = jax.random.PRNGKey(cfg.seed)
    # jitted init: eager init dispatches per op — minutes through a
    # remote TPU relay vs one compiled program (train/step.py precedent)
    variables = jax.jit(partial(
        model.init, train=True,
        teacher_prob=jnp.float32(1.0) if cfg.use_curriculum_learning
        else None))(
        {"params": rng, "dropout": rng, "sampling": rng},
        normalize_images(b0["image"], dtype=dtype),
        jnp.asarray(b0["boxes"]), jnp.asarray(b0["labels"]))
    state = TrainState(jnp.array(0, jnp.int32), variables["params"],
                       jax.jit(tx.init)(variables["params"]),
                       variables.get("batch_stats", {}),
                       jax.random.PRNGKey(cfg.seed + 1))
    if cfg.encoder_init:
        # The reference builds from pretrained VGG16 IMAGENET1K_V1
        # (net_utils.py:8-13); merge converted weights into init params.
        from imagecaptioning_tpu.utils import pretrained
        state = pretrained.apply_encoder_init(state, cfg.encoder_init,
                                              "features")
        if verbose:
            print(f"encoder initialized from {cfg.encoder_init}")

    # Data-parallel over the mesh: batch dims sharded on 'data', state
    # replicated; XLA inserts the gradient all-reduce over ICI.
    from imagecaptioning_tpu.parallel import mesh as meshlib
    device_mesh = meshlib.mesh_for_batch(cfg.batch_size, cfg.mesh_shape,
                                         cfg.mesh_axis_names)
    data_shard = meshlib.data_sharding(device_mesh)
    repl = meshlib.replicated(device_mesh)
    train_step = jax.jit(
        make_gt_train_step(model, tx, cfg.use_curriculum_learning, dtype),
        in_shardings=(None, data_shard, data_shard, data_shard,
                      data_shard, repl),
        donate_argnums=(0,))

    loss_hist = LossHistory(loss_file, resume=cfg.from_checkpoint)
    res_hist = ResultsHistory(result_file, resume=cfg.from_checkpoint)
    tb = TBWriter(cfg.tensorboard_dir)
    start_iter = 0
    resume_from = ckptlib.resume_path(save_path) if cfg.from_checkpoint \
        else None
    if resume_from:
        state, _ = ckptlib.restore_checkpoint(resume_from, state)
        start_iter = int(state.step)
        if verbose:
            print(f"resumed from {resume_from} at iter {start_iter}")

    # each epoch pass consumes steps_per_epoch batches (ragged tail
    # dropped), so the cursor must wrap in BATCH units, not images
    steps_per_epoch = max(len(loader.train_ix) // cfg.batch_size, 1)
    batches = _endless_batches(
        loader, cfg,
        start_images=(start_iter % steps_per_epoch) * cfg.batch_size)
    it = start_iter
    last_loss = float("nan")
    # Exception-safe teardown: an exception mid-loop must still restore
    # the SIGTERM/SIGINT handlers and close the TB event stream.
    try:
        with ckptlib.SignalCheckpointer() as sig:
            for batch in batches:
                if it >= max_iter:
                    break
                if sig.save_if_requested(save_path + ".preempt", state):
                    if verbose:
                        print(f"preemption checkpoint written at iter {it}")
                    break
                tp = teacher_prob_schedule(it)
                t0 = time.perf_counter()
                state, metrics = train_step(
                    state, jnp.asarray(batch["image"]),
                    jnp.asarray(batch["boxes"]),
                    jnp.asarray(batch["labels"]),
                    jnp.asarray(batch["box_mask"]), tp)
                last_loss = float(metrics["captioning_loss"])
                step_ms = (time.perf_counter() - t0) * 1000.0
                it += 1
                if it % pad == 0:
                    loss_hist.append(it, last_loss, step_ms)
                    loss_hist.flush()
                    tb.scalar("train/captioning_loss", last_loss, it)
                    tb.scalar("train/step_ms", step_ms, it)
                    if verbose:
                        print(f"iter {it}/{max_iter} captioning_loss "
                              f"{last_loss:.5f} ({step_ms:.1f} ms)")
                if it % eval_every == 0 or it == max_iter:
                    results = dense_eval.eval_split_gt(
                        model, {"params": state.params}, loader, split=1,
                        batch_size=cfg.eval_batch_size,
                        max_regions=cfg.max_regions)
                    is_best = res_hist.append(it, results,
                                              score_key=("ap_results",
                                                         "map"))
                    res_hist.flush()
                    tb.scalars(results.get("ap_results", {}), it,
                               prefix="val/")
                    tb.flush()
                    if verbose:
                        print(f"eval@{it}: "
                              f"map={results['ap_results']['map']:.4f} "
                              f"best={is_best}")
                    if is_best:
                        ckptlib.save_checkpoint(save_path, state)
    finally:
        tb.close()
    return {
        "iters": it,
        "max_iter": max_iter,
        "final_loss": last_loss,
        "best_val_score": res_hist.best_score,
        "best_iter": res_hist.best_iter,
        "loss_file": loss_file,
        "result_file": result_file,
        "save_path": save_path,
        "state": state,
        "model": model,
        "loader": loader,
    }


# ------------------------------------------------------------- RPN path

def make_rpn_train_step(model: DenseCapRPN, tx, dtype):
    def train_step(state: TrainState, images_u8, boxes, mask, labels):
        rng, d_rng, s_rng = jax.random.split(state.rng, 3)
        x = normalize_images(images_u8, dtype=dtype)

        def loss_fn(params):
            loss_dict = model.apply(
                {"params": params}, x, boxes, mask, labels, train=True,
                rngs={"dropout": d_rng, "sampling": s_rng})
            return loss_dict["total"], loss_dict

        (_, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state,
                           state.batch_stats, rng), loss_dict)
    return train_step


def eval_split_rpn(model: DenseCapRPN, variables, loader, *,
                   split: int = 1, max_regions: Optional[int] = None,
                   max_images: int = -1, score_thresh: float = -10.0,
                   return_records: bool = False) -> Dict:
    """The `DenseCap/eval/eval_utils.eval_split` protocol over our RPN
    model: forward_test detections + greedy captions per image, full
    DenseCap mAP."""
    seq_len = loader.getSeqLength()

    @jax.jit
    def detect(variables, images):
        boxes, scores, codes, keep = model.apply(
            variables, images, method=model.forward_test)
        toks = model.apply(variables, codes, seq_len + 1,
                           method=model.generate_captions)
        return boxes, scores, toks, keep

    @jax.jit
    def anchor_stats(variables, images, gt_b, gt_m):
        """Anchor-assignment diagnostic (VERDICT r5 item 2): per GT box
        the best STATIC-anchor IoU (can any anchor clear the sampler's
        0.7/0.5 thresholds on this data at all?), and how many live
        proposals qualify as positive candidates for the num_pos-slot
        budget (BoxSampler.py:29-45 semantics via candidate_masks)."""
        from imagecaptioning_tpu.ops import boxes as boxlib
        from imagecaptioning_tpu.ops.box_sampler import candidate_masks
        rpn = model.apply(variables, images, method=model.proposals_only)
        best_anchor_iou = boxlib.box_iou(gt_b, rpn.anchors).max(axis=1)
        ih, iw = images.shape[1], images.shape[2]
        _, in_b = boxlib.clip_boxes(rpn.proposals[0], ih, iw)
        pos_mask, _, _ = candidate_masks(rpn.proposals[0], gt_b,
                                         gt_m > 0, in_bounds=in_b)
        return best_anchor_iou, pos_mask.sum()

    evaluator = dense_eval.DenseCaptioningEvaluator()
    vocab = loader.vocab
    seen = 0
    best_anchor_ious: list = []
    pos_candidates: list = []
    recall_acc: Dict[str, list] = {}
    for batch in loader.padded_batches(split, 1, max_regions):
        if 0 < max_images <= seen:
            break
        images = normalize_images(batch["image"])
        boxes, scores, toks, keep = detect(variables, images)
        b = np.asarray(boxes[0])
        s = np.asarray(scores[0])
        k = np.asarray(keep[0]) & (s > score_thresh)
        toks = np.asarray(toks).reshape(1, b.shape[0], -1)[0]
        caps = vocab.decode_sequence(toks[k]) if k.any() else []
        m = batch["box_mask"][0] > 0
        gt_caps = vocab.decode_sequence(batch["labels"][0][m])
        iou_per_gt, n_pos = anchor_stats(variables, images,
                                         jnp.asarray(batch["boxes"][0]),
                                         jnp.asarray(batch["box_mask"][0]))
        best_anchor_ious.extend(np.asarray(iou_per_gt)[np.asarray(m)])
        pos_candidates.append(float(n_pos))
        if k.any():
            evaluator.addResult(s[k], b[k], caps, batch["boxes"][0][m],
                                gt_caps)
            # proposal recall (eval_box_recalls, the repaired
            # box_utils.py:162-185 protocol): how well the DETECTION
            # stage alone covers GT — separates "proposals are bad"
            # from "captioning on good proposals is bad" (VERDICT r4)
            order = np.argsort(-s[k])
            n_kept = int(k.sum())
            rec = dense_eval.eval_box_recalls(
                b[k][order], np.asarray(batch["boxes"][0][m]),
                ns=[10, 50, 100, n_kept])
            for key, v in rec.items():
                # the n_kept column averages consistently as 'at_all'
                key = key.replace(f"_at_{n_kept}", "_at_all") \
                    if key.endswith(f"_at_{n_kept}") else key
                recall_acc.setdefault(key, []).append(v)
        seen += 1
    out = {"ap_results": evaluator.evaluate(), "num_images": seen}
    out["ap_results"]["proposal_recall"] = {
        k: round(float(np.mean(v)), 4) for k, v in recall_acc.items()}
    if best_anchor_ious:
        bai = np.asarray(best_anchor_ious)
        pc = np.asarray(pos_candidates)
        out["ap_results"]["anchor_assignment"] = {
            "gt_frac_best_anchor_iou_ge_0.7": round(float(
                (bai >= 0.7).mean()), 4),
            "gt_frac_best_anchor_iou_ge_0.5": round(float(
                (bai >= 0.5).mean()), 4),
            "mean_best_anchor_iou": round(float(bai.mean()), 4),
            "pos_candidates_mean": round(float(pc.mean()), 2),
            "pos_occupancy": round(float(
                np.minimum(pc, model.num_pos).mean() / model.num_pos), 4),
        }
    if return_records:
        out["records"] = [{"candidate": r["candidate"],
                           "references": r.get("references", [])}
                          for r in evaluator.records]
    return out


def train_rpn(cfg: DenseConfig, *, max_iter_override: Optional[int] = None,
              eval_every_override: Optional[int] = None,
              synthetic_fallback: bool = True, synthetic_images: int = 8,
              synthetic_image_size: int = 64,
              synthetic_learnable: bool = False,
              verbose: bool = True) -> Dict:
    """The repaired DenseCap/train.py loop over DenseCapRPN."""
    loader = make_vg_loader(cfg, synthetic_fallback, synthetic_images,
                            synthetic_image_size,
                            synthetic_learnable=synthetic_learnable)
    model = build_rpn_model(cfg, loader.getVocabSize(),
                            loader.getSeqLength())
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    max_iter = max_iter_override or cfg.max_iters
    eval_every = eval_every_override or cfg.save_checkpoint_every
    # applied-update units under gradient accumulation (see train_gt)
    accum = max(getattr(cfg, "grad_accum_steps", 1), 1)
    tx = make_dense_optimizer(cfg, -(-len(loader.train_ix) // accum))

    b0 = next(loader.padded_batches(0, cfg.batch_size,
                                    max_regions=cfg.max_regions))
    rng = jax.random.PRNGKey(cfg.seed)
    variables = jax.jit(partial(model.init, train=True))(
        {"params": rng, "dropout": rng, "sampling": rng},
        normalize_images(b0["image"], dtype=dtype),
        jnp.asarray(b0["boxes"]), jnp.asarray(b0["box_mask"]),
        jnp.asarray(b0["labels"]))
    state = TrainState(jnp.array(0, jnp.int32), variables["params"],
                       jax.jit(tx.init)(variables["params"]),
                       variables.get("batch_stats", {}),
                       jax.random.PRNGKey(cfg.seed + 1))
    if cfg.encoder_init:
        from imagecaptioning_tpu.utils import pretrained
        state = pretrained.apply_encoder_init(state, cfg.encoder_init,
                                              "conv_trunk")
        if verbose:
            print(f"encoder initialized from {cfg.encoder_init}")
    from imagecaptioning_tpu.parallel import mesh as meshlib
    device_mesh = meshlib.mesh_for_batch(cfg.batch_size, cfg.mesh_shape,
                                         cfg.mesh_axis_names)
    data_shard = meshlib.data_sharding(device_mesh)
    train_step = jax.jit(make_rpn_train_step(model, tx, dtype),
                         in_shardings=(None, data_shard, data_shard,
                                       data_shard, data_shard),
                         donate_argnums=(0,))

    loss_hist = LossHistory(cfg.loss_file, resume=cfg.from_checkpoint)
    res_hist = ResultsHistory(cfg.result_file, resume=cfg.from_checkpoint)
    tb = TBWriter(cfg.tensorboard_dir)

    # resume + preemption, same machinery as train_gt (the reference's
    # DenseCap/train.py has neither — it is broken as committed)
    start_iter = 0
    resume_from = (ckptlib.resume_path(cfg.save_path)
                   if cfg.from_checkpoint else None)
    if resume_from:
        state, _ = ckptlib.restore_checkpoint(resume_from, state)
        start_iter = int(state.step)
        # restored leaves land on the default device; replicate onto the
        # step's mesh so the sharded jit accepts them
        repl = meshlib.replicated(device_mesh)
        state = jax.tree.map(lambda x: jax.device_put(np.asarray(x), repl),
                             state)
        if verbose:
            print(f"resumed from {resume_from} at iter {start_iter}")
    steps_per_epoch = max(len(loader.train_ix) // cfg.batch_size, 1)
    batches = _endless_batches(
        loader, cfg,
        start_images=(start_iter % steps_per_epoch) * cfg.batch_size)

    it = start_iter
    last = {}
    # Exception-safe teardown (same as train_gt): restore signal
    # handlers and close TB even when the loop raises.
    try:
        with ckptlib.SignalCheckpointer() as sig:
            for batch in batches:
                if it >= max_iter:
                    break
                if sig.save_if_requested(cfg.save_path + ".preempt", state):
                    if verbose:
                        print(f"preemption checkpoint written at iter {it}")
                    break
                t0 = time.perf_counter()
                state, loss_dict = train_step(
                    state, jnp.asarray(batch["image"]),
                    jnp.asarray(batch["boxes"]),
                    jnp.asarray(batch["box_mask"]),
                    jnp.asarray(batch["labels"]))
                last = {k: float(v) for k, v in loss_dict.items()}
                step_ms = (time.perf_counter() - t0) * 1000.0
                it += 1
                if it % cfg.losses_log_every == 0:
                    loss_hist.append(it, last["total"], step_ms)
                    loss_hist.flush()
                    tb.scalars(last, it, prefix="train/")
                    tb.scalar("train/step_ms", step_ms, it)
                    if verbose:
                        msg = ", ".join(f"{k}: {v:.5f}"
                                        for k, v in last.items())
                        print(f"iter {it}/{max_iter} -> {msg}")
                if it % eval_every == 0 or it == max_iter:
                    results = eval_split_rpn(model,
                                             {"params": state.params},
                                             loader, split=1,
                                             max_regions=cfg.max_regions)
                    is_best = res_hist.append(it, results,
                                              score_key=("ap_results",
                                                         "map"))
                    res_hist.flush()
                    if is_best:
                        ckptlib.save_checkpoint(cfg.save_path, state)
                    tb.scalars(results.get("ap_results", {}), it,
                               prefix="val/")
                    tb.flush()
                    if verbose:
                        print(f"eval@{it}: "
                              f"map={results['ap_results']['map']:.4f}")
    finally:
        tb.close()
    return {
        "iters": it, "max_iter": max_iter, "final_losses": last,
        "best_val_score": res_hist.best_score,
        "best_iter": res_hist.best_iter,
        "state": state, "model": model, "loader": loader,
    }
