"""Dense-captioning evaluation — the DenseCap mAP protocol and the
GT-box simplified protocol, host-side numpy.

Behavior match (SURVEY §2.3/2.4):

- `merge_boxes` / `pluck_boxes`: greedy IoU≥0.7 clustering of GT boxes
  and per-cluster mean box + reference-text pluck
  (`DenseCap/densecap/box_utils.py:188-204`,
  `DenseCap/eval/eval_utils.py:11-30`). NB the reference's `thr`
  argument is *ignored* — the loop hardcodes 0.7 (`box_utils.py:191`);
  we honor `thr` but default it to 0.7, which is the only value ever
  used.
- `DenseCaptioningEvaluator`: predictions sorted by logprob, greedily
  matched to merged GT with a one-use flag (`eval_utils.py:57-93` —
  including the quirk that a zero-overlap prediction still consumes
  merged-GT slot `jmax=0` via the `used` array); METEOR per record;
  AP grid over min_overlap {.3..7} × min_score {-1,0,.05..25} with
  101-point interpolated AP (`eval_utils.py:98-163`); `map` averages
  the language-aware cells, `detmap` the min_score=-1 column.
- `GTDenseCaptioningEvaluator`: the AlexGTModel variant — merges the
  *GT* boxes, matches prediction i (region order, no logprob sort) by
  IoU argmax, grid over min_score only, plus mean METEOR
  (`AlexGTModel/eval/eval_gt.py:113-168`).
- `eval_box_recalls`: proposal recall at IoU {.5,.7,.9} for top-n
  proposal budgets (`box_utils.py:162-185`; the reference version is
  unrunnable as committed — indexes a list by string key — this is the
  repaired semantics).

METEOR uses NLTK word_tokenize when its data is available, falling back
to whitespace tokenization (`eval_utils.py:245-257`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

MIN_OVERLAPS = (0.3, 0.4, 0.5, 0.6, 0.7)
MIN_SCORES = (-1, 0, 0.05, 0.1, 0.15, 0.2, 0.25)
GT_MIN_SCORES = (0, 0.05, 0.1, 0.15, 0.2, 0.25)


# ------------------------------------------------------------ box math

def xcycwh_to_corners(boxes: np.ndarray) -> np.ndarray:
    """(xc, yc, w, h) → (x1, y1, x2, y2), the reference's ±(w−1)/2
    1-indexed pixel convention (`box_utils.py:7-38`)."""
    b = np.asarray(boxes, np.float64)
    xc, yc, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([xc - (w - 1) / 2, yc - (h - 1) / 2,
                     xc + (w - 1) / 2, yc + (h - 1) / 2], axis=-1)


def corners_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """torchvision.ops.box_iou semantics on corner boxes: (N,4)×(M,4)→(N,M)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def merge_boxes(boxes_corners: np.ndarray, thr: float = 0.7) -> List[np.ndarray]:
    """Greedy IoU clustering: repeatedly take the box with the most
    IoU≥thr partners, emit that cluster, zero its rows/cols."""
    assert thr > 0
    d = corners_iou(boxes_corners, boxes_corners)
    clusters = []
    while True:
        good = d >= thr
        good_sum = good.sum(axis=0)
        topix = int(np.argmax(good_sum))
        if good_sum[topix] == 0:
            break
        mergeix = np.nonzero(good[topix])[0]
        clusters.append(mergeix)
        d[mergeix, :] = 0
        d[:, mergeix] = 0
    return clusters


def pluck_boxes(clusters: Sequence[np.ndarray], boxes_corners: np.ndarray,
                text: Sequence[str]):
    """Per cluster: mean box + the member texts (`eval_utils.py:11-30`)."""
    merged = np.stack([boxes_corners[c].mean(axis=0) for c in clusters]) \
        if clusters else np.zeros((0, 4))
    merged_text = [[text[j] for j in c] if len(text) else []
                   for c in clusters]
    return merged, merged_text


def eval_box_recalls(boxes_xcycwh: np.ndarray, gt_xcycwh: np.ndarray,
                     ns: Optional[Sequence[int]] = None) -> Dict[str, float]:
    """Recall of the top-n proposals vs GT at IoU {.5,.7,.9}. Proposals
    must already be sorted best-first."""
    ns = list(ns) if ns is not None else [100, 200, 300]
    ious = corners_iou(xcycwh_to_corners(boxes_xcycwh),
                       xcycwh_to_corners(gt_xcycwh))   # (P, G)
    stats: Dict[str, float] = {}
    for thresh in (0.5, 0.7, 0.9):
        hit = np.cumsum(ious > thresh, axis=0) > 0     # gt hit by top-i
        recalls = hit.sum(axis=1) / max(gt_xcycwh.shape[0], 1)
        for n in ns:
            if n <= recalls.shape[0]:
                stats[f"{thresh:.2f}_recall_at_{n}"] = float(recalls[n - 1])
    return stats


# ------------------------------------------------------------- scoring

def _meteor(references: Sequence[str], candidate: str) -> float:
    from imagecaptioning_tpu.eval.scorer import meteor_pair
    try:
        from nltk import word_tokenize
        refs = [word_tokenize(r) for r in references]
        cand = word_tokenize(candidate)
    except LookupError:            # punkt data unavailable offline
        refs = [r.split() for r in references]
        cand = candidate.split()
    if not refs or not cand:
        return 0.0
    try:
        return round(meteor_pair(refs, cand), 4)
    except ValueError:
        return 0.0


def score_records(records: Sequence[Dict]) -> Dict:
    """{'scores': [...], 'average_score': mean} — eval_utils.score_captions."""
    scores = [_meteor(r["references"], r["candidate"]) for r in records]
    avg = sum(scores) / len(scores) if scores else 0.0
    return {"scores": scores, "average_score": avg}


def _interpolated_ap(tp: np.ndarray, fp: np.ndarray, npos: int) -> float:
    """101-point interpolated AP (`eval_utils.py:144-157`)."""
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    with np.errstate(divide="ignore", invalid="ignore"):
        rec = tp / max(npos, 1)
        prec = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
    ap = 0.0
    for t in range(101):
        mask = rec >= (t / 100.0)
        p = float(np.max(prec * mask)) if prec.size else 0.0
        ap += p
    return ap / 101.0


def _average_values(d: Dict[str, float]) -> float:
    return sum(d.values()) / len(d) if d else 0.0


# --------------------------------------------------- full DenseCap mAP

class DenseCaptioningEvaluator:
    """The DenseCap protocol (`eval_utils.py:32-170`)."""

    def __init__(self, id: str = ""):
        self.all_logprobs: List[np.ndarray] = []
        self.records: List[Dict] = []
        self.n = 1
        self.npos = 0
        self.id = id

    def addResult(self, logprobs, boxes, text, target_boxes, target_text):
        """One image: predicted (logprobs (D,), boxes (D,4) xcycwh,
        captions [D]) vs GT (target_boxes (G,4) xcycwh, captions [G])."""
        logprobs = np.asarray(logprobs, np.float64).reshape(-1)
        boxes = xcycwh_to_corners(boxes)
        target_boxes = xcycwh_to_corners(target_boxes)
        assert logprobs.shape[0] == boxes.shape[0] == len(text)
        assert target_boxes.shape[0] == len(target_text)

        clusters = merge_boxes(target_boxes, 0.7)
        merged_boxes, merged_text = pluck_boxes(clusters, target_boxes,
                                                target_text)
        order = np.argsort(-logprobs, kind="stable")
        nt = merged_boxes.shape[0]
        used = np.zeros(nt, np.int64)
        ov = corners_iou(merged_boxes, boxes)     # (nt, nd)

        for ii in order:
            ovmax, jmax, j_ok = 0.0, 0, False
            for j in range(nt):
                if ov[j, ii] > ovmax:
                    ovmax, jmax, j_ok = float(ov[j, ii]), j, True
            # reference quirk: the `used` slot is consumed even at ov=0
            ok = 1
            if nt > 0 and used[jmax] == 0:
                used[jmax] = 1
            else:
                ok = 0
            self.records.append({
                "ok": ok, "ov": ovmax,
                "candidate": text[ii],
                "references": merged_text[jmax] if j_ok else [],
                "imgid": self.n,
            })
        self.n += 1
        self.npos += nt
        self.all_logprobs.append(np.sort(logprobs)[::-1])

    def numAdded(self) -> int:
        return self.n - 1

    def evaluate(self, verbose: bool = False) -> Dict:
        logprobs = (np.concatenate(self.all_logprobs)
                    if self.all_logprobs else np.zeros(0))
        blob = score_records(self.records)
        scores = blob["scores"]
        ix = np.argsort(-logprobs, kind="stable")

        ap_results: Dict[str, float] = {}
        det_results: Dict[str, float] = {}
        for min_overlap in MIN_OVERLAPS:
            for min_score in MIN_SCORES:
                tp = np.zeros(len(ix))
                fp = np.zeros(len(ix))
                for i, ii in enumerate(ix):
                    r = self.records[ii]
                    if (r["ov"] >= min_overlap and r["ok"] == 1
                            and scores[ii] > min_score):
                        tp[i] = 1
                    else:
                        fp[i] = 1
                ap = _interpolated_ap(tp, fp, self.npos)
                if min_score == -1:
                    det_results[f"ov{min_overlap}"] = ap
                else:
                    ap_results[f"ov{min_overlap}score{min_score}"] = ap
        from imagecaptioning_tpu.eval.scorer import scorer_provenance
        return {
            "map": _average_values(ap_results),
            "ap_breakdown": ap_results,
            "detmap": _average_values(det_results),
            "det_breakdown": det_results,
            "meteor": blob["average_score"],
            "scorer": scorer_provenance(),
        }


# ------------------------------------------------------ GT-box variant

class GTDenseCaptioningEvaluator:
    """The AlexGTModel protocol (`eval_gt.py:8-168`): boxes are the GT
    boxes themselves; prediction i is the caption for GT box i."""

    def __init__(self, id: str = ""):
        self.records: List[Dict] = []
        self.n = 1
        self.npos = 0
        self.id = id

    def addResult(self, boxes, text, target_text, info: Optional[Dict] = None):
        boxes = xcycwh_to_corners(boxes)
        clusters = merge_boxes(boxes, 0.7)
        merged_boxes, merged_text = pluck_boxes(clusters, boxes, target_text)
        nt = merged_boxes.shape[0]
        nd = boxes.shape[0]
        used = np.zeros(nt, np.int64)
        ov = corners_iou(merged_boxes, boxes)

        for i in range(nd):
            ovmax, jmax = 0.0, 0
            for j in range(nt):
                if ov[j, i] > ovmax:
                    ovmax, jmax = float(ov[j, i]), j
            ok = 1
            if nt > 0 and used[jmax] == 0:
                used[jmax] = 1
            else:
                ok = 0
            self.records.append({
                "ok": ok,
                "candidate": text[i],
                "references": merged_text[jmax] if nt > 0 else [],
                "imgid": (info or {}).get("filename"),
            })
        self.n += 1
        self.npos += nt

    def evaluate(self, verbose: bool = False) -> Dict:
        blob = score_records(self.records)
        scores = blob["scores"]
        ap_results: Dict[str, float] = {}
        for min_score in GT_MIN_SCORES:
            tp = np.zeros(len(scores))
            fp = np.zeros(len(scores))
            for i, r in enumerate(self.records):
                if scores[i] > min_score and r["ok"] == 1:
                    tp[i] = 1
                else:
                    fp[i] = 1
            ap_results[f"score{min_score}"] = _interpolated_ap(
                tp, fp, self.npos)
        from imagecaptioning_tpu.eval.scorer import scorer_provenance
        return {
            "map": _average_values(ap_results),
            "ap_breakdown": ap_results,
            "meteor": blob["average_score"],
            "scorer": scorer_provenance(),
        }


# ------------------------------------------------------------ GT loop

def eval_split_gt(model, variables, loader, *, split: int = 1,
                  batch_size: int = 2, max_regions: Optional[int] = None,
                  max_images: int = -1, use_beam: bool = False,
                  beam_size: int = 3,
                  return_records: bool = False) -> Dict:
    """The `eval_gt.eval_split` loop (`eval_gt.py:170-236`) over our
    GTDenseCaptioner: per batch, eval-mode loss + per-region greedy/beam
    captions; per image, `addResult(gt_boxes, captions, gt_captions)`.

    TPU-native: images are batched (the reference walks one image at a
    time), decode is one fused scan over all padded regions, and METEOR
    scoring stays host-side.

    Returns {'loss_results': mean_loss, 'ap_results': {'map',
    'ap_breakdown', 'meteor'}, 'num_images': n}.
    """
    import jax
    import jax.numpy as jnp

    from imagecaptioning_tpu.data.vg_loader import normalize_images
    from imagecaptioning_tpu.models import api

    seq_len = loader.getSeqLength()
    decode = (api.make_region_beam_fn(model, seq_len + 1, beam_size)
              if use_beam else
              api.make_region_greedy_fn(model, seq_len + 1))

    @jax.jit
    def loss_fn(variables, images, boxes, labels, mask):
        out = model.apply(variables, images, boxes, labels, train=False)
        return model.loss(out, labels, mask)

    evaluator = GTDenseCaptioningEvaluator()
    losses: List[float] = []
    vocab = loader.vocab
    seen = 0
    for batch in loader.padded_batches(split, batch_size, max_regions):
        if 0 < max_images <= seen:
            break
        images = normalize_images(batch["image"])
        boxes = jnp.asarray(batch["boxes"])
        labels = jnp.asarray(batch["labels"])
        mask = jnp.asarray(batch["box_mask"])
        losses.append(float(loss_fn(variables, images, boxes, labels, mask)))

        res = decode(variables, images, boxes)
        toks = np.asarray(res.tokens[:, 0] if use_beam else res)
        n, r = batch["box_mask"].shape
        toks = toks.reshape(n, r, -1)
        for i in range(n):
            m = batch["box_mask"][i] > 0
            captions = vocab.decode_sequence(toks[i][m])
            gt_caps = vocab.decode_sequence(batch["labels"][i][m])
            evaluator.addResult(batch["boxes"][i][m], captions, gt_caps)
            seen += 1

    out = {
        "loss_results": float(np.mean(losses)) if losses else None,
        "ap_results": evaluator.evaluate(),
        "num_images": seen,
    }
    if return_records:
        # per-region decoded captions next to their merged-GT references
        out["records"] = [{"candidate": r["candidate"],
                           "references": r["references"]}
                          for r in evaluator.records]
    return out
