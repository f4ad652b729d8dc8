"""Split evaluation — the reference `eval_split` loop semantics
(`AlexCap/eval/eval_resnet.py:43-123`): one sequential pass over a
split; per batch record (a) eval-mode loss and (b) decoded predictions
vs decoded ground truth; finish with NLTK METEOR/BLEU averages.

Returns the reference's result schema:
  {'loss_results': mean_loss,
   'ap_results': {'meteor': m, 'bleu': b}}

TPU-native: decode runs as the fused greedy/beam scan on device while
NLTK scoring streams on host threads; batches prefetch ahead.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from imagecaptioning_tpu.eval.scorer import CaptioningEvaluator
from imagecaptioning_tpu.models import api


def eval_split(model, variables, loader, *, split: int = 1,
               batch_size: int = 12,
               preprocess=None,
               use_beam: bool = False, beam_size: int = 3,
               max_images: int = -1,
               eval_loss_fn=None,
               return_records: bool = False) -> Dict:
    seq_len = loader.getSeqLength()
    decode = (api.make_beam_fn(model, seq_len + 1, beam_size) if use_beam
              else api.make_greedy_fn(model, seq_len + 1))
    evaluator = CaptioningEvaluator()
    losses = []
    vocab = loader.vocab

    seen = 0
    for images_u8, labels in loader.epoch_batches(split, batch_size):
        if 0 < max_images <= seen:
            break
        seen += images_u8.shape[0]
        x = jnp.asarray(images_u8)
        if preprocess is not None:
            x = preprocess(x)
        gt = jnp.asarray(labels)

        if eval_loss_fn is not None:
            losses.append(float(eval_loss_fn(variables, x, gt)))

        if use_beam:
            res = decode(variables, x)
            toks = np.asarray(res.tokens[:, 0])
        else:
            toks, _ = decode(variables, x)
            toks = np.asarray(toks)

        preds = vocab.decode_sequence(toks)
        refs = vocab.decode_sequence(np.asarray(labels))
        evaluator.add_result(preds, [[r] for r in refs])

    ap = evaluator.evaluate()
    out = {"loss_results": float(np.mean(losses)) if losses else None,
           "ap_results": ap,
           "num_images": seen}
    if return_records:
        # decoded (candidate, references) pairs — lets committed
        # evidence artifacts show WHAT was predicted, not just scores
        out["records"] = evaluator.records
    return out
