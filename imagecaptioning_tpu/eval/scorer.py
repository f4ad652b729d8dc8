"""Caption scoring — NLTK sentence METEOR + smoothed sentence BLEU,
matching the reference's protocol exactly (`AlexCap/eval/
eval_resnet.py:108-123`): per (candidate, references) pair compute
`meteor_score(refs_tokenized, cand_tokenized)` and
`sentence_bleu(refs, cand, smoothing_function=method4)`, then average
over records. Empty candidates score 0 (NLTK raises otherwise).

Runs host-side in a thread pool — scoring is pure-Python NLTK and would
otherwise serialize against device decode (SURVEY §7 'host/device
split of eval').
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Sequence


class _EmptyWordnet:
    """Wordnet stand-in when the NLTK corpus is unavailable offline:
    METEOR still aligns via its exact and Porter-stem stages, only the
    synonym stage degrades (finds nothing)."""

    def synsets(self, word):
        return []


_PROVENANCE_CACHE: Dict = {}


def scorer_provenance() -> Dict:
    """Which METEOR path this host runs: with the wordnet corpus, or the
    `_EmptyWordnet` degradation (synonym stage finds nothing). Stamped
    into every eval artifact so committed METEOR numbers carry their
    provenance — scores from wordnet-less hosts are systematically a
    touch lower and must not be compared against wordnet-full ones."""
    if not _PROVENANCE_CACHE:
        import nltk
        try:
            from nltk.corpus import wordnet
            wordnet.synsets("dog")
            available = True
        except LookupError:
            available = False
        _PROVENANCE_CACHE.update({"wordnet_available": available,
                                  "nltk": nltk.__version__})
    return dict(_PROVENANCE_CACHE)


def meteor_pair(references_tok, candidate_tok) -> float:
    from nltk.translate.meteor_score import meteor_score
    try:
        return float(meteor_score(references_tok, candidate_tok))
    except LookupError:      # no wordnet corpus on this host
        return float(meteor_score(references_tok, candidate_tok,
                                  wordnet=_EmptyWordnet()))


def _score_pair(candidate: str, references: Sequence[str]):
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    cand_tok = candidate.split()
    refs_tok = [r.split() for r in references]
    if not cand_tok or not any(refs_tok):
        return 0.0, 0.0
    meteor = meteor_pair(refs_tok, cand_tok)
    bleu = sentence_bleu(refs_tok, cand_tok,
                         smoothing_function=SmoothingFunction().method4)
    return float(meteor), float(bleu)


def _corpus_scores(records: Sequence[Dict]) -> Dict:
    """Corpus-level BLEU-4 + CIDEr-D (the BASELINE.json harness metrics;
    the reference computes neither). BLEU-4 is NLTK `corpus_bleu` with
    method1 epsilon-smoothing (guards log(0) on tiny corpora)."""
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    from imagecaptioning_tpu.eval.cider import CiderD

    cands = [r["candidate"].split() for r in records]
    refs = [[x.split() for x in r["references"]] for r in records]
    # keep records with EMPTY candidates: they must count against the
    # corpus metrics (pycocoevalcap scores them 0 and includes them) —
    # dropping them would inflate bleu4/cider relative to meteor/bleu.
    # Records with no non-empty reference are unscorable and dropped.
    pairs = [(c, [r for r in rs if r]) for c, rs in zip(cands, refs)
             if any(rs)]
    if not pairs or not any(c for c, _ in pairs):
        return {"bleu4": 0.0, "cider": 0.0}
    import warnings
    with warnings.catch_warnings():
        # nltk warns per empty/low-overlap hypothesis — expected at
        # early training, pure log noise in the eval loop
        warnings.simplefilter("ignore")
        bleu4 = float(corpus_bleu(
            [rs for _, rs in pairs], [c for c, _ in pairs],
            smoothing_function=SmoothingFunction().method1))
    cider = CiderD()
    for c, rs in pairs:
        cider.add(c, rs)
    return {"bleu4": bleu4, "cider": cider.compute()[0]}


def score_captions(records: Sequence[Dict], num_workers: int = 8) -> Dict:
    """records: [{'candidate': str, 'references': [str, ...]}, ...] →
    {'meteor': mean, 'bleu': mean sentence-BLEU (reference protocol),
    'bleu4': corpus BLEU-4, 'cider': CIDEr-D}."""
    if not records:
        return {"meteor": 0.0, "bleu": 0.0, "bleu4": 0.0, "cider": 0.0,
                "scorer": scorer_provenance()}
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        scores = list(pool.map(
            lambda r: _score_pair(r["candidate"], r["references"]), records))
    n = len(scores)
    return {"meteor": sum(s[0] for s in scores) / n,
            "bleu": sum(s[1] for s in scores) / n,
            **_corpus_scores(records),
            "scorer": scorer_provenance()}


@dataclass
class CaptioningEvaluator:
    """Accumulates (prediction, references) records across eval batches —
    the reference's `DenseCaptioningEvaluator.addResult` contract
    (`eval_resnet.py:14-26`)."""

    records: List[Dict] = field(default_factory=list)

    def add_result(self, predictions: Sequence[str],
                   references: Sequence[Sequence[str]],
                   ids: Sequence = ()) -> None:
        ids = list(ids) or [None] * len(predictions)
        for pred, refs, rid in zip(predictions, references, ids):
            if isinstance(refs, str):
                refs = [refs]
            self.records.append({"candidate": pred,
                                 "references": list(refs), "id": rid})

    def evaluate(self) -> Dict:
        return score_captions(self.records)
