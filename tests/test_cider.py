"""CIDEr-D + corpus BLEU-4 harness tests (BASELINE.json metrics)."""

import numpy as np
import pytest

from imagecaptioning_tpu.eval.cider import CiderD
from imagecaptioning_tpu.eval.scorer import score_captions


def _corpus(pairs):
    c = CiderD()
    for cand, refs in pairs:
        c.add(cand.split(), [r.split() for r in refs])
    return c.compute()


class TestCiderD:
    def test_exact_match_scores_ten(self):
        # candidate == only reference: cosine 1, clip no-op, penalty 1
        # for every n -> 10 * mean_n 1 = 10. Needs a second image so the
        # idf of the first image's n-grams is nonzero.
        mean, per = _corpus([
            ("a man rides a red horse", ["a man rides a red horse"]),
            ("the blue bird flies high", ["the blue bird flies high"]),
        ])
        assert per[0] == pytest.approx(10.0, abs=1e-9)
        assert per[1] == pytest.approx(10.0, abs=1e-9)
        assert mean == pytest.approx(10.0, abs=1e-9)

    def test_disjoint_scores_zero(self):
        mean, per = _corpus([
            ("aa bb cc dd", ["ww xx yy zz"]),
            ("ee ff gg hh", ["ii jj kk ll"]),
        ])
        assert per[0] == 0.0 and per[1] == 0.0

    def test_partial_overlap_between_zero_and_ten(self):
        mean, per = _corpus([
            ("a man rides a horse", ["a man rides a red horse"]),
            ("the blue bird flies", ["the green bird flies high"]),
        ])
        assert 0.0 < per[0] < 10.0
        assert 0.0 < per[1] < 10.0

    def test_idf_downweights_corpus_common_ngrams(self):
        # Candidate A matches its reference only on an n-gram shared by
        # EVERY image (idf -> 0); candidate B matches on a unique one.
        # B must outscore A.
        common = [
            ("the cat sat x1 y1", ["the cat sat p1 q1"]),      # A
            ("z9 w9 unique match", ["k9 j9 unique match"]),    # B
            ("the cat sat a2 b2", ["the cat sat c2 d2"]),
            ("the cat sat a3 b3", ["the cat sat c3 d3"]),
        ]
        _, per = _corpus(common)
        assert per[1] > per[0]

    def test_length_penalty(self):
        # same unigram content, very different lengths -> penalized
        short = [("match word", ["match word " + "pad " * 12]),
                 ("other thing", ["other thing"])]
        same = [("match word", ["match word"]),
                ("other thing", ["other thing"])]
        _, per_short = _corpus(short)
        _, per_same = _corpus(same)
        assert per_short[0] < per_same[0]

    def test_empty_corpus(self):
        assert CiderD().compute() == (0.0, [])


class TestScorerCorpusMetrics:
    def test_score_captions_has_all_metrics(self):
        records = [
            {"candidate": "a man rides a red horse",
             "references": ["a man rides a red horse"]},
            {"candidate": "the blue bird flies high",
             "references": ["the blue bird flies high"]},
        ]
        out = score_captions(records)
        assert set(out) == {"meteor", "bleu", "bleu4", "cider", "scorer"}
        assert out["bleu4"] == pytest.approx(1.0)
        assert out["cider"] == pytest.approx(10.0, abs=1e-9)
        assert out["meteor"] > 0.9
        # every eval artifact carries its METEOR provenance (VERDICT r3):
        # wordnet-less hosts degrade the synonym stage and must be
        # distinguishable from wordnet-full ones in committed numbers
        assert isinstance(out["scorer"]["wordnet_available"], bool)
        assert isinstance(out["scorer"]["nltk"], str)

    def test_empty_records(self):
        out = score_captions([])
        scorer_stamp = out.pop("scorer")
        assert isinstance(scorer_stamp["wordnet_available"], bool)
        assert out == {"meteor": 0.0, "bleu": 0.0, "bleu4": 0.0,
                       "cider": 0.0}
