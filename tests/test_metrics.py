"""Metric parity tests: SSIM vs reference pytorch_ssim, CIDEr vs the
reference's vendored scorer, BLEU/ROUGE sanity."""

import sys

import numpy as np
import pytest

from ppvision_tpu.metrics import bleu_scores, cider_score, meteor_avg, psnr, rouge_lsum, ssim

from .golden_reference import REFERENCE_ROOT


def test_ssim_matches_reference_pytorch_ssim():
    torch = pytest.importorskip("torch")
    path = f"{REFERENCE_ROOT}/Image_Caption"
    if path not in sys.path:
        sys.path.append(path)
    from pytorch_ssim import ssim as torch_ssim  # noqa: PLC0415

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(2, 3, 48, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)

    want = float(torch_ssim(torch.tensor(a), torch.tensor(b)))
    got = float(ssim(np.transpose(a, (0, 2, 3, 1)), np.transpose(b, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Identical images -> SSIM ~ 1.
    assert float(ssim(np.transpose(a, (0, 2, 3, 1)), np.transpose(a, (0, 2, 3, 1)))) > 0.999


def test_psnr_known_value():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full((1, 8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


CAPS = [
    (["a", "man", "rides", "a", "horse"],
     [["a", "man", "is", "riding", "a", "horse"],
      ["a", "person", "rides", "a", "brown", "horse"]]),
    (["two", "dogs", "play", "in", "grass"],
     [["two", "dogs", "playing", "in", "the", "grass"],
      ["dogs", "play", "outside", "in", "grass"]]),
    (["a", "cat", "sits", "on", "a", "mat"],
     [["a", "cat", "sitting", "on", "a", "mat"],
      ["the", "cat", "sits", "on", "the", "mat"]]),
]


def test_cider_matches_reference_scorer():
    path = f"{REFERENCE_ROOT}/Image_Caption"
    if path not in sys.path:
        sys.path.append(path)
    from cider_metric.cider_scorer import CiderScorer  # noqa: PLC0415

    hyps = [h for h, _ in CAPS]
    refs = [r for _, r in CAPS]
    scorer = CiderScorer()
    for h, rs in zip(hyps, refs):
        scorer += (" ".join(h), [" ".join(r) for r in rs])
    want_mean, want_scores = scorer.compute_score()

    got_mean, got_scores = cider_score(refs, hyps)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-8)
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-8)


def test_bleu_meteor_rouge_sanity():
    hyps = [h for h, _ in CAPS]
    refs = [r for _, r in CAPS]
    b = bleu_scores(refs, hyps)
    assert 0 < b["bleu4"] <= b["bleu1"] <= 1.0
    m = meteor_avg(refs, hyps)
    assert 0 < m <= 1.0
    # Perfect hypotheses -> rouge 1, bleu1 1.
    perfect = [r[0] for r in refs]
    assert rouge_lsum([[r[0]] for r in refs], perfect) == pytest.approx(1.0)
    assert bleu_scores([[r[0]] for r in refs], perfect)["bleu1"] == pytest.approx(1.0)
    # Disjoint -> 0.
    junk = [["xyzzy", "qwerty"]] * len(refs)
    assert rouge_lsum(refs, junk) == 0.0


def test_meteor_wordnetless_fallback_is_loud(capsys):
    """Without the wordnet corpus, METEOR must still compute (exact+stem
    stages) and WARN loudly that the synonym stage is skipped."""
    import ppvision_tpu.metrics.text as T

    T._warned_no_wordnet = False
    # An unmatched word forces the wordnet synonym stage to actually run.
    refs = [[["a", "dog", "runs"]]]
    hyps = [["a", "hound", "runs"]]
    val = T.meteor_avg(refs, hyps)
    from nltk.translate.meteor_score import meteor_score

    expect = meteor_score(refs[0], hyps[0], wordnet=T._EmptyWordnet())
    assert val == pytest.approx(expect, abs=1e-9)
    err = capsys.readouterr().err
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")
        has_wordnet = True
    except LookupError:
        has_wordnet = False
    if not has_wordnet:
        assert "WITHOUT the synonym stage" in err


def test_meteor_synonym_stage_with_fake_wordnet():
    """With a working wordnet, synonyms score higher than the
    wordnet-less fallback — pins that our delegation passes the corpus
    through to nltk (parity harness for envs that have the data)."""
    from nltk.translate.meteor_score import meteor_score

    class FakeLemma:
        def __init__(self, n):
            self._n = n

        def name(self):
            return self._n

    class FakeSyn:
        def __init__(self, names):
            self._l = [FakeLemma(n) for n in names]

        def lemmas(self):
            return self._l

    class FakeWordnet:
        def synsets(self, word):
            if word in ("dog", "hound"):
                return [FakeSyn(["dog", "hound"])]
            return []

    refs = [["a", "dog", "runs"]]
    hyp = ["a", "hound", "runs"]
    with_syn = meteor_score(refs, hyp, wordnet=FakeWordnet())
    import ppvision_tpu.metrics.text as T

    without = meteor_score(refs, hyp, wordnet=T._EmptyWordnet())
    assert with_syn > without
