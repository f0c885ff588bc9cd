import numpy as np
import pytest

from fancyrec_tpu.eval.metrics import (
    RankingMetrics, composite_score, ranking_metrics_jax, ranking_metrics_oracle)


def _rand_case(seed, brand_num=6, n_posts=80):
    rng = np.random.RandomState(seed)
    scores = rng.randn(brand_num, n_posts).astype(np.float32)
    brands = rng.randint(0, brand_num, size=n_posts).astype(np.int32)
    return scores, brands


def test_oracle_hand_computed_tiny():
    # 2 brands, 4 posts. brand 0 scores: [.9,.8,.2,.1], labels [0,1,0,1]
    scores = np.array([[0.9, 0.8, 0.2, 0.1],
                       [0.1, 0.9, 0.8, 0.2]], dtype=np.float32)
    brands = np.array([0, 1, 0, 1], dtype=np.int32)
    m = ranking_metrics_oracle(scores, brands, 2)
    # brand 0: sorted order [p0(0), p1(1), p2(0), p3(1)]; pos={.9,.2} neg={.8,.1}
    # auc pairs: .9>{.8,.1}=2, .2>{.1}=1 -> 3/4
    # brand 1: sorted [p1(1),p2(0),p3(1),p0(0)]; pos={.9,.2},neg={.8,.1}: same 3/4
    assert m.auc == pytest.approx(0.75)
    # first positive at rank 0 for both brands
    assert m.r1 == 100.0 and m.medr == 0 and m.meanr == 0
    # ndcg@10 brand0: rel=[1,0,1,0] dcg=1+1/log2(3); idcg=1+1 -> (1+0.6309)/2
    expected_ndcg = (1 + 1 / np.log2(3)) / 2
    assert m.ndcg10 == pytest.approx(expected_ndcg)
    assert m.ndcg50 == pytest.approx(expected_ndcg)


def test_oracle_strict_tie_handling():
    # tied pos/neg scores earn zero AUC credit
    scores = np.array([[0.5, 0.5]], dtype=np.float32)
    brands = np.array([0, 1], dtype=np.int32)
    m = ranking_metrics_oracle(scores, brands, 1)
    assert m.auc == 0.0


def test_oracle_skips_empty_brands():
    scores = np.array([[0.9, 0.5, 0.1], [0.2, 0.4, 0.8], [0.3, 0.1, 0.2]],
                      dtype=np.float32)
    brands = np.array([0, 1, 0], dtype=np.int32)  # no posts with a brand >= 2
    m = ranking_metrics_oracle(scores, brands, 3)
    # brand 2 has no positives: skipped from queries but rank stays 0, which
    # the reference counts as an R@K hit (evaluator.py:105,127-131);
    # brand 0 first pos at rank 0, brand 1 first pos at rank 1
    assert m.r1 == pytest.approx(100.0 * 2 / 3)
    # brand 0: pos {.9,.1} vs neg {.5} -> 1/2; brand 1: pos {.4} vs {.2,.8} -> 1/2
    assert m.auc == pytest.approx(0.5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_matches_oracle_random(seed):
    scores, brands = _rand_case(seed)
    ref = ranking_metrics_oracle(scores, brands, 6)
    got = ranking_metrics_jax(scores, brands, 6)
    got = RankingMetrics(*[float(x) for x in got])
    for name in RankingMetrics._fields:
        assert getattr(got, name) == pytest.approx(getattr(ref, name), abs=1e-5), name


def test_jax_matches_oracle_with_empty_brand():
    rng = np.random.RandomState(7)
    scores = rng.randn(5, 40).astype(np.float32)
    brands = rng.randint(0, 4, size=40).astype(np.int32)  # brand 4 empty
    ref = ranking_metrics_oracle(scores, brands, 5)
    got = ranking_metrics_jax(scores, brands, 5)
    for name in RankingMetrics._fields:
        assert float(getattr(got, name)) == pytest.approx(getattr(ref, name), abs=1e-5), name


def test_jax_matches_oracle_many_brands():
    rng = np.random.RandomState(11)
    scores = rng.randn(51, 400).astype(np.float32)
    brands = rng.randint(0, 51, size=400).astype(np.int32)
    ref = ranking_metrics_oracle(scores, brands, 51)
    got = ranking_metrics_jax(scores, brands, 51)
    for name in RankingMetrics._fields:
        assert float(getattr(got, name)) == pytest.approx(getattr(ref, name), abs=1e-5), name


def test_composite_score():
    m = RankingMetrics(0, 0, 0.5, 0.5, 0.5, 10, 20, 30)
    assert composite_score(m) == pytest.approx(150 + 60)


@pytest.mark.parametrize("seed", [0, 1])
def test_jax_pad_labels_do_not_change_metrics(seed):
    """Posts with brand label -1 are distributed-eval padding: the kernel
    must score them -inf and exclude them from pos/neg counts, so a padded
    matrix reproduces the unpadded oracle exactly."""
    scores, brands = _rand_case(seed)
    ref = ranking_metrics_oracle(scores, brands, 6)

    rng = np.random.RandomState(seed + 100)
    pad = 5
    scores_p = np.concatenate(
        [scores, rng.randn(scores.shape[0], pad).astype(np.float32)], axis=1)
    brands_p = np.concatenate([brands, np.full(pad, -1, brands.dtype)])
    got = ranking_metrics_jax(scores_p, brands_p, 6)
    got = RankingMetrics(*[float(x) for x in got])
    for name in RankingMetrics._fields:
        assert getattr(got, name) == pytest.approx(
            getattr(ref, name), abs=1e-5), name


def test_auc_no_int32_overflow_at_scale():
    """The pair-count AUC form overflows int32 once p_cnt*n_cnt passes
    2^31 (~70k pos x 70k neg); the kernel must agree with the int64
    numpy oracle at that scale (regression: it returned -3.05)."""
    import jax
    rng = np.random.RandomState(0)
    n = 140_000
    scores = rng.randn(2, n).astype(np.float32)
    brands = rng.randint(0, 2, n).astype(np.int32)
    k = jax.jit(lambda s, b: ranking_metrics_jax(s, b, 2))(scores, brands)
    o = ranking_metrics_oracle(scores, brands, 2)
    assert abs(float(k.auc) - o.auc) < 1e-5
