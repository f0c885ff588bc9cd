"""Retrieval metric kernels: AUC, NDCG@10/50, MedR, MeanR, R@1/5/10.

Two implementations with identical semantics:

  * ranking_metrics_oracle -- plain numpy, a faithful port of the reference
    evaluator loop (reference evaluator.py:85-143, util/ndcg.py) used as the
    golden oracle in tests and for small CPU-side evaluation.

  * ranking_metrics_jax -- a single batched XLA computation: per-brand sort +
    searchsorted order statistics instead of the reference's per-brand Python
    loop over (score, brand) tuples. Runs the whole brands x posts metric
    block on-device; posts axis is shardable for the scaled (1M-post) config.

Cost at index scale: exact AUC needs full per-brand order statistics, so
the kernel is bound by one batched (brands, posts) co-sort -- 26 ms at
51 x 4k, ~1.2 s at 51 x 1M on v5e-1 (the XLA sort floor; AUC pair counts
do not decompose across shards without global ranks). That is the
offline-eval path only; serving-scale retrieval uses the top-k kernels in
ops/similarity (16 ms at 1M), which never rank the full index.

Semantics notes (kept bit-faithful):
  - AUC uses *strict* comparisons: tied pos/neg scores earn zero credit.
  - Brands with no positive posts are skipped for MedR/MeanR/AUC/NDCG but
    their entry in `ranks` stays 0, which the reference counts as a R@K hit
    (evaluator.py:105,127-131). Replicated as-is.
  - NDCG discount is "method 0": weights [1, 1, 1/log2(3), 1/log2(4), ...].
  - Sorting is descending and stable (Python sorted semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RankingMetrics(NamedTuple):
    medr: float
    meanr: float
    auc: float
    ndcg10: float
    ndcg50: float
    r1: float
    r5: float
    r10: float


def composite_score(m: RankingMetrics) -> float:
    """Reference model-selection score (trainer.py:412-413)."""
    return (m.auc + m.ndcg10 + m.ndcg50) * 100.0 + m.r1 + m.r5 + m.r10


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def l2norm_np(x: np.ndarray) -> np.ndarray:
    return x / np.sqrt((x ** 2).sum(axis=1, keepdims=True))


def cosine_sim_matrix(brand_embs: jnp.ndarray, post_embs: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize rows of both and matmul -> (brands, posts) similarity."""
    b = brand_embs / jnp.linalg.norm(brand_embs, axis=1, keepdims=True)
    p = post_embs / jnp.linalg.norm(post_embs, axis=1, keepdims=True)
    return jnp.dot(b, p.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# numpy oracle (reference-faithful)
# ---------------------------------------------------------------------------

def _dcg_at_k(r: np.ndarray, k: int) -> float:
    r = np.asarray(r, dtype=np.float64)[:k]
    if r.size:
        return r[0] + np.sum(r[1:] / np.log2(np.arange(2, r.size + 1)))
    return 0.0


def _ndcg_at_k(r, k: int) -> float:
    dcg_max = _dcg_at_k(np.sort(r)[::-1], k)
    if not dcg_max:
        return 0.0
    return _dcg_at_k(np.asarray(r), k) / dcg_max


def ranking_metrics_oracle(scores: np.ndarray, brands: np.ndarray,
                           brand_num: int) -> RankingMetrics:
    """Numpy port of reference evaluator.test_post_ranking (evaluator.py:103-143).

    scores: (brand_num, n_posts) similarity matrix.
    brands: (n_posts,) integer brand label of each post.
    """
    scores = np.asarray(scores)
    brands = np.asarray(brands)
    queries = []
    ranks = np.zeros(scores.shape[0])

    for b in range(scores.shape[0]):
        s = scores[b]
        # kind="stable" matches the reference's Python sorted() in its
        # AUC/NDCG loop (evaluator.py:110). Its R@K path separately uses an
        # UNSTABLE np.argsort (evaluator.py:124), so on exact score ties the
        # reference can disagree with itself; we are stable-consistent
        # everywhere (ties are measure-zero on float scores).
        order = np.argsort(-s, kind="stable")
        sorted_brands = brands[order]
        sorted_scores = s[order]
        pos = sorted_scores[sorted_brands == b]
        neg = sorted_scores[sorted_brands != b]
        if len(pos) == 0:
            continue
        auc_num = np.sum([np.sum(neg < e) for e in pos])
        rel = (sorted_brands == b).astype(np.float64)
        rank_of_first_pos = int(np.argmax(rel))
        queries.append((
            rank_of_first_pos,
            float(auc_num) / (len(pos) * len(neg)),
            _ndcg_at_k(rel, 10),
            _ndcg_at_k(rel, 50),
        ))
        ranks[b] = rank_of_first_pos

    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    cols = list(zip(*queries))
    return RankingMetrics(
        medr=float(np.floor(np.median(cols[0]))),
        meanr=float(np.floor(np.mean(cols[0]))),
        auc=float(np.average(cols[1])),
        ndcg10=float(np.average(cols[2])),
        ndcg50=float(np.average(cols[3])),
        r1=r1, r5=r5, r10=r10,
    )


# ---------------------------------------------------------------------------
# JAX batched kernel
# ---------------------------------------------------------------------------

_NDCG_KMAX = 50


def _dcg_weights(k: int) -> np.ndarray:
    w = np.ones(k, dtype=np.float64)
    if k > 1:
        w[1:] = 1.0 / np.log2(np.arange(2, k + 1))
    return w


def _per_brand_stats(s: jnp.ndarray, brands: jnp.ndarray, b: jnp.ndarray,
                     w10: jnp.ndarray, w50: jnp.ndarray):
    """Metrics for one brand row. s: (N,) scores; brands: (N,) labels.

    Only one O(N log N) sort (the AUC order statistics); NDCG uses
    lax.top_k(50) and the first-positive rank is computed by counting,
    both tie-consistent with a stable descending sort (lower original
    index wins ties, matching the oracle's Python sorted())."""
    n = s.shape[0]
    # posts with label < 0 are padding (distributed eval pads the post axis
    # to the shard count): scored -inf and excluded from both pos and neg
    pad_mask = brands < 0
    s = jnp.where(pad_mask, -jnp.inf, s)
    pos_mask = brands == b
    p_cnt = jnp.sum(pos_mask)
    n_cnt = n - p_cnt - jnp.sum(pad_mask)

    # --- AUC via one co-sort + prefix counts (strict "neg < pos") ---
    # searchsorted lowers to per-query binary-search gathers (slow on TPU);
    # instead co-sort (score, is_neg) ascending and count negatives before
    # each tie group with O(N) scans.
    isneg = (~pos_mask & ~pad_mask).astype(jnp.int32)
    vals, isneg_s = jax.lax.sort((s, isneg), dimension=0, num_keys=1)
    neg_prefix = jnp.cumsum(isneg_s) - isneg_s       # negs strictly before i
    idx = jnp.arange(n)
    changed = jnp.concatenate([jnp.ones(1, bool), vals[1:] != vals[:-1]])
    first_occ = jax.lax.cummax(jnp.where(changed, idx, 0))
    cnt_neg_below = neg_prefix[first_occ]            # negs with score < vals[i]
    # per-positive ratio, summed in f32: the pair-count form overflows
    # int32 at index scale (p_cnt*n_cnt ~ 1.9e10 at 1M posts; the int32
    # sum of counts likewise). Counts are <= N < 2^24 so each ratio is
    # exact in f32; the tree-reduced mean is accurate to ~1e-6.
    ratio = cnt_neg_below.astype(jnp.float32) / jnp.maximum(
        n_cnt, 1).astype(jnp.float32)
    auc = (jnp.sum(jnp.where(isneg_s == 0, ratio, 0.0))
           / jnp.maximum(p_cnt, 1).astype(jnp.float32))

    # --- NDCG@10/50 from the top-k only (lax.top_k breaks ties by lower
    # index, same as the stable descending order) ---
    k = min(_NDCG_KMAX, n)
    _, top_idx = jax.lax.top_k(s, k)
    rel50 = (brands[top_idx] == b).astype(jnp.float32)
    dcg10 = jnp.sum(rel50[:10] * w10[: rel50[:10].shape[0]])
    dcg50 = jnp.sum(rel50 * w50[: rel50.shape[0]])

    # ideal DCG: prefix-sum of weights up to min(P, k)
    c10 = jnp.cumsum(w10)
    c50 = jnp.cumsum(w50)
    idcg10 = jnp.where(p_cnt > 0, c10[jnp.clip(p_cnt, 1, 10) - 1], 0.0)
    idcg50 = jnp.where(p_cnt > 0, c50[jnp.clip(p_cnt, 1, _NDCG_KMAX) - 1], 0.0)
    ndcg10 = jnp.where(idcg10 > 0, dcg10 / jnp.maximum(idcg10, 1e-30), 0.0)
    ndcg50 = jnp.where(idcg50 > 0, dcg50 / jnp.maximum(idcg50, 1e-30), 0.0)

    # --- first-positive rank by counting (no argsort): entries strictly
    # above the best positive score, plus equal-score entries whose
    # original index precedes the first best positive ---
    masked = jnp.where(pos_mask, s, -jnp.inf)
    p_star = jnp.max(masked)
    idx_star = jnp.argmax(masked)
    ahead = jnp.sum(s > p_star) + jnp.sum(
        (s == p_star) & (jnp.arange(n) < idx_star))
    rank_first = ahead  # 0 when no positives exist; gated by `valid`
    valid = p_cnt > 0
    return valid, rank_first, auc, ndcg10, ndcg50


def _masked_median_floor(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """floor(median over valid entries), numpy midpoint interpolation."""
    big = jnp.float32(1e18)
    v = jnp.where(valid, vals.astype(jnp.float32), big)
    v = jnp.sort(v)
    cnt = jnp.sum(valid)
    lo = v[jnp.maximum((cnt - 1) // 2, 0)]
    hi = v[jnp.maximum(cnt // 2, 0)]
    return jnp.floor((lo + hi) / 2.0)


def ranking_metrics_jax(scores: jnp.ndarray, brands: jnp.ndarray,
                        brand_num: int) -> RankingMetrics:
    """Batched on-device equivalent of ranking_metrics_oracle.

    Call under jit (it is pure); returns a RankingMetrics of 0-d arrays.
    """
    scores = jnp.asarray(scores, dtype=jnp.float32)
    brands = jnp.asarray(brands, dtype=jnp.int32)
    w10 = jnp.asarray(_dcg_weights(10))
    w50 = jnp.asarray(_dcg_weights(_NDCG_KMAX))
    brand_ids = jnp.arange(brand_num, dtype=jnp.int32)

    valid, rank_first, auc, ndcg10, ndcg50 = jax.vmap(
        _per_brand_stats, in_axes=(0, None, 0, None, None)
    )(scores[:brand_num], brands, brand_ids, w10, w50)

    vcnt = jnp.maximum(jnp.sum(valid), 1)
    ranks = jnp.where(valid, rank_first, 0)  # invalid brands keep rank 0 (ref quirk)
    r1 = 100.0 * jnp.sum(ranks < 1) / brand_num
    r5 = 100.0 * jnp.sum(ranks < 5) / brand_num
    r10 = 100.0 * jnp.sum(ranks < 10) / brand_num

    medr = _masked_median_floor(rank_first, valid)
    meanr = jnp.floor(jnp.sum(jnp.where(valid, rank_first, 0)) / vcnt)
    mean = lambda x: jnp.sum(jnp.where(valid, x, 0.0)) / vcnt
    return RankingMetrics(
        medr=medr, meanr=meanr,
        auc=mean(auc), ndcg10=mean(ndcg10), ndcg50=mean(ndcg50),
        r1=r1, r5=r5, r10=r10,
    )
