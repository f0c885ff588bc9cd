"""Fused similarity + streaming/distributed top-k vs plain XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fancyrec_tpu.eval.metrics import cosine_sim_matrix
from fancyrec_tpu.ops.similarity import (
    cosine_scores_pallas, distributed_retrieval_topk, retrieval_topk)


def _case(seed, b=6, n=1000, d=64):
    rng = np.random.RandomState(seed)
    return (rng.randn(b, d).astype(np.float32),
            rng.randn(n, d).astype(np.float32))


@pytest.mark.parametrize("n", [1000, 4096, 777])
def test_pallas_cosine_matches_xla(n):
    brands, posts = _case(0, n=n)
    want = np.asarray(cosine_sim_matrix(jnp.asarray(brands),
                                        jnp.asarray(posts)))
    got = np.asarray(cosine_scores_pallas(jnp.asarray(brands),
                                          jnp.asarray(posts), block=256))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_streaming_topk_matches_full_sort():
    brands, posts = _case(1, n=5000)
    scores = np.asarray(cosine_sim_matrix(jnp.asarray(brands),
                                          jnp.asarray(posts)))
    vals, idxs = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                k=10, block=512)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for b in range(brands.shape[0]):
        want_idx = np.argsort(-scores[b])[:10]
        np.testing.assert_allclose(vals[b], scores[b][want_idx], atol=2e-5)
        # indices may differ on exact ties; compare scores instead
        np.testing.assert_allclose(scores[b][idxs[b]], scores[b][want_idx],
                                   atol=2e-5)


def test_distributed_topk_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    brands, posts = _case(2, n=4096)
    vals_s, idxs_s = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                    k=8, block=512)
    mesh = build_mesh("8,1")
    with mesh:
        posts_sh = jax.device_put(posts, NamedSharding(mesh, P("data", None)))
        vals_d, idxs_d = distributed_retrieval_topk(
            jnp.asarray(brands), posts_sh, k=8, mesh=mesh, block=256)
    np.testing.assert_allclose(np.asarray(vals_d), np.asarray(vals_s),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(idxs_d), np.asarray(idxs_s))


def test_matrix_strategy_matches_scan():
    """Both top-k strategies (one-matmul matrix path vs streaming scan)
    must return identical results, including n_valid pad masking."""
    brands, posts = _case(3, n=3000)
    for n_valid in (None, 2500):
        vm, im = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                k=7, strategy="matrix", n_valid=n_valid)
        vs, isc = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                 k=7, block=512, strategy="scan",
                                 n_valid=n_valid)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(vs), atol=2e-5)
        scores = np.asarray(cosine_sim_matrix(jnp.asarray(brands),
                                              jnp.asarray(posts)))
        for b in range(brands.shape[0]):
            np.testing.assert_allclose(scores[b][np.asarray(im)[b]],
                                       scores[b][np.asarray(isc)[b]],
                                       atol=2e-5)
        if n_valid is not None:
            assert (np.asarray(im) < n_valid).all()


def test_topk_k_exceeds_post_count():
    """k > N must return -inf/0 filler rows (like the scan carry), not
    crash -- 'auto' picks the matrix path exactly for small indexes."""
    brands, posts = _case(4, n=5)
    for strategy in ("matrix", "scan", "auto"):
        vals, idxs = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                    k=10, block=4, strategy=strategy)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        assert vals.shape == (brands.shape[0], 10)
        assert np.isneginf(vals[:, 5:]).all(), strategy
        assert (np.diff(vals[:, :5], axis=1) <= 1e-6).all()
