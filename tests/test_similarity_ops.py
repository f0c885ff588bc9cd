"""Fused similarity + streaming/distributed top-k vs plain XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fancyrec_tpu.eval.metrics import cosine_sim_matrix
from fancyrec_tpu.ops.similarity import (
    cosine_scores_pallas, distributed_retrieval_topk, quantize_rows_int8,
    quantize_rows_int8_np, retrieval_topk, retrieval_topk_fused_int8)


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


def _np_int8_scores(brands, posts):
    """Numpy oracle for the quantized scoring formula (exact int32 dot)."""
    qb, b_inv = quantize_rows_int8_np(brands)
    qp, p_inv = quantize_rows_int8_np(posts)
    raw = qb.astype(np.int32) @ qp.astype(np.int32).T
    return raw.astype(np.float32) * b_inv[:, None] * p_inv[None, :]


def test_int8_quantization_device_matches_host():
    """jnp and numpy quantizers must agree bit-for-bit (the index is
    quantized on the host before device_put)."""
    _, posts = _case(5, n=300)
    posts[17] = 0.0   # all-zero row: inv scale 0, never NaN
    qj, ij = quantize_rows_int8(jnp.asarray(posts))
    qn, inn = quantize_rows_int8_np(posts)
    np.testing.assert_array_equal(np.asarray(qj), qn)
    np.testing.assert_allclose(np.asarray(ij), inn, rtol=1e-6)
    assert qn.dtype == np.int8 and qn[17].max() == 0 and inn[17] == 0


@pytest.mark.parametrize("strategy", ["matrix", "scan"])
def test_int8_topk_matches_numpy_oracle(strategy):
    """int8 top-k values equal the exact integer-arithmetic oracle; the
    cosine error vs f32 stays within the rounding bound; n_valid masks."""
    brands, posts = _case(6, n=1000)
    qp, p_inv = quantize_rows_int8_np(posts)
    want = _np_int8_scores(brands, posts)
    f32 = np.asarray(cosine_sim_matrix(jnp.asarray(brands),
                                       jnp.asarray(posts)))
    np.testing.assert_allclose(want, f32, atol=2e-2)  # both-sides rounding
    for n_valid, inv in ((None, jnp.asarray(p_inv)), (700, None)):
        vals, idxs = retrieval_topk(
            jnp.asarray(brands), jnp.asarray(qp), k=10, block=256,
            strategy=strategy, n_valid=n_valid, posts_inv=inv)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        w = want if n_valid is None else want[:, :n_valid]
        for b in range(brands.shape[0]):
            np.testing.assert_allclose(vals[b], np.sort(w[b])[::-1][:10],
                                       atol=1e-5)
        if n_valid is not None:
            assert (idxs < n_valid).all()


def test_int8_topk_recovers_f32_ranking_on_separated_data():
    """With planted winners (clear score gaps), int8 must return exactly
    the f32 top-k sets -- the rounding error only reorders near-ties."""
    rng = np.random.RandomState(7)
    brands = rng.randn(5, 64).astype(np.float32)
    posts = rng.randn(2000, 64).astype(np.float32)
    for b in range(5):          # 10 clear winners per brand
        for j in range(10):
            posts[b * 10 + j] = (brands[b] * (1.0 + 0.1 * j)
                                 + 0.02 * rng.randn(64))
    fv, fi = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts), k=10)
    qp, p_inv = quantize_rows_int8_np(posts)
    qv, qi = retrieval_topk(jnp.asarray(brands), jnp.asarray(qp), k=10,
                            posts_inv=jnp.asarray(p_inv))
    for b in range(5):
        assert set(np.asarray(qi)[b]) == set(np.asarray(fi)[b])
    np.testing.assert_allclose(np.asarray(qv), np.asarray(fv), atol=2e-2)


@pytest.mark.slow
def test_int8_distributed_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    brands, posts = _case(8, n=4096)
    qp, p_inv = quantize_rows_int8_np(posts)
    vs, is_ = retrieval_topk(jnp.asarray(brands), jnp.asarray(qp), k=8,
                             block=512, posts_inv=jnp.asarray(p_inv))
    mesh = build_mesh("8,1")
    with mesh:
        qp_sh = jax.device_put(qp, NamedSharding(mesh, P("data", None)))
        inv_sh = jax.device_put(p_inv, NamedSharding(mesh, P("data")))
        # with the precomputed sidecar, and with per-shard on-the-fly norms
        for inv in (inv_sh, None):
            vd, id_ = distributed_retrieval_topk(
                jnp.asarray(brands), qp_sh, k=8, mesh=mesh, block=256,
                posts_inv=inv)
            np.testing.assert_allclose(np.asarray(vd), np.asarray(vs),
                                       atol=1e-5)
            np.testing.assert_array_equal(np.asarray(id_), np.asarray(is_))


@pytest.mark.parametrize("n,block,n_valid", [
    (1024, 128, None),      # exact block multiple
    (1000, 128, None),      # pads the post axis
    (1024, 128, 700),       # pre-padded index with a true row count
])
def test_fused_int8_topk_matches_matrix(n, block, n_valid):
    """The fused Pallas score+top-k kernel (interpret mode on CPU) must
    return the matrix strategy's exact indices -- scoring is
    integer-exact in both (see ops/similarity.py module comment) -- and
    values up to f32 multiply-order of the brand scale."""
    brands, posts = _case(9, b=6, n=n, d=128)
    qp, p_inv = quantize_rows_int8_np(posts)
    nv = n_valid if n_valid is not None else n
    vm, im = retrieval_topk(jnp.asarray(brands), jnp.asarray(qp[:nv]), 10,
                            strategy="matrix",
                            posts_inv=jnp.asarray(p_inv[:nv]))
    vf, if_ = retrieval_topk_fused_int8(
        jnp.asarray(brands), jnp.asarray(qp), jnp.asarray(p_inv), 10,
        block=block, n_valid=n_valid)
    np.testing.assert_array_equal(np.asarray(if_), np.asarray(im))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vm), rtol=1e-6)


def test_fused_int8_topk_wide_brand_axis():
    """B > 32 exercises the int8 sublane padding of the brand block (the
    serving shape is 51 brands -> padded to 64)."""
    brands, posts = _case(10, b=51, n=512, d=128)
    qp, p_inv = quantize_rows_int8_np(posts)
    vm, im = retrieval_topk(jnp.asarray(brands), jnp.asarray(qp), 5,
                            strategy="matrix", posts_inv=jnp.asarray(p_inv))
    vf, if_ = retrieval_topk_fused_int8(
        jnp.asarray(brands), jnp.asarray(qp), jnp.asarray(p_inv), 5,
        block=256)
    np.testing.assert_array_equal(np.asarray(if_), np.asarray(im))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vm), rtol=1e-6)


def test_fused_int8_topk_edges():
    """k > n_valid filler rows match the matrix path (-inf vals, idx 0);
    all-zero rows (index append) score 0 and never outrank real posts."""
    brands, posts = _case(11, b=4, n=256, d=128)
    posts[3] = 0.0
    qp, p_inv = quantize_rows_int8_np(posts)
    v, i = retrieval_topk_fused_int8(
        jnp.asarray(brands), jnp.asarray(qp), jnp.asarray(p_inv), 8,
        block=128, n_valid=5)
    v, i = np.asarray(v), np.asarray(i)
    assert np.isneginf(v[:, 5:]).all() and (i[:, 5:] == 0).all()
    assert np.isfinite(v[:, :5]).all()
    assert (v[:, :5][i[:, :5] == 3] == 0).all()   # zero row scores exactly 0
    vm, im = retrieval_topk(jnp.asarray(brands), jnp.asarray(qp[:5]), 8,
                            strategy="matrix", posts_inv=jnp.asarray(p_inv[:5]))
    np.testing.assert_array_equal(i, np.asarray(im))
    with pytest.raises(ValueError):
        retrieval_topk_fused_int8(jnp.asarray(brands), jnp.asarray(qp),
                                  jnp.asarray(p_inv), k=129)


def test_fused_int8_topk_dynamic_n_valid():
    """n_valid as a traced scalar (the shard_map case: each shard's
    valid-row count derives from axis_index) rides to the kernel in SMEM
    and must match the static-n_valid kernel exactly."""
    brands, posts = _case(12, b=6, n=1024, d=128)
    qp, p_inv = quantize_rows_int8_np(posts)
    vs, is_ = retrieval_topk_fused_int8(
        jnp.asarray(brands), jnp.asarray(qp), jnp.asarray(p_inv), 10,
        block=128, n_valid=700)
    fn = jax.jit(lambda b, q, i, nv: retrieval_topk_fused_int8(
        b, q, i, 10, block=128, n_valid=nv))
    vd, id_ = fn(jnp.asarray(brands), jnp.asarray(qp),
                 jnp.asarray(p_inv), jnp.int32(700))
    np.testing.assert_array_equal(np.asarray(id_), np.asarray(is_))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vs), rtol=1e-6)


def test_fused_distributed_matches_single_device():
    """distributed_retrieval_topk(fused=True): the fused kernel runs per
    shard under shard_map with the shard's valid count as a dynamic SMEM
    scalar; the merged result must equal the single-device fused kernel
    (the 512-row pad tail lands entirely in the last shard)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fancyrec_tpu.parallel.mesh import build_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    brands, posts = _case(13, b=6, n=4096, d=128)
    n_valid = 3584                       # last shard (rows 3584:4096) all pad
    qp, p_inv = quantize_rows_int8_np(posts)
    vs, is_ = retrieval_topk_fused_int8(
        jnp.asarray(brands), jnp.asarray(qp), jnp.asarray(p_inv), 8,
        block=128, n_valid=n_valid)
    mesh = build_mesh("8,1")
    with mesh:
        qp_sh = jax.device_put(qp, NamedSharding(mesh, P("data", None)))
        inv_sh = jax.device_put(p_inv, NamedSharding(mesh, P("data")))
        vd, id_ = distributed_retrieval_topk(
            jnp.asarray(brands), qp_sh, k=8, mesh=mesh, block=128,
            n_valid=n_valid, posts_inv=inv_sh, fused=True)
    np.testing.assert_array_equal(np.asarray(id_), np.asarray(is_))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vs), rtol=1e-6)

    with pytest.raises(ValueError, match="int8"):
        distributed_retrieval_topk(jnp.asarray(brands),
                                   jnp.asarray(posts), k=8, mesh=mesh,
                                   block=128, fused=True)
    with pytest.raises(ValueError, match="shard_size"):
        distributed_retrieval_topk(jnp.asarray(brands), qp_sh, k=8,
                                   mesh=mesh, block=384, posts_inv=inv_sh,
                                   fused=True)


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


def test_topk_zero_rows_never_rank():
    """All-zero post rows (possible via index append) must score 0, not
    NaN-poison top_k -- both strategies, and bf16 scan scoring must use
    the same exact-f32 column norms as the matrix path."""
    brands, posts = _case(4, n=64)
    posts = np.asarray(posts).copy()
    posts[7] = 0.0
    posts[33] = 0.0
    ref_v, ref_i = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                                  k=5, strategy="matrix")
    assert np.isfinite(np.asarray(ref_v)).all()
    assert not {7, 33} & set(np.asarray(ref_i)[:, 0].tolist())
    for strategy, dt in (("scan", jnp.float32), ("scan", jnp.bfloat16),
                         ("matrix", jnp.bfloat16)):
        v, i = retrieval_topk(jnp.asarray(brands), jnp.asarray(posts),
                              k=5, block=16, strategy=strategy,
                              score_dtype=dt)
        assert np.isfinite(np.asarray(v)).all(), (strategy, dt)
        tol = 1e-5 if dt == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   atol=tol)
