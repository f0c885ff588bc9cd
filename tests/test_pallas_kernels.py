"""Pallas kernel parity: the fused GRU recurrence and brand-aspect
dropout+mean against their pure-XLA references.

The GRU kernel runs in interpreter mode on the CPU test platform. The
brand dropout kernel draws from the TPU hardware PRNG, which has no
interpreter-mode lowering -- its randomized paths are TPU-only (gated
skips here; exercised on hardware via tools/ probes and bench.py), but
the deterministic fold and the XLA fallback train path are covered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fancyrec_tpu.models.brand import BrandAspects
from fancyrec_tpu.models.gru import BiGRU
from fancyrec_tpu.ops.gru_scan import gru_scan_pallas

ON_TPU = jax.default_backend() == "tpu"


def _scan_reference(xw, w_hh, b_hh):
    """The lax.scan recurrence (models/gru._bigru_scan inner math)."""
    w_hr, w_hz, w_hn = jnp.split(w_hh, 3, axis=1)
    b_hr, b_hz, b_hn = [b[:, None, :] for b in jnp.split(b_hh, 3, axis=1)]
    h0 = jnp.zeros((2, xw.shape[2], w_hh.shape[2]), xw.dtype)

    def step(h, xw_t):
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        r = jax.nn.sigmoid(xr + jnp.einsum("dbh,dgh->dbg", h, w_hr) + b_hr)
        z = jax.nn.sigmoid(xz + jnp.einsum("dbh,dgh->dbg", h, w_hz) + b_hz)
        n = jnp.tanh(xn + r * (jnp.einsum("dbh,dgh->dbg", h, w_hn) + b_hn))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, out = jax.lax.scan(step, h0, xw)
    return out


def _gru_inputs(t=6, b=3, h=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    xw = jax.random.normal(ks[0], (t, 2, b, 3 * h), jnp.float32)
    w_hh = jax.random.normal(ks[1], (2, 3 * h, h), jnp.float32) * 0.3
    b_hh = jax.random.normal(ks[2], (2, 3 * h), jnp.float32) * 0.1
    return xw, w_hh, b_hh


def test_gru_kernel_forward_matches_scan():
    xw, w_hh, b_hh = _gru_inputs()
    want = _scan_reference(xw, w_hh, b_hh)
    got = gru_scan_pallas(xw, w_hh, b_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_gru_kernel_grads_match_scan():
    xw, w_hh, b_hh = _gru_inputs()
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (6, 2, 3, 8), jnp.float32)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_scan_reference(*a) * cot),
        argnums=(0, 1, 2))(xw, w_hh, b_hh)
    g_ker = jax.grad(
        lambda *a: jnp.sum(gru_scan_pallas(*a) * cot),
        argnums=(0, 1, 2))(xw, w_hh, b_hh)
    for ref, ker in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=1e-5)


def test_gru_kernel_odd_batch_and_length():
    # batch below the sublane multiple and a non-multiple T
    xw, w_hh, b_hh = _gru_inputs(t=5, b=2, h=8, seed=3)
    want = _scan_reference(xw, w_hh, b_hh)
    got = gru_scan_pallas(xw, w_hh, b_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.skipif(ON_TPU, reason="tiny non-128 widths would compile the "
                    "real Mosaic kernel; hardware parity is covered by "
                    "test_gru_kernel_on_device_matches_scan_f32")
def test_bigru_module_pallas_path_matches_scan_path():
    b, t, d, h = 3, 7, 10, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d), jnp.float32)
    lengths = jnp.asarray([7, 4, 1])
    for packed in (False, True):
        m_scan = BiGRU(hidden=h, packed=packed, use_pallas=False)
        m_pall = BiGRU(hidden=h, packed=packed, use_pallas=True)
        params = m_scan.init(jax.random.PRNGKey(1), x,
                             lengths if packed else None)
        kw = {"lengths": lengths} if packed else {}
        a = m_scan.apply(params, x, **kw)
        c = m_pall.apply(params, x, **kw)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)


# ---------------------------------------------------------------------------
# brand tower: fused dropout+mean


def _brand_setup(brand_num=5, aspects=16, common=12):
    m = BrandAspects(brand_num=brand_num, num_aspects=aspects,
                     common_dim=common)
    ids = jnp.asarray([0, 3, 4])
    params = m.init({"params": jax.random.PRNGKey(0)}, ids)
    return m, ids, params


def test_brand_mean_fold_matches_legacy_product_mean():
    m, ids, params = _brand_setup()
    legacy = jnp.mean(m.apply(params, ids, deterministic=True), axis=1)
    fold = m.apply(params, ids, deterministic=True, mean=True)
    # on TPU the fold's matmul runs the MXU's multi-pass bf16 f32
    # emulation while the legacy product+mean is pure VPU f32
    np.testing.assert_allclose(np.asarray(fold), np.asarray(legacy),
                               atol=1e-3 if ON_TPU else 1e-6)


def test_brand_train_mean_xla_fallback_unbiased_and_seeded():
    m, ids, params = _brand_setup()
    det = m.apply(params, ids, deterministic=True, mean=True)
    outs = [
        m.apply(params, ids, deterministic=False, mean=True,
                rngs={"dropout": jax.random.PRNGKey(s)})
        for s in range(200)
    ]
    avg = jnp.mean(jnp.stack(outs), axis=0)
    # dropout is inverted (unbiased): the seed-average approaches the
    # deterministic mean
    np.testing.assert_allclose(np.asarray(avg), np.asarray(det),
                               atol=0.15)
    same = m.apply(params, ids, deterministic=False, mean=True,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(same), np.asarray(outs[0]))


def test_brand_train_mean_grads_flow_to_both_params():
    m, ids, params = _brand_setup()

    def loss(p):
        out = m.apply(p, ids, deterministic=False, mean=True,
                      rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(out * out)

    g = jax.grad(loss)(params)["params"]
    assert float(jnp.max(jnp.abs(g["brand_embeddings"]))) > 0
    assert float(jnp.max(jnp.abs(g["aspects_embeddings"]))) > 0


@pytest.mark.skipif(not ON_TPU, reason="compiled-kernel check needs a TPU")
def test_gru_kernel_on_device_matches_scan_f32():
    # on hardware both paths run f32 matmuls through the MXU's multi-pass
    # bf16 decomposition; pass structure differs slightly between the XLA
    # einsum and the in-kernel dot (exactly bit-equal at some shapes, a
    # few ulp apart at others)
    xw, w_hh, b_hh = _gru_inputs(t=16, b=8, h=128, seed=1)
    want = jax.jit(_scan_reference)(xw, w_hh, b_hh)
    got = jax.jit(lambda *a: gru_scan_pallas(*a))(xw, w_hh, b_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG kernel is TPU-only")
def test_aspect_dropout_mean_kernel_keep1_exact():
    from fancyrec_tpu.ops.brand_pallas import aspect_dropout_mean

    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)
    asp = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    seed = jnp.asarray([5, 7], jnp.int32)
    got = aspect_dropout_mean(w, asp, seed, 1.0)
    want = (w @ asp) / 64
    # the XLA reference matmul runs the MXU's multi-pass bf16 f32
    # emulation; the kernel's VPU accumulation is exact f32 -- tolerance
    # covers the REFERENCE's rounding, not the kernel's
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-3)


@pytest.mark.skipif(not ON_TPU, reason="compiled-kernel check needs a TPU")
def test_gru_kernel_backward_on_device_matches_scan_f32():
    """The custom-VJP backward (reverse-time gate recompute) vs the
    lax.scan autodiff backward, both COMPILED on hardware -- the
    interpreter-mode comparison cannot catch Mosaic lowering bugs."""
    xw, w_hh, b_hh = _gru_inputs(t=16, b=8, h=128, seed=1)
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (16, 2, 8, 128), jnp.float32)
    g_ref = jax.jit(jax.grad(
        lambda *a: jnp.sum(_scan_reference(*a) * cot),
        argnums=(0, 1, 2)))(xw, w_hh, b_hh)
    g_ker = jax.jit(jax.grad(
        lambda *a: jnp.sum(gru_scan_pallas(*a) * cot),
        argnums=(0, 1, 2)))(xw, w_hh, b_hh)
    for ref, ker in zip(g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=2e-3 * scale)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG kernel is TPU-only")
def test_aspect_dropout_mean_seed_determinism():
    from fancyrec_tpu.ops.brand_pallas import aspect_dropout_mean

    w = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.float32)
    asp = jax.random.normal(jax.random.PRNGKey(1), (256, 128), jnp.float32)
    f = jax.jit(lambda s: aspect_dropout_mean(w, asp, s, 0.5))
    a = np.asarray(f(jnp.asarray([11, 13], jnp.int32)))
    b = np.asarray(f(jnp.asarray([11, 13], jnp.int32)))
    np.testing.assert_array_equal(a, b)          # same seed: bit-equal
    c = np.asarray(f(jnp.asarray([12, 13], jnp.int32)))
    d = np.asarray(f(jnp.asarray([11, 14], jnp.int32)))
    assert np.abs(a - c).max() > 1e-3            # either word changes the mask
    assert np.abs(a - d).max() > 1e-3


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG kernel is TPU-only")
def test_aspect_dropout_mean_vjp_matches_fd_keep05():
    """Finite-difference pin of the STOCHASTIC backward: the bwd kernel
    replays the hardware PRNG stream instead of storing the mask, so a
    seeding/tile-order bug would silently use a different mask than the
    forward. For the fixed replayed mask the op is linear in each
    argument, so a central difference along a random direction equals the
    VJP inner product up to f32 rounding -- any mask divergence (~50% of
    positions) would blow the comparison up."""
    from fancyrec_tpu.ops.brand_pallas import aspect_dropout_mean

    k = jax.random.PRNGKey(42)
    kw, ka, kg, kdw, kda = jax.random.split(k, 5)
    w = jax.random.normal(kw, (8, 256), jnp.float32)
    asp = jax.random.normal(ka, (256, 128), jnp.float32)
    g = jax.random.normal(kg, (8, 128), jnp.float32)
    seed = jnp.asarray([11, 13], jnp.int32)

    loss = jax.jit(
        lambda w, asp: jnp.sum(aspect_dropout_mean(w, asp, seed, 0.5) * g))
    gw, gasp = jax.jit(jax.grad(
        lambda w, asp: jnp.sum(aspect_dropout_mean(w, asp, seed, 0.5) * g),
        argnums=(0, 1)))(w, asp)

    dw = jax.random.normal(kdw, w.shape, jnp.float32)
    da = jax.random.normal(kda, asp.shape, jnp.float32)
    eps = 0.5
    fd_w = float(loss(w + eps * dw, asp) - loss(w - eps * dw, asp)) / (2 * eps)
    fd_a = float(loss(w, asp + eps * da) - loss(w, asp - eps * da)) / (2 * eps)
    got_w, got_a = float(jnp.vdot(gw, dw)), float(jnp.vdot(gasp, da))
    # scale-aware tolerance: the inner products are O(1e2-1e3) sums of
    # thousands of f32 products
    tol_w = 1e-4 * float(jnp.linalg.norm(gw) * jnp.linalg.norm(dw)) + 1e-3
    tol_a = 1e-4 * float(jnp.linalg.norm(gasp) * jnp.linalg.norm(da)) + 1e-3
    assert abs(got_w - fd_w) < tol_w, (got_w, fd_w, tol_w)
    assert abs(got_a - fd_a) < tol_a, (got_a, fd_a, tol_a)
