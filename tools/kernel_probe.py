"""A/B the training Pallas kernels against their XLA lowerings (real TPU).

Usage: python tools/kernel_probe.py [gru|brand] [batch] [bf16]

Reproduces the numbers recorded in CLAUDE.md / README (200-iter
amortized -- the dev tunnel has a ~0.5-1.5 ms per-call dispatch floor,
so short loops measure dispatch, not the kernel):

  gru   - fused bi-GRU recurrence (ops/gru_scan.py) vs the lax.scan
          path, f32 at the recipe visual shape, fwd and fwd+bwd.
          v5e-1: b8 fwd 0.98 -> 0.61 ms (bit-identical), f+b 1.83 -> 1.33;
          bf16 b64 f+b 2.36 -> 1.61.
  brand - fused aspect dropout+mean (ops/brand_pallas.py) vs the XLA
          bernoulli-on-product path at recipe scale (A=2000, C=1024).
          v5e-1: b64 fwd 3.39 -> 0.71 ms, fwd+bwd 3.37 -> 0.65 (5.2x).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.ops.brand_pallas import aspect_dropout_mean
from fancyrec_tpu.ops.gru_scan import gru_scan_pallas


def timeit(f, *a, iters=200):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2]))
    return round((time.perf_counter() - t0) / iters * 1e3, 3)


def probe_gru(b=8, t=64, h=1024, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    xw = jax.random.normal(key, (t, 2, b, 3 * h), dtype)
    w_hh = jax.random.normal(key, (2, 3 * h, h), dtype) * 0.02
    b_hh = jnp.zeros((2, 3 * h), dtype)

    def xla_scan(xw, w_hh, b_hh):
        w_hr, w_hz, w_hn = jnp.split(w_hh, 3, axis=1)
        b_hr, b_hz, b_hn = [x[:, None, :] for x in jnp.split(b_hh, 3, 1)]
        h0 = jnp.zeros((2, b, h), xw.dtype)

        def step(hc, xw_t):
            xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
            r = jax.nn.sigmoid(
                xr + jnp.einsum("dbh,dgh->dbg", hc, w_hr) + b_hr)
            z = jax.nn.sigmoid(
                xz + jnp.einsum("dbh,dgh->dbg", hc, w_hz) + b_hz)
            n = jnp.tanh(
                xn + r * (jnp.einsum("dbh,dgh->dbg", hc, w_hn) + b_hn))
            h2 = (1.0 - z) * n + z * hc
            return h2, h2

        _, out = jax.lax.scan(step, h0, xw)
        return out

    fx = jax.jit(xla_scan)
    fp = jax.jit(lambda *a: gru_scan_pallas(*a))
    print(json.dumps({"probe": "gru fwd", "B": b,
                      "xla_ms": timeit(fx, xw, w_hh, b_hh),
                      "pallas_ms": timeit(fp, xw, w_hh, b_hh)}))
    a0, a1 = fx(xw, w_hh, b_hh), fp(xw, w_hh, b_hh)
    print(json.dumps({"probe": "gru fwd max|diff|", "value": float(
        jnp.max(jnp.abs(a0.astype(jnp.float32) - a1.astype(jnp.float32))))}))
    gx = jax.jit(jax.grad(lambda *a: jnp.sum(
        xla_scan(*a).astype(jnp.float32)), argnums=(0, 1, 2)))
    gp = jax.jit(jax.grad(lambda *a: jnp.sum(
        gru_scan_pallas(*a).astype(jnp.float32)), argnums=(0, 1, 2)))
    print(json.dumps({"probe": "gru fwd+bwd", "B": b,
                      "xla_ms": timeit(gx, xw, w_hh, b_hh),
                      "pallas_ms": timeit(gp, xw, w_hh, b_hh)}))


def probe_brand(b=64, a=2000, c=1024):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (b, a), jnp.float32)
    asp = jax.random.normal(jax.random.PRNGKey(1), (a, c), jnp.float32)
    seed = jnp.asarray([1234, 77], jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (b, c), jnp.float32)

    def xla_path(w, asp, key):
        prod = w[:, :, None] * asp[None]
        keep = jax.random.bernoulli(key, 0.5, prod.shape)
        return jnp.mean(jnp.where(keep, prod / 0.5, 0.0), axis=1)

    fk = jax.jit(lambda w, asp, s: aspect_dropout_mean(w, asp, s, 0.5))
    fx = jax.jit(xla_path)
    print(json.dumps({"probe": "brand fwd", "B": b,
                      "xla_ms": timeit(fx, w, asp, key),
                      "pallas_ms": timeit(fk, w, asp, seed)}))
    gk = jax.jit(jax.grad(lambda w, asp: jnp.sum(
        aspect_dropout_mean(w, asp, seed, 0.5) * cot), argnums=(0, 1)))
    gx = jax.jit(jax.grad(lambda w, asp: jnp.sum(
        xla_path(w, asp, key) * cot), argnums=(0, 1)))
    print(json.dumps({"probe": "brand fwd+bwd", "B": b,
                      "xla_ms": timeit(gx, w, asp),
                      "pallas_ms": timeit(gk, w, asp)}))
    # unbiasedness: seed-average approaches the deterministic fold
    det = (w @ asp) / a
    avg = jnp.mean(jnp.stack(
        [fk(w, asp, jnp.asarray([s], jnp.int32)) for s in range(30)]), 0)
    print(json.dumps({"probe": "brand E[out] vs fold max|diff|",
                      "value": float(jnp.max(jnp.abs(avg - det)))}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gru"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (
        8 if which == "gru" else 64)
    if which == "gru":
        dtype = (jnp.bfloat16 if len(sys.argv) > 3
                 and sys.argv[3] in ("bf16", "bfloat16") else jnp.float32)
        probe_gru(b=batch, dtype=dtype)
    else:
        probe_brand(b=batch)
