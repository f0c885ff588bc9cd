"""A/B the fused Pallas int8 score+top-k kernel against the int8 'matrix'
strategy on the real chip.

The matrix path round-trips the (B, N) f32 score matrix through HBM
(write + top_k read = 408 MB at 51 x 1M on top of the 1 GB int8 index
read); the fused kernel keeps a (B, k) running top-k in VMEM scratch and
reads the index once. Usage:

    python tools/topk_fused_probe.py [n_millions] [block ...]

Index data is generated ON DEVICE (host->device transfer of a 1 GB index
over the tunnel takes minutes, CLAUDE.md round-3).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.ops.similarity import (
    quantize_rows_int8, retrieval_topk, retrieval_topk_fused_int8)

B, D, K = 51, 1024, 10


def _drain(x):
    _ = np.asarray(x)[:1]


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    blocks = [int(a) for a in sys.argv[2:]] or [2048, 4096, 8192]
    n = int(n_m * 1e6)
    n = n - n % max(blocks)

    key = jax.random.PRNGKey(0)
    kb, kp = jax.random.split(key)
    gen = jax.jit(lambda k1, k2: (
        jax.random.normal(k1, (B, D), jnp.float32),
        jax.random.randint(k2, (n, D), -127, 128, jnp.int8)))
    brands, posts_q = gen(kb, kp)
    sq = jnp.sum(jnp.square(posts_q.astype(jnp.float32)), axis=1)
    posts_inv = jnp.where(sq > 0, jax.lax.rsqrt(jnp.maximum(sq, 1.0)), 0.0)
    posts_inv = jax.jit(lambda x: x)(posts_inv)
    _drain(posts_inv)
    print(f"index: {n} x {D} int8 on device", flush=True)

    def bench(fn, iters=100):
        v, i = fn()
        _drain(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = fn()
        _drain(v)
        return (time.perf_counter() - t0) / iters * 1e3, v, i

    mat = jax.jit(lambda b, p, pi: retrieval_topk(
        b, p, K, strategy="matrix", posts_inv=pi))
    t_mat, v_mat, i_mat = bench(lambda: mat(brands, posts_q, posts_inv))
    print(f"matrix int8: {t_mat:.3f} ms  "
          f"({n / t_mat * 1e3 / 1e6:.1f} Mposts/s)", flush=True)

    for blk in blocks:
        fused = jax.jit(lambda b, p, pi: retrieval_topk_fused_int8(
            b, p, pi, K, block=blk))
        try:
            t_f, v_f, i_f = bench(lambda: fused(brands, posts_q, posts_inv))
        except Exception as e:  # noqa: BLE001 - probe records failures
            print(f"fused block={blk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        same = bool(jnp.all(i_f == i_mat))
        vdiff = float(jnp.max(jnp.abs(v_f - v_mat)))
        print(f"fused block={blk}: {t_f:.3f} ms  "
              f"({n / t_f * 1e3 / 1e6:.1f} Mposts/s)  "
              f"speedup {t_mat / t_f:.2f}x  idx==matrix: {same}  "
              f"max|dv|={vdiff:.2e}", flush=True)


if __name__ == "__main__":
    main()
