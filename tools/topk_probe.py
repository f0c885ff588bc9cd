"""Probe where retrieval_topk time goes on the real chip (1M x 1024, k=10).

Variants:
  scan_full   - current production path (block matmul + top_k merge per block)
  matmul_only - same scan without the top-k merge (pure scoring bandwidth)
  block=N     - block-size sweep (fewer merges per pass)
  two_stage   - full (B, N) score matrix in one matmul, then one top_k
  local_then_merge - per-block local top_k(k) first, merge 2k per block

`topk_probe.py int8` probes the quantized path instead:
  matrix / scan blocks - production strategies on int8 rows
  scores+rowmax        - scoring + materialization without top_k
  bf16 scores          - emit the score matrix bf16 (halved write+read)
  hierarchical top_k   - blockwise (B, nb, blk) top_k then merge
Measured v5e-1 outcomes are recorded in CLAUDE.md (matrix wins at
7.4 ms; hierarchical top_k is 5-9x worse; bf16 emission saves 7% but
quadruples rounding error -- rejected).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fancyrec_tpu.ops.similarity import quantize_rows_int8, retrieval_topk


def timeit(f, *args, iters=5):
    out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(n=1_000_000, d=1024, b=51, k=10):
    key = jax.random.PRNGKey(0)
    brands = jax.random.normal(key, (b, d), jnp.float32)
    posts = jax.random.normal(key, (n, d), jnp.float32)

    for block in (4096, 16384, 65536, 131072):
        f = jax.jit(lambda q, p, blk=block: retrieval_topk(q, p, k, block=blk))
        print(json.dumps({"variant": "scan block=%d" % block,
                          "ms": round(timeit(f, brands, posts), 1)}))

    def matmul_only(q, p):
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        nb = n // 4096
        blocks = p[: nb * 4096].reshape(nb, 4096, d)

        def body(carry, blk):
            inv = jax.lax.rsqrt(jnp.sum(blk * blk, axis=1, keepdims=True))
            s = jnp.dot(qn, (blk * inv).T, preferred_element_type=jnp.float32)
            return jnp.maximum(carry, jnp.max(s, axis=1)), None

        out, _ = jax.lax.scan(body, jnp.full((b,), -jnp.inf), blocks)
        return out

    print(json.dumps({"variant": "scan matmul+rowmax only",
                      "ms": round(timeit(jax.jit(matmul_only), brands, posts), 1)}))

    def two_stage(q, p):
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        pn = p / jnp.linalg.norm(p, axis=1, keepdims=True)
        s = jnp.dot(qn, pn.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, k)

    print(json.dumps({"variant": "full matrix + one top_k",
                      "ms": round(timeit(jax.jit(two_stage), brands, posts), 1)}))

    def local_then_merge(q, p, block=65536):
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        nb = n // block
        blocks = p[: nb * block].reshape(nb, block, d)
        starts = (jnp.arange(nb) * block).astype(jnp.int32)

        def body(carry, inp):
            vals, idxs = carry
            blk, start = inp
            inv = jax.lax.rsqrt(jnp.sum(blk * blk, axis=1, keepdims=True))
            s = jnp.dot(qn, (blk * inv).T, preferred_element_type=jnp.float32)
            lv, li = jax.lax.top_k(s, k)          # local top-k of the block
            li = li + start
            cv = jnp.concatenate([vals, lv], axis=1)
            ci = jnp.concatenate([idxs, li], axis=1)
            nv, sel = jax.lax.top_k(cv, k)        # merge 2k
            return (nv, jnp.take_along_axis(ci, sel, axis=1)), None

        init = (jnp.full((b, k), -jnp.inf), jnp.zeros((b, k), jnp.int32))
        (vals, idxs), _ = jax.lax.scan(body, init, (blocks, starts))
        return vals, idxs

    f = jax.jit(lambda q, p: local_then_merge(q, p))
    print(json.dumps({"variant": "local top_k then 2k merge (block 65536)",
                      "ms": round(timeit(f, brands, posts), 1)}))


def main_int8(n=1_000_000, d=1024, b=51, k=10):
    key = jax.random.PRNGKey(0)
    brands = jax.random.normal(key, (b, d), jnp.float32)
    posts = jax.random.normal(key, (n, d), jnp.float32)
    qp, inv = jax.jit(quantize_rows_int8)(posts)

    f = jax.jit(lambda q, p, i: retrieval_topk(q, p, k, strategy="matrix",
                                               posts_inv=i))
    print(json.dumps({"variant": "int8 matrix (production)",
                      "ms": round(timeit(f, brands, qp, inv), 2)}))
    for blk in (16384, 65536, 131072):
        f = jax.jit(lambda q, p, i, blk=blk: retrieval_topk(
            q, p, k, strategy="scan", block=blk, posts_inv=i))
        print(json.dumps({"variant": "int8 scan block=%d" % blk,
                          "ms": round(timeit(f, brands, qp, inv), 2)}))

    from fancyrec_tpu.ops.similarity import _int8_scores, quantize_rows_int8 as q8

    def scores_rowmax(q, p, i):
        qb, b_inv = q8(q)
        return jnp.max(_int8_scores(qb, b_inv, p, i), axis=1)

    print(json.dumps({"variant": "int8 scores+rowmax only (no top_k)",
                      "ms": round(timeit(jax.jit(scores_rowmax),
                                         brands, qp, inv), 2)}))

    def matrix_bf16(q, p, i):
        qb, b_inv = q8(q)
        s = _int8_scores(qb, b_inv, p, i).astype(jnp.bfloat16)
        v, ix = jax.lax.top_k(s, k)
        return v.astype(jnp.float32), ix

    print(json.dumps({"variant": "int8 matrix, bf16 score emission",
                      "ms": round(timeit(jax.jit(matrix_bf16),
                                         brands, qp, inv), 2)}))

    def hierarchical(q, p, i, blk=4096):
        qb, b_inv = q8(q)
        s = _int8_scores(qb, b_inv, p, i)
        nb = -(-n // blk)
        pad = nb * blk - n
        if pad:
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        lv, li = jax.lax.top_k(s.reshape(b, nb, blk), k)
        li = li + (jnp.arange(nb, dtype=jnp.int32) * blk)[None, :, None]
        v, sel = jax.lax.top_k(lv.reshape(b, nb * k), k)
        return v, jnp.take_along_axis(li.reshape(b, nb * k), sel, axis=1)

    print(json.dumps({"variant": "int8 hierarchical two-stage top_k",
                      "ms": round(timeit(jax.jit(hierarchical),
                                         brands, qp, inv), 2)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "int8":
        main_int8(*[int(x) for x in sys.argv[2:]])
    else:
        main(*[int(x) for x in sys.argv[1:]])
