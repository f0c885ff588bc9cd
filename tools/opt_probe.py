"""Probe optimizer-update cost vs the HBM roofline on the real chip.

Adam over the 97.8M-param recipe model moves ~7N f32 words per update
(read g,m,v,p; write m,v,p) = 2.7 GB -> ~3.6 ms at the v5e's 819 GB/s
(~4.1 ms counting the clip pass's extra grad read). Measured (v5e-1,
100 iters): chain 5.26 ms (78% of roofline), flat 10.5 ms (ravel_pytree
copies every update -- a pessimization), fused-no-clip 4.72 ms. VERDICT:
a Pallas fused Adam+clip could recover at most ~1.2 ms/step (4% of the
b64 step) -- the production chain stays. Candidates:

  chain     the production make_optimizer chain as-is
  flat      optax.flatten(chain): one ravel'd buffer per moment, so the
            update is a handful of big elementwise kernels instead of
            ~100 per-leaf ones
  fused     hand-fused flat Adam in plain jnp (no clip) -- the floor a
            single pass can hit without Pallas

Usage: python tools/opt_probe.py [iters]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as g  # noqa: E402
from fancyrec_tpu.train.state import init_state, make_optimizer


def _drain(out):
    # device-side slice FIRST, then fetch one scalar: np.asarray on the
    # full leaf would pull hundreds of MB over the tunnel
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=100, label=""):
    print("compiling", label, flush=True)
    _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = g._flagship_cfg()
    cfg.queue_size = 64
    cfg = cfg.finalize()
    _, state = init_state(cfg)
    params = state.params
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), params)
    nparams = sum(p.size for p in jax.tree.leaves(params))
    res = {"params_m": round(nparams / 1e6, 1),
           "roofline_ms": round(nparams * 4 * 7 / 819e9 * 1e3, 2)}

    tx = make_optimizer(cfg)

    def upd(tx):
        # no donation: the timing loop re-feeds the same buffers, and
        # donated inputs are consumed on first use. All candidates pay
        # the same fresh-output allocation, so the A/B stands; absolute
        # numbers are an upper bound on the in-step (donated) cost.
        def f(opt_state, params, grads):
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt
        return jax.jit(f)

    res["chain_ms"] = timeit(upd(tx), tx.init(params), params, grads,
                             iters=iters, label="chain")

    params = jax.tree.map(jnp.copy, state.params)
    ftx = optax.flatten(make_optimizer(cfg))
    res["flat_ms"] = timeit(upd(ftx), ftx.init(params), params, grads,
                            iters=iters, label="flat")

    # hand-fused flat Adam (no clip): the single-pass floor
    flat, unravel = jax.flatten_util.ravel_pytree(state.params)
    gflat = jnp.full_like(flat, 1e-4)
    m = jnp.zeros_like(flat)
    v = jnp.zeros_like(flat)

    def fused(p, m, v, t, grad):
        b1, b2, lr, eps = 0.9, 0.999, cfg.learning_rate, 1e-8
        m = b1 * m + (1 - b1) * grad
        v = b2 * v + (1 - b2) * grad * grad
        t = t + 1
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v, t
    res["fused_ms"] = timeit(
        jax.jit(fused),
        flat, m, v, jnp.zeros((), jnp.float32), gflat,
        iters=iters, label="fused")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
