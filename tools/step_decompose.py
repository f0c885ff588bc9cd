"""Decompose the recipe train step's cost per component on the real chip.

Times each tower's forward+backward, the loss, and the optimizer update
separately (amortized over many iterations -- the tunnel has a ~1 ms
per-dispatch floor) so kernel work targets the actual bottleneck.

Usage: python tools/step_decompose.py [batch] [bf16]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as g  # noqa: E402
from fancyrec_tpu.losses import contrastive_loss, init_queue_state
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
from fancyrec_tpu.train.state import init_state, make_optimizer
from fancyrec_tpu.train.step import make_train_step, stack_microbatches


def _drain(out):
    # device-side slice FIRST, then fetch one scalar: np.asarray on the
    # full leaf would pull a large grad leaf over the tunnel each drain
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=100, label=""):
    print("compiling", label, flush=True)
    _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)                                     # drain via tiny fetch
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 64
    dtype = "bfloat16" if any(a in ("bf16", "bfloat16") for a in args) else ""

    cfg = g._flagship_cfg()
    cfg.batch_size = batch
    cfg.accumulation_step = 1
    cfg.queue_size = 512
    if dtype:
        cfg.dtype = dtype
    if "rbg" in args:
        cfg.rng_impl = "rbg"
    cfg = cfg.finalize()
    model, state = init_state(cfg)
    rng = np.random.RandomState(0)
    mb = g._example_batch(cfg, cfg.batch_size, rng)
    v = VisualBatch(frames=mb["frames"], mean_origin=mb["origin"],
                    mask=mb["vmask"])
    t = TextBatch(bows=mb["bows"], tokens=mb["tokens"],
                  type_ids=mb["type_ids"], mask=mb["tmask"])
    key = (jax.random.PRNGKey(0) if cfg.rng_impl == "threefry"
           else jax.random.key(0, impl=cfg.rng_impl))
    res = {"batch": batch, "dtype": dtype or "float32",
           "rng_impl": cfg.rng_impl}

    # full step (superbatch of 1 microbatch)
    tx = make_optimizer(cfg)
    step = make_train_step(model, cfg, tx)
    sb = jax.device_put(stack_microbatches(
        [{k: np.asarray(x) for k, x in mb.items()}]))
    # the step donates its input state: time it on a deep copy so the
    # original params survive for the per-tower timings below
    st = jax.tree.map(jnp.copy, state)
    def run_step():
        nonlocal st
        st, metrics = step(st, sb)
        return metrics["loss"]
    res["full_step_ms"] = timeit(run_step, iters=50, label="full_step")

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def tower_grad(method, subtree, *inputs, deterministic=False):
        # differentiate ONLY the tower's own params: grad over the full
        # tree would zero-fill 97.8M params per call and swamp the timing
        rest = {k: p for k, p in state.params.items() if k != subtree}

        def loss_fn(tower_params):
            params = dict(rest)
            params[subtree] = tower_params
            vs = dict(variables)
            vs["params"] = params
            out = model.apply(vs, *inputs, deterministic=deterministic,
                              rngs={"dropout": key}, method=method,
                              mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss_fn)), state.params[subtree]

    for name, method, subtree, inputs in (
            ("vis", model.embed_vis, "vid_encoding", (v,)),
            ("txt", model.embed_txt, "text_encoding", (t,)),
            ("brand", model.embed_brand, "brand_encoding",
             (mb["brand_ids"],))):
        fn, tp = tower_grad(method, subtree, *inputs)
        res["%s_fwd_bwd_ms" % name] = timeit(fn, tp, label=name)
        # deterministic variant: the delta is the dropout RNG+mask cost
        fn_d, _ = tower_grad(method, subtree, *inputs, deterministic=True)
        res["%s_det_ms" % name] = timeit(fn_d, tp, label=name + "_det")

    # loss alone on recipe-sized embeddings
    be = jnp.asarray(rng.randn(batch, cfg.common_embedding_size), jnp.float32)
    pe = jnp.asarray(rng.randn(batch, cfg.common_embedding_size), jnp.float32)
    q = init_queue_state(cfg.queue_size, cfg.common_embedding_size)

    def loss_only(be, pe):
        loss, _ = contrastive_loss(be, pe, q, cost_style=cfg.cost_style)
        return loss
    res["loss_fwd_bwd_ms"] = timeit(
        jax.jit(jax.grad(loss_only, argnums=(0, 1))), be, pe, label="loss")

    # optimizer update alone (Adam over 97.8M params: HBM-bound)
    grads = jax.tree.map(jnp.ones_like, state.params)

    def opt_update(opt_state, params, grads):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt
    res["optimizer_ms"] = timeit(jax.jit(opt_update), state.opt_state,
                                 state.params, grads, label="opt")

    print(json.dumps({k: (round(x, 2) if isinstance(x, float) else x)
                      for k, x in res.items()}))


if __name__ == "__main__":
    main()
