"""The jitted training step: grad accumulation via lax.scan, one optimizer
update per call.

The reference accumulates `accumulation_step` backward passes then steps
Adam on the grad *sum* (not averaged -- trainer.py:381-386 quirk, kept).
Here one step consumes a super-batch with leading axis A (the accumulation
steps): lax.scan runs the A microbatch forward/backward passes sequentially
on device (summing grads, updating BN stats and the contrastive queue in
order), then clips the global norm and applies the update. The whole thing
is a single XLA program -- no host round-trips between microbatches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from fancyrec_tpu.config import Config
from fancyrec_tpu.losses import (
    contrastive_loss, crossclr_loss, lab_loss, triplet_loss)
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
from fancyrec_tpu.train.state import TrainState


def _micro_loss(model, cfg: Config, params, batch_stats, queue, rng, mb):
    # arrays staged bf16 over the wire (--transfer_dtype) upcast on device
    mb = {k: (v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v)
          for k, v in mb.items()}
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    v = VisualBatch(frames=mb["frames"], mean_origin=mb["origin"],
                    mask=mb["vmask"])
    t = TextBatch(bows=mb["bows"], tokens=mb["tokens"],
                  type_ids=mb["type_ids"], mask=mb["tmask"])
    out, mut = model.apply(
        variables, mb["brand_ids"], v, t, deterministic=False,
        rngs={"dropout": rng}, mutable=["batch_stats"])
    brand_emb, post_emb = out

    new_queue = queue
    if cfg.loss_fun == "CrossCLR":
        # the reference builds CrossCLR_onlyIntraModality() with ALL
        # defaults (trainer.py:344), so --cost_style is ignored and the
        # loss always uses 'sum' (loss_ctrs.py:34) -- preserved
        loss = crossclr_loss(brand_emb, post_emb, cost_style="sum")
    elif cfg.loss_fun == "mrl":
        loss = triplet_loss(mb["brand_ids"], brand_emb, post_emb,
                            margin=cfg.margin, cost_style=cfg.cost_style,
                            direction=cfg.direction)
    elif cfg.loss_fun == "cl":
        loss, new_queue = contrastive_loss(
            brand_emb, post_emb, queue, cost_style=cfg.cost_style,
            no_queue=cfg.no_queue, no_intra=cfg.no_intra)
    elif cfg.loss_fun == "lab":
        loss = lab_loss(brand_emb)
    else:
        raise ValueError("unknown loss_fun: %s" % cfg.loss_fun)
    return loss, (mut.get("batch_stats", batch_stats), new_queue)


def make_train_step(model, cfg: Config, tx: optax.GradientTransformation):
    """-> step(state, superbatch) -> (state, metrics). superbatch arrays have
    leading axis A = accumulation steps. Jit once; shapes are static."""

    grad_fn = jax.value_and_grad(
        partial(_micro_loss, model, cfg), argnums=0, has_aux=True)

    # donate the incoming state: params + Adam moments at recipe scale are
    # ~1.2 GB f32, and without donation old and new copies coexist in HBM
    # across every update (all call sites reassign state = step(state, .))
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, superbatch):
        a_static = jax.tree.leaves(superbatch)[0].shape[0]
        if a_static == 1:
            # A=1 (e.g. the validated b64 throughput recipe): skip the
            # accumulation scan. Measured cost-neutral on the v5e (XLA
            # folds the 1-iteration scan's zero-init + add) -- kept for
            # the simpler single-microbatch trace/HLO.
            rng, sub = jax.random.split(state.rng)
            mb = jax.tree.map(lambda x: x[0], superbatch)
            (loss, (batch_stats, queue)), grads = grad_fn(
                state.params, state.batch_stats, state.queue, sub, mb)
            losses = loss[None]
            loss_sum = loss
        else:
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)

            def body(carry, mb):
                batch_stats, queue, rng, gacc, lacc = carry
                rng, sub = jax.random.split(rng)
                (loss, (batch_stats, queue)), grads = grad_fn(
                    state.params, batch_stats, queue, sub, mb)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                return (batch_stats, queue, rng, gacc, lacc + loss), loss

            (batch_stats, queue, rng, grads, loss_sum), losses = \
                jax.lax.scan(
                    body, (state.batch_stats, state.queue, state.rng,
                           zero_grads, jnp.zeros(())), superbatch)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        a = losses.shape[0]
        new_state = state.replace(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            queue=queue, rng=rng, step=state.step + a)
        metrics = {"loss": loss_sum / a, "last_loss": losses[-1],
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step


_BOOKKEEPING_KEYS = ("n_valid", "idxs", "tlen_max", "flen_max",
                     "brand_ids_global")


def stack_microbatches(batches):
    """List of A batch dicts -> one super-batch dict with leading axis A.

    Host-side bookkeeping (scatter indices, valid counts, global length
    maxima) never reaches the device: the step doesn't read it, and
    under process-sharded loading the model arrays are per-process
    slices while the bookkeeping is global -- stacking them together
    would corrupt the local->global shard assembly."""
    import numpy as np
    keys = [k for k in batches[0] if k not in _BOOKKEEPING_KEYS]
    return {k: np.stack([b[k] for b in batches]) for k in keys}
