"""Train state: parameters, optimizer, BN stats, contrastive queue, RNG.

Everything mutable in the reference (module buffers, BN running stats, the
loss queue, the Eiters counter, the optimizer's lr) is an explicit field of
one pytree threaded through the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fancyrec_tpu.config import Config
from fancyrec_tpu.losses import ContrastiveQueueState, init_queue_state
from fancyrec_tpu.models import FancyRec
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    queue: ContrastiveQueueState
    step: jnp.ndarray          # Eiters
    rng: jnp.ndarray


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam/RMSprop with torch-default hyperparameters and mutable lr.

    The reference clips the *global* grad norm at grad_clip before each
    optimizer step (trainer.py:383-384).
    """
    if cfg.optimizer == "adam":
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate, eps=1e-8)
    elif cfg.optimizer == "rmsprop":
        # torch.optim.RMSprop semantics (reference trainer.py:279):
        # alpha=0.99 and eps ADDED OUTSIDE the sqrt; optax defaults
        # (decay=0.9, eps inside sqrt) are a different estimator
        opt = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=cfg.learning_rate, decay=0.99, eps=1e-8,
            eps_in_sqrt=False)
    else:
        raise ValueError(cfg.optimizer)
    chain = [opt]
    if cfg.grad_clip > 0:
        chain.insert(0, optax.clip_by_global_norm(cfg.grad_clip))
    return optax.chain(*chain)


def current_lr(state: TrainState) -> float:
    return float(state.opt_state[-1].hyperparams["learning_rate"])


def scale_lr(state: TrainState, factor: float) -> TrainState:
    """Multiplicative lr decay (reference trainer.py:306,315-317,425-427)."""
    inner = state.opt_state[-1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = hp["learning_rate"] * factor
    new_inner = inner._replace(hyperparams=hp)
    return state.replace(opt_state=state.opt_state[:-1] + (new_inner,))


def dummy_batch(cfg: Config, batch_size: int = 2):
    """Minimal shaped inputs for model.init."""
    v = VisualBatch(
        frames=jnp.zeros((batch_size, cfg.max_frames, cfg.visual_feat_dim)),
        mean_origin=jnp.zeros((batch_size, cfg.visual_feat_dim)),
        mask=jnp.ones((batch_size, cfg.max_frames)))
    tlen = cfg.max_tokens if cfg.text_net == "transformers" else cfg.max_words
    t = TextBatch(
        bows=jnp.zeros((batch_size, cfg.bow_vocab_size)),
        tokens=jnp.zeros((batch_size, tlen), jnp.int32),
        type_ids=jnp.zeros((batch_size, tlen), jnp.int32),
        mask=jnp.ones((batch_size, tlen), jnp.int32))
    brand_ids = jnp.zeros((batch_size,), jnp.int32)
    return brand_ids, v, t


def init_state(cfg: Config, seed: Optional[int] = None) -> "tuple[FancyRec, TrainState]":
    model = FancyRec(cfg)
    # rbg: the TPU hardware-backed generator -- threefry mask generation
    # alone costs ~5 ms/step at recipe b64 (measured via
    # tools/step_decompose.py det-vs-train delta). Param init always uses
    # threefry so initial weights are identical across rng_impl choices;
    # only the training dropout stream switches.
    impl = getattr(cfg, "rng_impl", "threefry") or "threefry"
    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    pkey, dkey, rng = jax.random.split(key, 3)
    if impl != "threefry":
        rng = jax.random.key(
            cfg.seed if seed is None else seed, impl=impl)
    brand_ids, v, t = dummy_batch(cfg)
    variables = model.init({"params": pkey, "dropout": dkey},
                           brand_ids, v, t, deterministic=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        queue=init_queue_state(cfg.queue_size, cfg.common_embedding_size),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
    return model, state
