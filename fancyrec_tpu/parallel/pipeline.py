"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference has no distributed backend at all (reference
util/constant.py:5-8 -- one global `device`); SURVEY.md §2.8 lists the
TPU-native parallel modes this framework must provide. dp/tp/sp are wired
into the trainer (parallel/mesh.py); this module adds the remaining named
mode, pp: a layer stack sharded across mesh devices with microbatch
pipelining, expressed the TPU way -- `shard_map` over the mesh axis with
`lax.ppermute` moving activations stage->stage over ICI, everything inside
one jitted program (no host round-trips between stages).

Scope note (honest engineering): the recipe model (~105M params) fits on
a single v5e chip with room to spare, so the production trainer does not
*need* pp and does not enable it by default. The component exists for the
scaled configs SURVEY §2.8 targets (deep text towers / future model
growth), is numerically verified against the sequential stack (forward
AND gradients, tests/test_pipeline.py), and is exercised under GSPMD in
the driver's multichip dry run.

Schedule: classic GPipe. With S stages and M microbatches the loop runs
M+S-1 ticks; stage s processes microbatch m at tick t = m+s, so utilization
is M/(M+S-1) (the bubble shrinks as M grows). Activations hop one stage
per tick via a non-circular ppermute ring. Each stage holds L/S
consecutive layers, applied with an inner lax.scan over the stacked layer
params (one compiled layer body per stage, not L/S copies).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(per_layer: list):
    """[tree_0, ..., tree_{L-1}] (identical structure) -> one tree whose
    leaves gain a leading layer axis L. The inverse of indexing layer i."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def pipeline_apply(layer_fn: Callable, stacked_params: Any, x: jnp.ndarray,
                   aux: Any = None, *, mesh: Mesh, axis: str = "model",
                   data_axis: Optional[str] = "data",
                   rng: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Run x through L stacked layers, the layer axis sharded over mesh
    `axis` (S pipeline stages), with GPipe microbatch pipelining.

    layer_fn(params_one_layer, h, aux_mb) -> h' must be batch-elementwise
    (every transformer layer is): h has shape (mb, ...) and is transformed
    without mixing microbatches. `aux` is an optional pytree of
    per-microbatch side inputs with leading dims (M, mb, ...) (e.g. the
    attention bias) that is indexed, not transformed, by the layers.

    x: (M, mb, ...) -- the caller splits the batch into M microbatches.
    stacked_params: pytree with leading layer dim L, L % S == 0; stage s
    owns layers [s*L/S, (s+1)*L/S) in order.

    The microbatch dim mb is additionally sharded over `data_axis` when
    the mesh has one (pp composes with dp); pass data_axis=None to keep
    it replicated. Returns (M, mb, ...), replicated over `axis`.

    `mesh` may be a concrete jax.sharding.Mesh or the AbstractMesh from
    an ambient `jax.set_mesh` context (both expose .shape / .axis_names;
    shard_map resolves the abstract form at trace time).

    Stochastic layers: pass `rng` (a PRNG key) and layer_fn is called as
    layer_fn(params, h, aux_mb, key) with a key unique per (data shard,
    layer, microbatch) -- fold_in(fold_in(fold_in(rng, data_index),
    global_layer_index), microbatch); the data-shard fold is what keeps
    dp rows independently masked (the key enters replicated over dp).
    The draw structure differs from running the layers sequentially under
    flax's path-folded rngs, so stochastic outputs are equally
    distributed but NOT bit-equal to the unpipelined module; exact
    cross-checks must run deterministically.

    Differentiable end-to-end: the tick loop is a lax.scan and ppermute
    has a well-defined transpose, so jax.grad pipelines the backward pass
    through the same schedule in reverse.
    """
    axis_sizes = dict(mesh.shape)
    n_stages = axis_sizes[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError("num layers %d not divisible by %d pipeline "
                         "stages (mesh axis %r)" % (n_layers, n_stages, axis))
    n_micro = x.shape[0]
    dspec = data_axis if (data_axis and axis_sizes.get(data_axis, 1) > 1) \
        else None
    if dspec and x.shape[1] % axis_sizes[dspec]:
        # fail with a clear precondition error, not a GSPMD sharding
        # error from deep inside shard_map
        raise ValueError(
            "microbatch size %d not divisible by the %d-wide %r axis "
            "(use fewer microbatches or data_axis=None)"
            % (x.shape[1], axis_sizes[dspec], dspec))

    layers_per_stage = n_layers // n_stages

    def kernel(params_l, x_l, aux_l, rng_l):
        s = lax.axis_index(axis)
        is_first = s == 0
        is_last = s == n_stages - 1
        # x/aux are replicated over the pipe axis; everything they meet
        # (axis_index, params) varies over it -- promote up front so the
        # scan carry has a consistent varying-axes type (jax>=0.9 vma)
        x_l = lax.pcast(x_l, axis, to="varying")
        aux_l = jax.tree_util.tree_map(
            lambda a: lax.pcast(a, axis, to="varying"), aux_l)
        if rng_l is not None:
            rng_l = lax.pcast(rng_l, axis, to="varying")
            if dspec:
                # distinct draws per data shard: the key enters shard_map
                # replicated over the data axis, so without this fold
                # every dp shard would draw bit-identical (layer,
                # microbatch) masks for its local rows -- silently
                # correlated regularization vs the non-pp trainer
                rng_l = jax.random.fold_in(
                    lax.pcast(rng_l, dspec, to="varying"),
                    lax.axis_index(dspec))

        def stage(h, aux_mb, m):
            if rng_l is None:
                def body(carry, p):
                    return layer_fn(p, carry, aux_mb), None
                h, _ = lax.scan(body, h, params_l)
            else:
                def body(carry, xs):
                    p, lid_local = xs
                    key = jax.random.fold_in(
                        jax.random.fold_in(
                            rng_l, s * layers_per_stage + lid_local), m)
                    return layer_fn(p, carry, aux_mb, key), None
                h, _ = lax.scan(
                    body, h, (params_l, jnp.arange(layers_per_stage)))
            return h

        def tick(carry, t):
            buf, out = carry
            # stage s works on microbatch m = t - s (valid in [0, M))
            m = jnp.clip(t - s, 0, n_micro - 1)
            valid = (t - s >= 0) & (t - s < n_micro)
            inject = lax.dynamic_index_in_dim(x_l, m, 0, keepdims=False)
            h_in = jnp.where(is_first, inject, buf)
            aux_mb = jax.tree_util.tree_map(
                lambda a: lax.dynamic_index_in_dim(a, m, 0, keepdims=False),
                aux_l)
            y = stage(h_in, aux_mb, m)
            # the last stage commits finished microbatches to the output
            updated = lax.dynamic_update_index_in_dim(out, y, m, 0)
            out = jnp.where(valid & is_last, updated, out)
            # hop one stage down the ring (stage 0 receives nothing)
            buf = lax.ppermute(y, axis,
                               [(i, i + 1) for i in range(n_stages - 1)])
            return (buf, out), None

        # derive the zeros from the (pcast) input so they inherit its
        # varying-axes type -- fresh zeros_like constants would not
        buf0 = x_l[0] * 0
        out0 = x_l * 0
        (_, out), _ = lax.scan(tick, (buf0, out0),
                               jnp.arange(n_micro + n_stages - 1))
        # only the last stage holds real data; psum replicates it over the
        # pipeline axis (every other stage contributes zeros)
        return lax.psum(out, axis)

    nd = x.ndim
    xspec = P(None, dspec, *([None] * (nd - 2)))
    aux_specs = jax.tree_util.tree_map(
        lambda a: P(None, dspec, *([None] * (a.ndim - 2))), aux)
    rng_spec = None if rng is None else jax.tree_util.tree_map(
        lambda _: P(), rng)
    fn = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), xspec, aux_specs, rng_spec),
        out_specs=xspec)
    return fn(stacked_params, x, aux, rng)


def bert_pipeline_forward(params: dict, cfg, input_ids, token_type_ids,
                          attention_mask, *, mesh: Mesh,
                          axis: str = "model", n_micro: int = 0,
                          deterministic: bool = True, rng=None):
    """BertEncoder.apply equivalent with the layer stack pipelined over
    mesh `axis`.

    Training path: deterministic=False + rng applies the encoder's
    dropouts (embedding + per-layer attention/hidden) with keys folded
    per (layer, microbatch). The masks are equally distributed but NOT
    the same draws as the sequential encoder's path-folded flax rngs --
    with cfg dropout probs == 0 (--bert_dropout 0) the stochastic path
    folds to the deterministic one exactly, which is what the trainer
    parity test pins (tests/test_multichip.py).

    Consumes the PRODUCTION param tree (models/bert.py BertEncoder:
    embeddings + layer_i subtrees) unchanged, so any trained checkpoint
    runs pipelined without conversion. Embeddings + final masking math
    stay replicated (they are negligible next to the layer stack).

    Precision contract: in f32 compute this matches the sequential
    encoder to reduction-reassociation noise (pinned ~1e-6 in
    tests/test_pipeline.py). In bfloat16 compute the pipelined residual
    stream is uniformly bf16 between layers (the scan carry needs one
    dtype), whereas the sequential encoder carries each flax LayerNorm's
    f32 output into the next residual add -- a standard mixed-precision
    layout difference, but NOT bit-equivalent: expect bf16-rounding-level
    divergence (~1e-2 worst case over deep stacks; bounded in the bf16
    test). Use f32 when cross-checking a checkpoint's sequential outputs.
    """
    from flax import linen as nn
    from fancyrec_tpu.models.bert import BertLayer

    b, t = input_ids.shape
    n_stages = dict(mesh.shape)[axis]
    n_micro = n_micro or n_stages
    if b % n_micro:
        raise ValueError("batch %d not divisible into %d microbatches"
                         % (b, n_micro))
    stochastic = not deterministic and rng is not None

    hidden = (params["word_embeddings"][input_ids]
              + params["position_embeddings"][jnp.arange(t)][None]
              + params["token_type_embeddings"][token_type_ids])
    # the exact flax LayerNorm the sequential encoder uses (fast-variance
    # formula): a hand-rolled LN here would drift at the 1e-7 level
    hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
        {"params": params["embeddings_ln"]}, hidden)
    if stochastic and cfg.hidden_dropout_prob > 0.0:
        # the sequential encoder's embedding dropout (replicated region,
        # before the pipeline); key index num_hidden_layers is disjoint
        # from the per-layer fold_in range [0, L) used inside the pipe
        keep = 1.0 - cfg.hidden_dropout_prob
        kemb = jax.random.fold_in(rng, cfg.num_hidden_layers)
        mask = jax.random.bernoulli(kemb, keep, hidden.shape)
        hidden = jnp.where(mask, hidden / keep, 0.0)
    hidden = hidden.astype(cfg._dt)

    mask = attention_mask.astype(jnp.float32)
    attn_bias = (1.0 - mask)[:, None, None, :] * jnp.finfo(jnp.float32).min

    stacked = stack_layer_params(
        [params["layer_%d" % i] for i in range(cfg.num_hidden_layers)])
    layer = BertLayer(cfg)

    if stochastic:
        def layer_fn(p, h, bias, key):
            return layer.apply({"params": p}, h, bias, False,
                               rngs={"dropout": key}).astype(h.dtype)
    else:
        def layer_fn(p, h, bias):
            # keep the residual-stream dtype stable across the scan carry
            # (no-op in f32; in bf16 mode flax LayerNorm upcasts its output)
            return layer.apply({"params": p}, h, bias, True).astype(h.dtype)
    if getattr(cfg, "remat", False):
        layer_fn = jax.checkpoint(layer_fn)

    mb = b // n_micro
    x = hidden.reshape(n_micro, mb, t, -1)
    bias = attn_bias.reshape(n_micro, mb, *attn_bias.shape[1:])
    out = pipeline_apply(layer_fn, stacked, x, bias, mesh=mesh, axis=axis,
                         rng=rng if stochastic else None)
    return out.reshape(b, t, -1)
