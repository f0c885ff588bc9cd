"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-CPU mesh.

Contracts: the GPipe schedule is numerically a no-op -- forward AND
gradients match the sequential layer stack -- and the BERT integration
consumes the production BertEncoder param tree unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fancyrec_tpu.parallel.mesh import build_mesh
from fancyrec_tpu.parallel.pipeline import (
    bert_pipeline_forward, pipeline_apply, stack_layer_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _toy_layer(p, h, aux):
    del aux
    return jnp.tanh(h @ p["w"] + p["b"])


def _toy_params(rng, n_layers, d):
    return {"w": jnp.asarray(rng.randn(n_layers, d, d) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.randn(n_layers, d) * 0.1, jnp.float32)}


def _sequential(stacked, x):
    def body(h, p):
        return _toy_layer(p, h, None), None
    out, _ = lax.scan(body, x, stacked)
    return out


def test_pipeline_matches_sequential_forward_and_grad():
    mesh = build_mesh("2,4")           # 4 pipeline stages over 'model'
    rng = np.random.RandomState(0)
    n_layers, d, n_micro, mb = 8, 16, 4, 4
    stacked = _toy_params(rng, n_layers, d)
    x = jnp.asarray(rng.randn(n_micro * mb, d), jnp.float32)

    def piped(params, x_flat):
        out = pipeline_apply(_toy_layer, params, x_flat.reshape(n_micro, mb, d),
                             mesh=mesh, axis="model")
        return out.reshape(-1, d)

    out_p = jax.jit(piped)(stacked, x)
    out_s = _sequential(stacked, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               atol=1e-6)

    # gradients flow through the schedule (scan + ppermute transpose)
    def loss_p(params, x_flat):
        return jnp.sum(piped(params, x_flat) ** 2)

    def loss_s(params, x_flat):
        return jnp.sum(_sequential(params, x_flat) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(stacked, x)
    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)


def test_pipeline_more_microbatches_than_stages():
    """M > S exercises the steady-state phase of the schedule (every
    stage busy), not just rampup/drain."""
    mesh = build_mesh("1,8")           # 8 stages, no data sharding
    rng = np.random.RandomState(1)
    stacked = _toy_params(rng, 8, 8)
    x = jnp.asarray(rng.randn(16, 3, 8), jnp.float32)   # 16 microbatches
    out = jax.jit(lambda p, v: pipeline_apply(
        _toy_layer, p, v, mesh=mesh, axis="model"))(stacked, x)
    ref = _sequential(stacked, x.reshape(48, 8)).reshape(16, 3, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_rejects_indivisible_layers():
    mesh = build_mesh("2,4")
    stacked = _toy_params(np.random.RandomState(0), 6, 8)   # 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_toy_layer, stacked,
                       jnp.zeros((4, 2, 8)), mesh=mesh, axis="model")


@pytest.mark.slow   # 16 s: full BertEncoder fwd+grads, pipeline vs sequential
def test_bert_pipeline_matches_sequential_encoder():
    """bert_pipeline_forward over the PRODUCTION BertEncoder param tree
    == BertEncoder.apply (deterministic), with real padding masks."""
    from fancyrec_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    enc = BertEncoder(cfg)
    rng = np.random.RandomState(2)
    b, t = 8, 12
    ids = jnp.asarray(rng.randint(0, 120, (b, t)), jnp.int32)
    types = jnp.zeros((b, t), jnp.int32)
    lens = rng.randint(3, t + 1, b)
    mask = jnp.asarray(np.arange(t)[None] < lens[:, None], jnp.int32)

    params = enc.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    ref = enc.apply({"params": params}, ids, types, mask, deterministic=True)

    mesh = build_mesh("2,4")           # 4 stages x 2-way data sharding
    out = jax.jit(lambda p: bert_pipeline_forward(
        p, cfg, ids, types, mask, mesh=mesh, axis="model"))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    # trained-checkpoint contract: a microbatch count that does not
    # divide the batch is a usage error, not silent misbehavior
    with pytest.raises(ValueError, match="not divisible into"):
        bert_pipeline_forward(params, cfg, ids, types, mask, mesh=mesh,
                              axis="model", n_micro=3)
    # microbatch size that cannot shard over 'data' must fail with the
    # module's own precondition error, not a GSPMD error from shard_map
    with pytest.raises(ValueError, match="microbatch size"):
        bert_pipeline_forward(params, cfg, ids[:4], types[:4], mask[:4],
                              mesh=mesh, axis="model")


@pytest.mark.slow
def test_bert_pipeline_stochastic_dropout():
    """Training path: deterministic=False + rng draws real dropout masks
    inside the pipelined layers. Contracts: reproducible given the key;
    different keys give different outputs; zero dropout probs fold the
    stochastic path back to the deterministic one exactly; gradients
    stay finite through the stochastic schedule."""
    from fancyrec_tpu.models.bert import BertConfig, BertEncoder

    mesh = build_mesh("2,4")
    rng = np.random.RandomState(5)
    b, t = 8, 12
    ids = jnp.asarray(rng.randint(0, 120, (b, t)), jnp.int32)
    types = jnp.zeros((b, t), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)

    drop = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64,
                      hidden_dropout_prob=0.5,
                      attention_probs_dropout_prob=0.5)
    enc = BertEncoder(drop)
    params = enc.init(jax.random.PRNGKey(0), ids, types, mask)["params"]

    run = jax.jit(lambda p, k: bert_pipeline_forward(
        p, drop, ids, types, mask, mesh=mesh, axis="model",
        deterministic=False, rng=k))
    a = np.asarray(run(params, jax.random.PRNGKey(1)))
    a2 = np.asarray(run(params, jax.random.PRNGKey(1)))
    c = np.asarray(run(params, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(a, a2)          # key-deterministic
    assert np.abs(a - c).max() > 1e-3             # keys actually matter
    det = np.asarray(bert_pipeline_forward(
        params, drop, ids, types, mask, mesh=mesh, axis="model"))
    assert np.abs(a - det).max() > 1e-3           # dropout actually fires

    # prob 0 stochastic == deterministic, bit-for-bit (the trainer
    # parity case: --bert_dropout 0 makes pp-on/off losses comparable)
    nodrop = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=4,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    s = np.asarray(jax.jit(lambda p, k: bert_pipeline_forward(
        p, nodrop, ids, types, mask, mesh=mesh, axis="model",
        deterministic=False, rng=k))(params, jax.random.PRNGKey(1)))
    d = np.asarray(jax.jit(lambda p: bert_pipeline_forward(
        p, nodrop, ids, types, mask, mesh=mesh, axis="model"))(params))
    np.testing.assert_array_equal(s, d)

    # gradients through the stochastic schedule are finite
    g = jax.jit(jax.grad(lambda p: jnp.sum(bert_pipeline_forward(
        p, drop, ids, types, mask, mesh=mesh, axis="model",
        deterministic=False, rng=jax.random.PRNGKey(3)) ** 2)))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_bert_pipeline_dropout_independent_across_data_shards():
    """Regression: the PRNG key enters shard_map replicated over the data
    axis, so without an axis_index fold every dp shard drew bit-identical
    (layer, microbatch) masks for its local rows. Pin the fix: identical
    rows that land on DIFFERENT data shards must get different in-pipe
    dropout draws (attention dropout only -- embedding dropout happens in
    the replicated region and is per-row unique either way, which would
    hide the bug)."""
    from fancyrec_tpu.models.bert import BertConfig, BertEncoder

    mesh = build_mesh("2,4")                      # data=2, model=4
    b, t = 8, 12
    ids = jnp.tile(jnp.asarray([[7, 3, 9, 1, 4, 2, 8, 5, 6, 2, 3, 1]],
                               jnp.int32), (b, 1))   # every row identical
    types = jnp.zeros((b, t), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.5)
    enc = BertEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), ids, types, mask)["params"]

    out = np.asarray(jax.jit(lambda p, k: bert_pipeline_forward(
        p, cfg, ids, types, mask, mesh=mesh, axis="model",
        deterministic=False, rng=k))(params, jax.random.PRNGKey(1)))
    # with n_micro=4, mb=2, data=2: rows 2m and 2m+1 share a microbatch
    # slot on different data shards -- they must NOT share masks
    for m in range(4):
        assert np.abs(out[2 * m] - out[2 * m + 1]).max() > 1e-4, \
            "data shards drew identical dropout masks (microbatch %d)" % m


@pytest.mark.slow
def test_bert_pipeline_bf16_bounded_divergence():
    """bf16 compute: the pipelined residual stream is uniformly bf16
    between layers while the sequential encoder carries f32 LayerNorm
    outputs -- NOT bit-equivalent by design (docstring contract). Pin
    that the divergence stays at bf16 rounding level."""
    from fancyrec_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, compute_dtype="bfloat16")
    enc = BertEncoder(cfg)
    rng = np.random.RandomState(4)
    b, t = 8, 12
    ids = jnp.asarray(rng.randint(0, 120, (b, t)), jnp.int32)
    types = jnp.zeros((b, t), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    params = enc.init(jax.random.PRNGKey(1), ids, types, mask)["params"]
    ref = np.asarray(enc.apply({"params": params}, ids, types, mask,
                               deterministic=True), np.float32)
    mesh = build_mesh("2,4")
    out = np.asarray(jax.jit(lambda p: bert_pipeline_forward(
        p, cfg, ids, types, mask, mesh=mesh, axis="model"))(params),
        np.float32)
    delta = np.abs(out - ref).max()
    assert delta < 0.1, delta       # bf16 rounding, not a wrong program
    assert delta == delta           # finite
