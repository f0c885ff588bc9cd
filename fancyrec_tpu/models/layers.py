"""Shared building blocks for the dual-branch encoders.

Every per-sample Python loop of the reference model (masked softmax
model.py:109-112, masked means model.py:166-168,271-273,344-346) is a single
masked vectorized op here -- one XLA kernel per batch instead of O(batch)
tiny launches.

Batch-shape semantics: the reference pads each batch to *its own* max
length, and several reductions divide or pool over that batch-max axis, so a
sample's embedding depends on the longest sample in its batch. To keep jit
shapes static while staying bit-faithful, tensors are padded to a fixed
maximum and every such reduction takes the dynamic batch-max length
(`batch_len`) to bound the valid region.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_linear_init(fan_in: int):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) for the
    kernel and U(-1/sqrt(fan_in), +) for the bias -- both reduce to
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_torch():
    """Uniform(-r, r), r = sqrt(6/(fan_in+fan_out)) -- reference model.py:48-55."""
    return nn.initializers.xavier_uniform()


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Row L2-normalization (reference model.py:39-44; no epsilon there either)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / (norm + eps)


def constrain_seq_sharding(x: jnp.ndarray, enabled: bool) -> jnp.ndarray:
    """Sequence-parallel annotation: shard a (B, T, D) activation's time
    axis over the 'model' mesh axis (GSPMD inserts the collectives around
    attention/convs). No-op when disabled, when no mesh is in context, or
    when the static dims don't divide the mesh axes (e.g. init dummies)."""
    if not enabled:
        return x
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or not {"data", "model"} <= set(mesh.axis_names):
        return x
    sizes = dict(zip(mesh.axis_names, mesh.axis_sizes))
    spec = [None, None, None]
    if x.shape[0] % sizes["data"] == 0:
        spec[0] = "data"
    if x.shape[1] % sizes["model"] == 0:
        spec[1] = "model"
    if spec == [None, None, None]:
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def batch_max_len(mask: jnp.ndarray) -> jnp.ndarray:
    """Dynamic max valid length over the batch from a (B, T) 0/1 mask."""
    return jnp.max(jnp.sum(mask, axis=1)).astype(jnp.int32)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean over valid positions: (B,T,D),(B,T) -> (B,D).

    Vectorizes the reference's `mean(batch[:lengths[i]], 0)` loops.
    """
    mask = mask.astype(x.dtype)
    s = jnp.einsum("btd,bt->bd", x, mask)
    cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return s / cnt


class MFC(nn.Module):
    """Dense -> ReLU -> Dropout common-space mapping (reference model.py:59-83)."""

    out_dim: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.out_dim, kernel_init=xavier_uniform_torch(),
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class AttentionPool(nn.Module):
    """Structured self-attention pooler (Lin et al. ICLR'17 variant).

    Reference model.py:87-114: scores = mean over heads of W2 tanh(W1 x);
    softmax over *valid* frames only; output = mean over the batch-max frame
    axis of weight * x (the mean divides by the batch-max length -- kept).
    """

    hidden: int
    heads: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, T, D); mask: (B, T) 0/1
        a = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform_torch(), name="w_1")(x)
        a = nn.Dense(self.heads, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform_torch(), name="w_2")(jnp.tanh(a))
        score = jnp.mean(a, axis=-1)                       # (B, T)
        neg = jnp.finfo(score.dtype).min
        score = jnp.where(mask > 0, score, neg)
        weight = jax.nn.softmax(score, axis=1)
        weight = jnp.where(mask > 0, weight, 0.0)[..., None]
        t_batch = jnp.maximum(batch_max_len(mask), 1).astype(x.dtype)
        return jnp.sum(weight * x, axis=1) / t_batch


class ConvBank(nn.Module):
    """Parallel 1-D convolutions over the time axis + masked global max-pool.

    Equivalent to the reference's Conv2d(1, K, (ws, D), padding=(ws-1, 0))
    banks (model.py:141-144,177-181 etc.): each branch is a length-ws conv
    over time with D input channels, 'same+causal-fringe' zero padding of
    ws-1 on both sides, ReLU, then max over the valid time range.

    The valid range is T_batch + ws - 1 output positions, where T_batch is
    the dynamic batch-max input length -- positions beyond come from purely
    zero-padded windows the reference never materializes (its tensors stop
    at T_batch); they would contribute relu(bias) and are masked out.
    """

    kernel_num: int
    kernel_sizes: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, batch_len):
        # x: (B, T, D) with zeros at positions >= per-sample/batch valid area
        outs = []
        t = x.shape[1]
        for ws in self.kernel_sizes:
            y = nn.Conv(self.kernel_num, kernel_size=(ws,),
                        padding=[(ws - 1, ws - 1)], dtype=self.dtype,
                        name="conv_w%d" % ws)(x)          # (B, T+ws-1, K)
            y = nn.relu(y)
            pos = jnp.arange(t + ws - 1)[None, :, None]
            valid = pos < (batch_len + ws - 1)
            y = jnp.where(valid, y, jnp.finfo(y.dtype).min)
            outs.append(jnp.max(y, axis=1))               # (B, K)
        return jnp.concatenate(outs, axis=1)


class BatchNorm1dTorch(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1).

    Running stats live in the 'batch_stats' collection; train mode uses
    batch statistics (biased variance) and updates running stats with the
    unbiased variance, exactly like torch.nn.BatchNorm1d.

    Data parallelism: the mean/var are jnp reductions over the *logical*
    batch axis, so under GSPMD batch sharding XLA computes them across all
    replicas -- synchronized cross-replica BatchNorm for free (verified by
    the sharded-vs-unsharded train-step equality test).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean((x - mean) ** 2, axis=0)
            n = x.shape[0]
            unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale + bias
