"""Brand tower: learned aspect mixtures (reference model.py:389-428)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def l1_penalty(x):
    """Identity whose backward adds 1e-4 * sign(x) to the cotangent.

    Faithful port of the reference's L1Penalty autograd Function
    (model.py:389-402): an L1 pull on the brand aspect weights applied in
    gradient space rather than as a loss term.
    """
    return x


def _l1_fwd(x):
    return x, x


def _l1_bwd(x, g):
    return (g + 0.0001 * jnp.sign(x),)


l1_penalty.defvjp(_l1_fwd, _l1_bwd)


class BrandAspects(nn.Module):
    """brand id -> weighted aspect vectors / brand embedding.

    A (brand_num+1, num_aspects) embedding of per-brand aspect weights
    (L1-penalized) scales a shared (num_aspects, common_dim) aspect matrix;
    dropout p=0.5 (torch nn.Dropout() default, reference model.py:417).
    The brand embedding is the mean over the aspect axis (model.py:594).

    `mean=True` computes that mean WITHOUT materializing the
    (B, num_aspects, common_dim) product (131M elements at recipe scale):
      * deterministic: one (B, A) @ (A, C) matmul / A -- same value as
        mean-of-product up to f32 summation order, and it shards cleanly
        under the TP rules (aspects row-sharded -> psum over 'model').
      * training on a single TPU device: the fused Pallas
        dropout+mean kernel (ops/brand_pallas.py) -- draws the dropout
        mask from the hardware PRNG in both passes instead of storing it.
      * otherwise (CPU tests, multi-device GSPMD meshes): the XLA path,
        elementwise bernoulli on the product exactly like the reference.
    `mean=False` returns the legacy (B, A, C) weighted-aspect tensor.
    """

    brand_num: int
    num_aspects: int
    common_dim: int
    dtype: jnp.dtype = jnp.float32
    fused_dropout: Optional[bool] = None   # None = auto (TPU, 1 device)

    @nn.compact
    def __call__(self, brand_ids, *, deterministic: bool = True,
                 mean: bool = False):
        brand_embeddings = self.param(
            "brand_embeddings", nn.initializers.normal(1.0),
            (self.brand_num + 1, self.num_aspects))
        aspects = self.param(
            "aspects_embeddings", nn.initializers.normal(1.0),
            (self.num_aspects, self.common_dim))
        weights = l1_penalty(brand_embeddings[brand_ids])        # (B, A)
        if not mean:
            w_aspects = weights[:, :, None] * aspects[None, :, :]  # (B, A, C)
            return nn.Dropout(0.5, deterministic=deterministic)(w_aspects)

        if deterministic:
            return (weights @ aspects) / self.num_aspects
        fused = self.fused_dropout
        if fused is None:
            from fancyrec_tpu.ops.dispatch import portable_mode
            # auto mode also requires an MXU-lane-friendly common dim
            # (production is 1024; tiny test configs stay on XLA)
            fused = (not portable_mode()
                     and jax.default_backend() == "tpu"
                     and jax.device_count() == 1
                     and self.common_dim % 128 == 0)
        if fused:
            from fancyrec_tpu.ops.brand_pallas import aspect_dropout_mean
            # two 32-bit words: the kernel perturbs the second word by the
            # tile id, so a single word would fold the key space to 32 bits
            seed = jax.random.bits(self.make_rng("dropout"), (2,),
                                   jnp.uint32).astype(jnp.int32)
            return aspect_dropout_mean(weights, aspects, seed, 0.5)
        # XLA fallback: nn.Dropout on the product, exactly the legacy
        # path (same submodule name -> bit-identical rng stream)
        prod = weights[:, :, None] * aspects[None, :, :]
        prod = nn.Dropout(0.5, deterministic=False)(prod)
        return jnp.mean(prod, axis=1)
