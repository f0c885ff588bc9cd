"""Brand tower: learned aspect mixtures (reference model.py:389-428)."""

from __future__ import annotations

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
    """brand id -> (num_aspects, common_dim) weighted aspect vectors.

    A (brand_num+1, num_aspects) embedding of per-brand aspect weights
    (L1-penalized) scales a shared (num_aspects, common_dim) aspect matrix;
    dropout p=0.5 (torch nn.Dropout() default, reference model.py:417).
    The caller means over the aspect axis to get the brand embedding.
    """

    brand_num: int
    num_aspects: int
    common_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, brand_ids, *, deterministic: bool = True):
        brand_embeddings = self.param(
            "brand_embeddings", nn.initializers.normal(1.0),
            (self.brand_num + 1, self.num_aspects))
        aspects = self.param(
            "aspects_embeddings", nn.initializers.normal(1.0),
            (self.num_aspects, self.common_dim))
        weights = l1_penalty(brand_embeddings[brand_ids])        # (B, A)
        w_aspects = weights[:, :, None] * aspects[None, :, :]     # (B, A, C)
        w_aspects = nn.Dropout(0.5, deterministic=deterministic)(w_aspects)
        return w_aspects
