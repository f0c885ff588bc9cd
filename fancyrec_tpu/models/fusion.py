"""Multi-modal fusion heads (reference model.py:432-534)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fancyrec_tpu.models.layers import (
    BatchNorm1dTorch, torch_linear_init, xavier_uniform_torch)


class FusionFC(nn.Module):
    """Single-FC fusion, with single-modal variants (reference model.py:432-459)."""

    common_dim: int
    single_modal_visual: bool = False
    single_modal_text: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_embs, text_embs, *, deterministic: bool = True):
        if self.single_modal_visual:
            x = visual_embs
        elif self.single_modal_text:
            x = text_embs
        else:
            x = jnp.concatenate([visual_embs, text_embs], 1)
        return nn.Dense(self.common_dim, kernel_init=xavier_uniform_torch(),
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="fc")(x)


class FusionProjectionHead(nn.Module):
    """SimCLR-style projection head -- the recipe default (model.py:463-491).

    concat -> Dense(512, no bias) -> BatchNorm -> ReLU -> Dense(common).
    Quirk preserved: with prj_head_output=True the *pre-head* concat is
    returned (inverted vs. its CLI help text; reference model.py:484-487).
    """

    common_dim: int
    prj_head_output: bool = False
    hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_embs, text_embs, *, deterministic: bool = True):
        x = jnp.concatenate([visual_embs, text_embs], 1)
        if self.prj_head_output:
            return x
        x = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     kernel_init=xavier_uniform_torch(), name="fc1")(x)
        x = BatchNorm1dTorch(self.hidden, name="bn")(
            x, use_running_average=deterministic)
        x = nn.relu(x)
        return nn.Dense(self.common_dim, kernel_init=xavier_uniform_torch(),
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="fc2")(x)


class FusionAttnReduction(nn.Module):
    """Bilinear cross-modal attention fusion (reference model.py:495-534).

    Consumes the *unmapped* level-concat vectors (the encoders skip MFC when
    fusion_style == 'attn'). alpha is a (B, t_size, v_size) attention map --
    outer products expressed as einsums so XLA keeps it fused.
    """

    common_dim: int
    visual_size: int   # unmapped visual concat width
    text_size: int     # unmapped text concat width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_embs, text_embs, *, deterministic: bool = True):
        # torch Linear(1, N, bias=False) on (..., 1) == outer product with
        # w; torch's default init at fan_in=1 is U(-1, 1) (model.py:504-505)
        d = torch_linear_init(1)
        w_vis = self.param("vis_linear", d, (self.text_size,))
        w_txt = self.param("text_linear", d, (self.visual_size,))
        b = self.param("b", nn.initializers.zeros, (self.visual_size,))

        # (B,t,v) maps: vis_attn[b,t,v] = visual[b,v] * w_vis[t]
        vis_attn = jnp.einsum("bv,t->btv", visual_embs, w_vis)
        txt_attn = jnp.einsum("bt,v->btv", text_embs, w_txt)
        alpha = jax.nn.softmax(jnp.tanh(vis_attn + txt_attn + b[None, None, :]),
                               axis=1)

        visual_score = jnp.einsum("btv,bv->bt", alpha, visual_embs)
        text_score = jnp.einsum("btv,bt->bv", alpha, text_embs)

        # the reference leaves these on torch's DEFAULT Linear init (no
        # xavier here, model.py:511-512)
        fv = nn.Dense(self.common_dim, name="fusion_visual_linear",
                      kernel_init=torch_linear_init(self.text_size),
                      bias_init=torch_linear_init(self.text_size),
                      dtype=self.dtype)(visual_score)
        ft = nn.Dense(self.common_dim, name="fusion_text_linear",
                      kernel_init=torch_linear_init(self.visual_size),
                      bias_init=torch_linear_init(self.visual_size),
                      dtype=self.dtype)(text_score)
        return nn.relu(fv + ft)
