"""BERT encoder, implemented natively in Flax.

The reference text tower is HuggingFace BertModel truncated to 3 hidden
layers / 12 heads over bert-base-uncased weights (reference model.py:317-319).
This is a from-scratch implementation of that architecture with a weight
shim (params_from_torch) that ingests a HF/torch state dict when one is
available on disk; with zero egress the model also runs from random init.

Numerics follow the HF eager path: erf-GELU, post-LayerNorm (eps 1e-12),
additive attention mask of dtype-min on padded keys, scores scaled by
1/sqrt(head_dim). The whole encoder is one jittable function; attention is
a pair of batched einsums that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    remat: bool = False   # rematerialize each layer (memory <-> FLOPs)
    # computation dtype for the matmul-heavy path ("float32"/"bfloat16").
    # Params stay f32 (mixed precision); "float32" is bit-identical to
    # the pre-dtype program. Softmax and LayerNorm statistics stay f32.
    compute_dtype: str = "float32"

    @property
    def _dt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" \
            else jnp.float32


def _dense(features, cfg, name):
    return nn.Dense(
        features,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        bias_init=nn.initializers.zeros,
        dtype=cfg._dt,
        name=name,
    )


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, *, deterministic: bool = True):
        cfg = self.cfg
        b, t, d = hidden.shape
        h = cfg.num_attention_heads
        dh = d // h
        q = _dense(d, cfg, "query")(hidden).reshape(b, t, h, dh)
        k = _dense(d, cfg, "key")(hidden).reshape(b, t, h, dh)
        v = _dense(d, cfg, "value")(hidden).reshape(b, t, h, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(dh).astype(scores.dtype)
        scores = scores + attn_bias  # (B,1,1,T) additive mask
        probs = jax.nn.softmax(scores, axis=-1)      # f32 (MXU accum dtype)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob,
                           deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(cfg._dt), v,
                         preferred_element_type=jnp.float32)
        return ctx.reshape(b, t, d)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool = True):
        cfg = self.cfg
        ctx = BertSelfAttention(cfg, name="attention")(
            hidden, attn_bias, deterministic=deterministic)
        attn_out = _dense(cfg.hidden_size, cfg, "attention_output")(ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob,
                              deterministic=deterministic)(attn_out)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="attention_ln")(hidden + attn_out)
        inter = _dense(cfg.intermediate_size, cfg, "intermediate")(hidden)
        inter = jax.nn.gelu(inter, approximate=False)
        out = _dense(cfg.hidden_size, cfg, "output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob,
                         deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_ln")(hidden + out)


class BertEncoder(nn.Module):
    """input_ids, token_type_ids, attention_mask -> last_hidden (B, T, H)."""

    cfg: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, token_type_ids, attention_mask,
                 *, deterministic: bool = True):
        cfg = self.cfg
        b, t = input_ids.shape
        emb_init = nn.initializers.normal(cfg.initializer_range)
        word = self.param("word_embeddings", emb_init,
                          (cfg.vocab_size, cfg.hidden_size))
        pos = self.param("position_embeddings", emb_init,
                         (cfg.max_position_embeddings, cfg.hidden_size))
        typ = self.param("token_type_embeddings", emb_init,
                         (cfg.type_vocab_size, cfg.hidden_size))
        hidden = (word[input_ids] + pos[jnp.arange(t)][None]
                  + typ[token_type_ids])
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="embeddings_ln")(hidden)
        hidden = nn.Dropout(cfg.hidden_dropout_prob,
                            deterministic=deterministic)(hidden)
        hidden = hidden.astype(cfg._dt)   # residual stream compute dtype

        mask = attention_mask.astype(jnp.float32)
        attn_bias = (1.0 - mask)[:, None, None, :] * jnp.finfo(jnp.float32).min

        layer_cls = nn.remat(BertLayer, static_argnums=(3,)) if cfg.remat else BertLayer
        for i in range(cfg.num_hidden_layers):
            hidden = layer_cls(cfg, name="layer_%d" % i)(
                hidden, attn_bias, deterministic)
        return hidden

    # ------------------------------------------------------------------
    @staticmethod
    def params_from_torch(sd: Dict[str, Any], cfg: Optional[BertConfig] = None) -> dict:
        """Convert a HF BertModel state dict (torch tensors or numpy) to
        this module's param tree. Only the first cfg.num_hidden_layers
        layers are taken, mirroring BertConfig(num_hidden_layers=3) over
        full bert-base weights (reference model.py:317-319)."""
        import numpy as np

        cfg = cfg or BertConfig()
        a = lambda k: np.asarray(sd[k])
        lin = lambda k: {"kernel": a(k + ".weight").T, "bias": a(k + ".bias")}
        ln = lambda k: {"scale": a(k + ".weight"), "bias": a(k + ".bias")}

        params = {
            "word_embeddings": a("embeddings.word_embeddings.weight"),
            "position_embeddings": a("embeddings.position_embeddings.weight"),
            "token_type_embeddings": a("embeddings.token_type_embeddings.weight"),
            "embeddings_ln": ln("embeddings.LayerNorm"),
        }
        for i in range(cfg.num_hidden_layers):
            p = "encoder.layer.%d." % i
            params["layer_%d" % i] = {
                "attention": {
                    "query": lin(p + "attention.self.query"),
                    "key": lin(p + "attention.self.key"),
                    "value": lin(p + "attention.self.value"),
                },
                "attention_output": lin(p + "attention.output.dense"),
                "attention_ln": ln(p + "attention.output.LayerNorm"),
                "intermediate": lin(p + "intermediate.dense"),
                "output": lin(p + "output.dense"),
                "output_ln": ln(p + "output.LayerNorm"),
            }
        return params
