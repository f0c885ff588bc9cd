"""The FancyRec composite model (reference model.py:538-649)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from fancyrec_tpu.config import Config
from fancyrec_tpu.models.bert import BertConfig
from fancyrec_tpu.models.brand import BrandAspects
from fancyrec_tpu.models.encoders import (
    TextBatch, TextGruEncoder, TextTransformersEncoder, VisualBatch,
    VisualEncoder)
from fancyrec_tpu.models.fusion import (
    FusionAttnReduction, FusionFC, FusionProjectionHead)


class FancyRec(nn.Module):
    """brand ids + visual batch + text batch -> (brand_embs, post_embs).

    Tower composition mirrors the reference: brand aspects tower always;
    visual/text towers unless the single-modal flags cut one; fusion head
    selected by fusion_style (fc | ph | attn).
    """

    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        attn_fusion = cfg.fusion_style == "attn"

        self.brand_encoding = BrandAspects(
            brand_num=cfg.brand_num, num_aspects=cfg.brand_aspect,
            common_dim=cfg.common_embedding_size, dtype=dtype)

        if not cfg.single_modal_text:
            self.vid_encoding = VisualEncoder(
                rnn_size=cfg.visual_rnn_size, feat_dim=cfg.visual_feat_dim,
                kernel_num=cfg.visual_kernel_num,
                kernel_sizes=tuple(cfg.visual_kernel_sizes_list),
                mapping_out=cfg.visual_mapping_size,
                dropout=cfg.dropout, concate=cfg.concate, level=cfg.level_vis,
                norm=cfg.visual_norm, attn_fusion=attn_fusion,
                seq_shard=cfg.seq_shard, dtype=dtype)

        if not cfg.single_modal_visual:
            if cfg.text_net == "bi-gru":
                self.text_encoding = TextGruEncoder(
                    vocab_size=cfg.vocab_size, word_dim=cfg.word_dim,
                    rnn_size=cfg.text_rnn_size,
                    kernel_num=cfg.text_kernel_num,
                    kernel_sizes=tuple(cfg.text_kernel_sizes_list),
                    mapping_out=cfg.text_mapping_size,
                    dropout=cfg.dropout, concate=cfg.concate,
                    norm=cfg.text_norm, attn_fusion=attn_fusion, dtype=dtype)
            elif cfg.text_net == "transformers":
                self.text_encoding = TextTransformersEncoder(
                    bert=BertConfig(
                        vocab_size=cfg.bert_vocab_size,
                        hidden_size=cfg.text_transformers_hidden_size,
                        num_hidden_layers=cfg.bert_num_layers,
                        num_attention_heads=cfg.bert_num_heads,
                        intermediate_size=cfg.bert_intermediate_size,
                        max_position_embeddings=cfg.bert_max_position,
                        type_vocab_size=cfg.bert_type_vocab,
                        hidden_dropout_prob=cfg.bert_dropout,
                        attention_probs_dropout_prob=cfg.bert_dropout,
                        remat=cfg.bert_remat,
                        compute_dtype=cfg.dtype or "float32"),
                    kernel_num=cfg.text_kernel_num,
                    kernel_sizes=tuple(cfg.text_kernel_sizes_list),
                    mapping_out=cfg.text_mapping_size,
                    dropout=cfg.dropout, concate=cfg.concate,
                    level=cfg.level_txt, norm=cfg.text_norm,
                    attn_fusion=attn_fusion, seq_shard=cfg.seq_shard,
                    pp_stages=cfg.pp_stages, dtype=dtype)
            else:
                raise ValueError("unknown text_net: %s" % cfg.text_net)

        if cfg.fusion_style == "fc":
            self.fusion_encoding = FusionFC(
                common_dim=cfg.common_embedding_size,
                single_modal_visual=cfg.single_modal_visual,
                single_modal_text=cfg.single_modal_text, dtype=dtype)
        elif cfg.fusion_style == "ph":
            self.fusion_encoding = FusionProjectionHead(
                common_dim=cfg.common_embedding_size,
                prj_head_output=cfg.prj_head_output, dtype=dtype)
        elif cfg.fusion_style == "attn":
            self.fusion_encoding = FusionAttnReduction(
                common_dim=cfg.common_embedding_size,
                visual_size=cfg.visual_mapping_in,
                text_size=cfg.text_mapping_in, dtype=dtype)
        else:
            raise ValueError("unknown fusion_style: %s" % cfg.fusion_style)

    # ------------------------------------------------------------------

    def embed_brand(self, brand_ids, *, deterministic: bool = True):
        # mean over the aspect axis (model.py:594), computed without the
        # (B, aspects, common) intermediate -- see BrandAspects.__call__
        return self.brand_encoding(brand_ids, deterministic=deterministic,
                                   mean=True)

    def embed_vis(self, v: VisualBatch, *, deterministic: bool = True):
        return self.vid_encoding(v, deterministic=deterministic)

    def embed_txt(self, t: TextBatch, *, deterministic: bool = True):
        return self.text_encoding(t, deterministic=deterministic)

    def embed_post(self, videos: Optional[VisualBatch],
                   captions: Optional[TextBatch], *,
                   deterministic: bool = True):
        """Fused post embedding without the brand tower (the serving
        encode: reference evaluator.py:38-81 only ever consumes the post
        half of forward())."""
        cfg = self.cfg
        if cfg.single_modal_visual:
            return self.embed_vis(videos, deterministic=deterministic)
        if cfg.single_modal_text:
            return self.embed_txt(captions, deterministic=deterministic)
        vid_emb = self.embed_vis(videos, deterministic=deterministic)
        cap_emb = self.embed_txt(captions, deterministic=deterministic)
        return self.fusion_encoding(
            vid_emb, cap_emb, deterministic=deterministic)

    def __call__(self, brand_ids, videos: Optional[VisualBatch],
                 captions: Optional[TextBatch], *, deterministic: bool = True):
        brand_embs = self.embed_brand(brand_ids, deterministic=deterministic)
        post_embs = self.embed_post(videos, captions,
                                    deterministic=deterministic)
        return brand_embs, post_embs
