"""Dual-branch multi-level encoders (visual / text).

TPU-first rewrites of the reference towers (model.py:118-385): every
per-sample loop is a masked vectorized op, the GRU is a lax.scan with the
heavy input projection hoisted out, and all shapes are static (batches are
padded to fixed maxima with dynamic batch-max lengths bounding the valid
regions so the numerics match the reference's pad-to-batch-max behavior).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fancyrec_tpu.models.bert import BertConfig, BertEncoder
from fancyrec_tpu.models.gru import BiGRU
from fancyrec_tpu.models.layers import (
    MFC, AttentionPool, ConvBank, batch_max_len, constrain_seq_sharding,
    l2norm, masked_mean)


class VisualBatch(NamedTuple):
    """Matches the reference video_data tuple (data_provider.py:58)."""
    frames: jnp.ndarray        # (B, T, D) zero-padded frame features
    mean_origin: jnp.ndarray   # (B, D) mean over *all* frames of the clip
    mask: jnp.ndarray          # (B, T) 0/1 valid-frame mask


class TextBatch(NamedTuple):
    """Union of the bi-gru / transformers text tuples."""
    bows: jnp.ndarray            # (B, V) bag-of-words counts
    tokens: jnp.ndarray          # (B, T) word ids (rnn) or WordPiece ids (bert)
    type_ids: jnp.ndarray        # (B, T) segment ids (bert path; zeros for rnn)
    mask: jnp.ndarray            # (B, T) 0/1 valid-token mask


class VisualEncoder(nn.Module):
    """Multi-level video encoder (reference model.py:118-219).

    level 1: mean of raw frames + attention-pooled frames
    level 2: bi-GRU, per-sample masked mean
    level 3: 1D-CNN bank over masked GRU outputs, global max-pool
    """

    rnn_size: int
    feat_dim: int
    kernel_num: int
    kernel_sizes: Sequence[int]
    mapping_out: int
    dropout: float = 0.2
    concate: str = "full"
    level: str = "1+2+3"
    norm: bool = False
    attn_fusion: bool = False   # fusion_style == 'attn' skips the mapping
    seq_shard: bool = False     # sequence-parallel frame axis
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v: VisualBatch, *, deterministic: bool = True):
        mask = v.mask.astype(self.dtype)
        bl = batch_max_len(mask)

        org_out = v.mean_origin
        attn_out = AttentionPool(hidden=self.feat_dim // 4, heads=3,
                                 dtype=self.dtype, name="atten")(v.frames, mask)

        gru_seq = BiGRU(self.rnn_size, packed=False, dtype=self.dtype,
                        name="rnn")(v.frames, batch_len=bl)
        gru_seq = constrain_seq_sharding(gru_seq, self.seq_shard)
        gru_out = masked_mean(gru_seq, mask)
        gru_out = nn.Dropout(self.dropout, deterministic=deterministic)(gru_out)

        masked_seq = gru_seq * mask[..., None]
        con_out = ConvBank(self.kernel_num, self.kernel_sizes,
                           dtype=self.dtype, name="convs")(masked_seq, bl)
        con_out = nn.Dropout(self.dropout, deterministic=deterministic)(con_out)

        if self.concate == "full":
            features = jnp.concatenate([gru_out, con_out, org_out, attn_out], 1)
        else:  # 'reduced' ablations (reference model.py:188-202)
            lv = self.level
            if lv == "1+2":
                features = jnp.concatenate([gru_out, org_out, attn_out], 1)
            elif lv == "1+3":
                features = jnp.concatenate([con_out, org_out, attn_out], 1)
            elif lv == "2+3":
                features = jnp.concatenate([gru_out, con_out], 1)
            elif lv == "1":
                features = jnp.concatenate([org_out, attn_out], 1)
            elif lv == "2":
                features = gru_out
            elif lv == "3":
                features = con_out
            else:
                features = jnp.concatenate([gru_out, con_out, org_out, attn_out], 1)

        if not self.attn_fusion:
            features = MFC(self.mapping_out, self.dropout, dtype=self.dtype,
                           name="visual_mapping")(features, deterministic=deterministic)
            if self.norm:
                features = l2norm(features)
        return features


class TextGruEncoder(nn.Module):
    """bi-gru text tower (reference model.py:223-304).

    level 1: BoW; level 2: packed bi-GRU masked mean; level 3: CNN bank.
    """

    vocab_size: int
    word_dim: int
    rnn_size: int
    kernel_num: int
    kernel_sizes: Sequence[int]
    mapping_out: int
    dropout: float = 0.2
    concate: str = "full"
    norm: bool = False
    attn_fusion: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: TextBatch, *, deterministic: bool = True):
        mask = t.mask.astype(self.dtype)
        lengths = jnp.sum(t.mask, axis=1).astype(jnp.int32)
        bl = batch_max_len(mask)

        org_out = t.bows

        def _uniform_pm(key, shape, dtype=jnp.float32):
            # reference init U(-0.1, 0.1) (model.py:256)
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        embed = self.param("embed", _uniform_pm, (self.vocab_size, self.word_dim))
        wids = embed[t.tokens]

        gru_seq = BiGRU(self.rnn_size, packed=True, dtype=self.dtype,
                        name="rnn")(wids, lengths=lengths)
        gru_out = masked_mean(gru_seq, mask)
        gru_out = nn.Dropout(self.dropout, deterministic=deterministic)(gru_out)

        con_out = ConvBank(self.kernel_num, self.kernel_sizes,
                           dtype=self.dtype, name="convs")(gru_seq, bl)
        con_out = nn.Dropout(self.dropout, deterministic=deterministic)(con_out)

        if self.concate == "full":
            features = jnp.concatenate([org_out, gru_out, con_out], 1)
        else:
            features = jnp.concatenate([gru_out, con_out], 1)

        if not self.attn_fusion:
            features = MFC(self.mapping_out, self.dropout, dtype=self.dtype,
                           name="text_mapping")(features, deterministic=deterministic)
            if self.norm:
                features = l2norm(features)
        return features


class TextTransformersEncoder(nn.Module):
    """Transformer text tower -- the recipe default (reference model.py:308-385).

    level 1: BoW; level 2: masked mean of a 3-layer BERT's last hidden;
    level 3: CNN bank over the last hidden states. The reference convolves
    the *unmasked* last_hidden (pad-token outputs included up to the batch
    max token count) -- replicated by zeroing only beyond the batch max.
    """

    bert: BertConfig
    kernel_num: int
    kernel_sizes: Sequence[int]
    mapping_out: int
    dropout: float = 0.2
    concate: str = "full"
    level: str = "1+2+3"
    norm: bool = False
    attn_fusion: bool = False
    seq_shard: bool = False     # sequence-parallel token axis
    pp_stages: int = 0          # GPipe the BERT layer stack over 'model'
    dtype: jnp.dtype = jnp.float32

    def _pp_mesh(self):
        """The ambient mesh iff it can host the configured pipeline:
        a 'model' axis exactly pp_stages wide. Anything else (no mesh --
        e.g. a tester loading a pp-trained checkpoint on one device --
        or a mesh without the stage axis) falls back to the sequential
        encoder, which is numerically the same model."""
        if self.pp_stages <= 1 or self.is_initializing():
            return None
        mesh = jax.sharding.get_abstract_mesh()
        if "model" not in mesh.axis_names:
            return None
        return mesh if dict(mesh.shape)["model"] == self.pp_stages else None

    @nn.compact
    def __call__(self, t: TextBatch, *, deterministic: bool = True):
        mask = t.mask
        bl = batch_max_len(mask)

        org_out = t.bows
        pp_mesh = self._pp_mesh()
        if pp_mesh is not None:
            from fancyrec_tpu.parallel.pipeline import bert_pipeline_forward
            # the production BertEncoder param tree, created by the
            # (sequential) init pass -- pipelining is a scale-out of the
            # same model, so checkpoints are layout-identical either way
            bert_params = self.variables["params"]["bert"]
            rng = (None if deterministic
                   else self.make_rng("dropout"))
            last_hidden = bert_pipeline_forward(
                bert_params, self.bert, t.tokens, t.type_ids, mask,
                mesh=pp_mesh, axis="model",
                deterministic=deterministic, rng=rng)
        else:
            last_hidden = BertEncoder(self.bert, name="bert")(
                t.tokens, t.type_ids, mask, deterministic=deterministic)
        last_hidden = constrain_seq_sharding(last_hidden, self.seq_shard)
        tf_out = masked_mean(last_hidden, mask.astype(last_hidden.dtype))

        # zero static padding beyond the batch-max token count: those
        # positions are the reference's implicit conv zero-pad region
        pos_valid = (jnp.arange(mask.shape[1])[None, :] < bl)[..., None]
        conv_in = jnp.where(pos_valid, last_hidden, 0.0)
        con_out = ConvBank(self.kernel_num, self.kernel_sizes,
                           dtype=self.dtype, name="convs")(conv_in, bl)
        con_out = nn.Dropout(self.dropout, deterministic=deterministic)(con_out)

        if self.concate == "full":
            features = jnp.concatenate([org_out, tf_out, con_out], 1)
        else:
            lv = self.level
            if lv == "1+2":
                features = jnp.concatenate([org_out, tf_out], 1)
            elif lv == "1+3":
                features = jnp.concatenate([org_out, con_out], 1)
            elif lv == "2+3":
                features = jnp.concatenate([tf_out, con_out], 1)
            elif lv == "1":
                features = org_out
            elif lv == "2":
                features = tf_out
            elif lv == "3":
                features = con_out
            else:
                features = jnp.concatenate([org_out, tf_out, con_out], 1)

        if not self.attn_fusion:
            features = MFC(self.mapping_out, self.dropout, dtype=self.dtype,
                           name="text_mapping")(features, deterministic=deterministic)
            if self.norm:
                features = l2norm(features)
        return features
