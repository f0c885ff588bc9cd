"""Full-tower golden tests: torch oracles of the reference encoder
compositions vs our Flax towers, weights shared via the production
torch-import shims (fancyrec_tpu.models.torch_import).

The torch oracles reproduce the reference forward semantics
(model.py:150-210 visual, model.py:330-385 text-transformers,
model.py:406-428 brand, model.py:463-491 ph fusion) with parameter names
matching the reference so the import shims apply verbatim.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fancyrec_tpu.models.bert import BertConfig
from fancyrec_tpu.models.encoders import (
    TextBatch, TextTransformersEncoder, VisualBatch, VisualEncoder)
from fancyrec_tpu.models import torch_import

TOL = dict(atol=5e-5, rtol=5e-5)
FEAT, RNN, KNUM = 10, 6, 4
VSIZES = (2, 3)


class TorchVisualOracle(tnn.Module):
    """Reference VisualEncoder semantics, eval mode, concate='full'."""

    def __init__(self):
        super().__init__()
        self.rnn = tnn.GRU(FEAT, RNN, batch_first=True, bidirectional=True)
        self.atten = tnn.Module()
        self.atten.w_1 = tnn.Linear(FEAT, FEAT // 4, bias=False)
        self.atten.w_2 = tnn.Linear(FEAT // 4, 3, bias=False)
        self.convs1 = tnn.ModuleList([
            tnn.Conv2d(1, KNUM, (ws, 2 * RNN), padding=(ws - 1, 0))
            for ws in VSIZES])
        self.visual_mapping = tnn.Module()
        self.visual_mapping.fc1 = tnn.Linear(
            2 * FEAT + 2 * RNN + KNUM * len(VSIZES), 8)

    def forward(self, videos, videos_origin, lengths, mask):
        org_out = videos_origin
        # attention pool with per-sample valid softmax (model.py:105-114)
        a = self.atten.w_2(torch.tanh(self.atten.w_1(videos))).mean(-1, keepdim=True)
        weight = torch.zeros_like(a)
        for i in range(videos.size(0)):
            weight[i, : lengths[i]] = torch.softmax(a[i, : lengths[i]], dim=0)
        attn_out = (weight * videos).mean(dim=1)

        gru_init, _ = self.rnn(videos)
        gru_out = torch.stack([gru_init[i, : lengths[i]].mean(0)
                               for i in range(videos.size(0))])

        masked = gru_init * mask.unsqueeze(2)
        cin = masked.unsqueeze(1)
        cons = [F.relu(c(cin)).squeeze(3) for c in self.convs1]
        cons = [F.max_pool1d(o, o.size(2)).squeeze(2) for o in cons]
        con_out = torch.cat(cons, 1)

        feats = torch.cat((gru_out, con_out, org_out, attn_out), 1)
        return F.relu(self.visual_mapping.fc1(feats))


def test_visual_tower_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchVisualOracle().eval()
    B, T = 3, 6
    lengths = [6, 4, 2]
    rng = np.random.RandomState(0)
    frames = rng.randn(B, T, FEAT).astype(np.float32)
    mask_np = (np.arange(T)[None] < np.array(lengths)[:, None]).astype(np.float32)
    frames = frames * mask_np[..., None]  # zero-padded, as the collate emits
    origin = rng.randn(B, FEAT).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.tensor(frames), torch.tensor(origin),
                      lengths, torch.tensor(mask_np))

    enc = VisualEncoder(rnn_size=RNN, feat_dim=FEAT, kernel_num=KNUM,
                        kernel_sizes=VSIZES, mapping_out=8, concate="full")
    params = torch_import.visual_encoder_params(oracle.state_dict(), VSIZES)

    # pad to a bigger static T to prove batch-max semantics hold
    T_pad = 9
    fpad = np.zeros((B, T_pad, FEAT), np.float32)
    fpad[:, :T] = frames
    mpad = np.zeros((B, T_pad), np.float32)
    mpad[:, :T] = mask_np
    got = enc.apply({"params": params},
                    VisualBatch(jnp.asarray(fpad), jnp.asarray(origin),
                                jnp.asarray(mpad)),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


# ---------------------------------------------------------------------------

HID, VOCAB, BOWD = 24, 97, 15
TSIZES = (2, 3)


class TorchTextTransformersOracle(tnn.Module):
    """Reference TextTransformersEncoder semantics, eval, concate='full'."""

    def __init__(self):
        super().__init__()
        from transformers import BertConfig as HFConfig
        from transformers import BertModel
        self.model = BertModel(HFConfig(
            vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=3,
            num_attention_heads=12, intermediate_size=48,
            max_position_embeddings=32, type_vocab_size=2,
            attn_implementation="eager"))
        self.convs1 = tnn.ModuleList([
            tnn.Conv2d(1, KNUM, (ws, HID), padding=(ws - 1, 0))
            for ws in TSIZES])
        self.text_mapping = tnn.Module()
        self.text_mapping.fc1 = tnn.Linear(BOWD + HID + KNUM * len(TSIZES), 8)

    def forward(self, bows, tokens, type_ids, mask):
        last = self.model(input_ids=tokens, token_type_ids=type_ids,
                          attention_mask=mask)[0]
        tf_out = torch.stack([last[i, : int(mask[i].sum())].mean(0)
                              for i in range(tokens.size(0))])
        cin = last.unsqueeze(1)
        cons = [F.relu(c(cin)).squeeze(3) for c in self.convs1]
        cons = [F.max_pool1d(o, o.size(2)).squeeze(2) for o in cons]
        con_out = torch.cat(cons, 1)
        feats = torch.cat((bows, tf_out, con_out), 1)
        return F.relu(self.text_mapping.fc1(feats))


def test_text_transformers_tower_matches_torch_oracle():
    torch.manual_seed(1)
    oracle = TorchTextTransformersOracle().eval()
    B, T = 3, 8
    lengths = [8, 5, 2]
    rng = np.random.RandomState(1)
    tokens = rng.randint(1, VOCAB, (B, T))
    mask_np = (np.arange(T)[None] < np.array(lengths)[:, None]).astype(np.int64)
    tokens = tokens * mask_np  # pad id 0 beyond lengths (HF tokenizer does this)
    types = np.zeros((B, T), np.int64)
    bows = rng.randn(B, BOWD).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.tensor(bows), torch.tensor(tokens),
                      torch.tensor(types), torch.tensor(mask_np))

    cfg = BertConfig(vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=3,
                     num_attention_heads=12, intermediate_size=48,
                     max_position_embeddings=32, type_vocab_size=2)
    enc = TextTransformersEncoder(bert=cfg, kernel_num=KNUM,
                                  kernel_sizes=TSIZES, mapping_out=8,
                                  concate="full")
    params = torch_import.text_transformers_encoder_params(
        oracle.state_dict(), TSIZES, cfg)

    T_pad = 12  # bigger static pad: positions beyond batch-max must not leak
    tpad = np.zeros((B, T_pad), np.int64)
    tpad[:, :T] = tokens
    mpad = np.zeros((B, T_pad), np.int64)
    mpad[:, :T] = mask_np
    got = enc.apply({"params": params},
                    TextBatch(jnp.asarray(bows), jnp.asarray(tpad),
                              jnp.zeros((B, T_pad), jnp.int32),
                              jnp.asarray(mpad)),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)
