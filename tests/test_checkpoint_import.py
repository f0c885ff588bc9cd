"""Reference torch checkpoint -> fancyrec-tpu: full ingestion path.

Builds a torch composite model with the reference's module/parameter
naming, saves the reference checkpoint format ({'epoch','model'(list-form),
'best_rsum','opt','Eiters'} via torch.save), loads it through
checkpoints.load_any, and checks our forward equals the torch oracle's.
"""

import argparse
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from fancyrec_tpu.config import Config
from fancyrec_tpu.models import FancyRec
from fancyrec_tpu.models.encoders import TextBatch, VisualBatch
from fancyrec_tpu.train import checkpoints

from tests.test_tower_parity import (
    FEAT, RNN, KNUM, VSIZES, HID, VOCAB, BOWD, TSIZES,
    TorchVisualOracle, TorchTextTransformersOracle)

COMMON = 8
ASPECTS = 5
BRANDS = 3


class TorchBrandOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.brand_embeddings = tnn.Embedding(BRANDS + 1, ASPECTS)
        self.aspects_embeddings = tnn.Parameter(torch.randn(ASPECTS, COMMON))

    def forward(self, brand_ids):  # eval mode: dropout off
        w = self.brand_embeddings(brand_ids)
        wa = w.unsqueeze(2) * self.aspects_embeddings.unsqueeze(0)
        return wa.permute(1, 0, 2).mean(0)


class TorchFusionPH(tnn.Module):
    # the reference hardcodes the projection-head width at 512 (model.py:471)
    def __init__(self, in_dim):
        super().__init__()
        self.fc1 = tnn.Linear(in_dim, 512, bias=False)
        self.fc2 = tnn.Linear(512, COMMON)
        self.projection_head = tnn.Sequential(
            self.fc1, tnn.BatchNorm1d(512), tnn.ReLU(), self.fc2)

    def forward(self, v, t):
        return self.projection_head(torch.cat((v, t), 1))


def test_reference_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(0)
    vid = TorchVisualOracle().eval()
    txt = TorchTextTransformersOracle().eval()
    brand = TorchBrandOracle().eval()
    fusion = TorchFusionPH(16).eval()
    # make BN stats non-trivial
    with torch.no_grad():
        bn = fusion.projection_head[1]
        bn.running_mean.uniform_(-0.3, 0.3)
        bn.running_var.uniform_(0.5, 1.5)

    opt = argparse.Namespace(
        trainCollection="insCartrain", valCollection="insCarval",
        testCollection="insCartest", brand_num=BRANDS, brand_aspect=ASPECTS,
        common_embedding_size=COMMON, visual_rnn_size=RNN,
        visual_feat_dim=FEAT, visual_kernel_num=KNUM,
        visual_kernel_sizes=list(VSIZES), text_kernel_num=KNUM,
        text_kernel_sizes=list(TSIZES),
        text_transformers_hidden_size=HID, text_net="transformers",
        fusion_style="ph", concate="full", cost_style="mean", loss_fun="cl",
        text_mapping_size=[0, 8], visual_mapping_size=[0, 8],
        vocab="word_vocab_5", metric="auc", cv_name="FancyRec",
        optimizer=object(),   # the reference stores the optimizer object here
    )
    ckpt_path = str(tmp_path / "model_best.pth.tar")
    torch.save({
        "epoch": 7,
        "model": [vid.state_dict(), txt.state_dict(), brand.state_dict(),
                  fusion.state_dict()],
        "best_rsum": 123.4,
        "opt": opt,
        "Eiters": 999,
    }, ckpt_path)

    loaded = checkpoints.load_any(ckpt_path)
    cfg: Config = loaded["config"]
    assert loaded["epoch"] == 7 and loaded["Eiters"] == 999
    assert cfg.brand_num == BRANDS
    assert cfg.text_mapping_size == 8 and cfg.visual_mapping_size == 8
    # kernel-size lists survive the list-form opt
    assert cfg.text_kernel_sizes_list == list(TSIZES)

    # our model with the imported weights must match the torch composite
    model = FancyRec(cfg)
    variables = {"params": loaded["model"]["params"]}
    if loaded["model"]["batch_stats"]:
        variables["batch_stats"] = loaded["model"]["batch_stats"]

    rng = np.random.RandomState(0)
    B, T, TT = 3, 6, 8
    lengths, tlens = [6, 4, 2], [8, 5, 2]
    frames = rng.randn(B, T, FEAT).astype(np.float32)
    vmask = (np.arange(T)[None] < np.array(lengths)[:, None]).astype(np.float32)
    frames *= vmask[..., None]
    origin = rng.randn(B, FEAT).astype(np.float32)
    tokens = rng.randint(1, VOCAB, (B, TT))
    tmask = (np.arange(TT)[None] < np.array(tlens)[:, None]).astype(np.int64)
    tokens *= tmask
    bows = rng.randn(B, BOWD).astype(np.float32)
    brand_ids = np.array([0, 1, 2])

    with torch.no_grad():
        bv = brand(torch.tensor(brand_ids))
        vv = vid(torch.tensor(frames), torch.tensor(origin), lengths,
                 torch.tensor(vmask))
        tv = txt(torch.tensor(bows), torch.tensor(tokens),
                 torch.zeros(B, TT, dtype=torch.long), torch.tensor(tmask))
        pv = fusion(vv, tv)

    got_b, got_p = model.apply(
        variables, jnp.asarray(brand_ids),
        VisualBatch(jnp.asarray(frames), jnp.asarray(origin),
                    jnp.asarray(vmask)),
        TextBatch(jnp.asarray(bows), jnp.asarray(tokens),
                  jnp.zeros((B, TT), jnp.int32), jnp.asarray(tmask)),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(got_b), bv.numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(got_p), pv.numpy(),
                               atol=5e-5, rtol=5e-5)
