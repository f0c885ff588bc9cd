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


# ---------------------------------------------------------------------------
# full-size synthetic key-coverage dry runs for the pretrained-weight shims
# (no pretrained files exist in this offline environment; these pin the
# KEY SET and SHAPES of torchvision resnet152 / HF bert-base-uncased so a
# real checkpoint imports without missing/mis-shaped entries)


def _tracking(sd):
    consumed = set()

    class T(dict):
        def __getitem__(self, k):
            consumed.add(k)
            return dict.__getitem__(self, k)

        def __contains__(self, k):
            return dict.__contains__(self, k)

    return T(sd), consumed


def _synthetic_torchvision_resnet152_sd():
    """Every key of torchvision.models.resnet152().state_dict() with the
    exact torchvision shapes (torchvision itself is not installed here)."""
    sd = {}

    def bn(prefix, ch):
        sd[prefix + ".weight"] = np.random.randn(ch).astype(np.float32)
        sd[prefix + ".bias"] = np.random.randn(ch).astype(np.float32)
        sd[prefix + ".running_mean"] = np.random.randn(ch).astype(np.float32)
        sd[prefix + ".running_var"] = np.abs(
            np.random.randn(ch)).astype(np.float32) + 0.5
        sd[prefix + ".num_batches_tracked"] = np.asarray(1, np.int64)

    sd["conv1.weight"] = np.random.randn(64, 3, 7, 7).astype(np.float32)
    bn("bn1", 64)
    inplanes = 64
    for stage, (n_blocks, planes) in enumerate(
            zip((3, 8, 36, 3), (64, 128, 256, 512))):
        for b in range(n_blocks):
            p = "layer%d.%d." % (stage + 1, b)
            sd[p + "conv1.weight"] = np.random.randn(
                planes, inplanes, 1, 1).astype(np.float32)
            bn(p + "bn1", planes)
            sd[p + "conv2.weight"] = np.random.randn(
                planes, planes, 3, 3).astype(np.float32)
            bn(p + "bn2", planes)
            sd[p + "conv3.weight"] = np.random.randn(
                planes * 4, planes, 1, 1).astype(np.float32)
            bn(p + "bn3", planes * 4)
            if b == 0:
                sd[p + "downsample.0.weight"] = np.random.randn(
                    planes * 4, inplanes, 1, 1).astype(np.float32)
                bn(p + "downsample.1", planes * 4)
            inplanes = planes * 4
    sd["fc.weight"] = np.random.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = np.random.randn(1000).astype(np.float32)
    return sd


@pytest.mark.slow
def test_resnet152_torch_import_full_key_coverage():
    """params_from_torch over a full-size synthetic torchvision state dict:
    consumes every key except the classifier head and BN bookkeeping, and
    produces exactly the module's own param tree (names AND shapes)."""
    import jax
    from fancyrec_tpu.models.resnet import ResNetFeatures, init_random_params

    sd, consumed = _tracking(_synthetic_torchvision_resnet152_sd())
    params = ResNetFeatures.params_from_torch(sd)

    exempt = {k for k in sd
              if k.startswith("fc.") or k.endswith("num_batches_tracked")}
    missed = set(sd) - consumed - exempt
    assert not missed, sorted(missed)[:10]

    want = init_random_params()
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                  jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths


@pytest.mark.slow
def test_bert_torch_import_full_key_coverage():
    """BertEncoder.params_from_torch over a full-size randomly initialized
    HF bert-base-uncased BertModel: the 3-layer truncation consumes every
    embedding + layer-0..2 key, skips layers 3..11 and the pooler, and
    matches our module's init tree shapes."""
    import jax
    import transformers

    from fancyrec_tpu.models.bert import BertConfig, BertEncoder

    hf_cfg = transformers.BertConfig()       # bert-base-uncased dims
    torch_model = transformers.BertModel(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    cfg = BertConfig(num_hidden_layers=3)
    tsd, consumed = _tracking(sd)
    params = BertEncoder.params_from_torch(tsd, cfg)

    exempt = {k for k in sd
              if k.startswith("pooler.") or k.endswith("position_ids")
              or any(k.startswith("encoder.layer.%d." % i)
                     for i in range(3, hf_cfg.num_hidden_layers))}
    missed = set(sd) - consumed - exempt
    assert not missed, sorted(missed)[:10]

    model = BertEncoder(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    want = model.init(jax.random.PRNGKey(0), ids, ids,
                      jnp.ones((1, 4), jnp.int32))["params"]
    got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                  jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths
