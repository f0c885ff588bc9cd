"""Golden numerics tests: Flax modules vs torch oracles with shared weights.

The torch oracles implement the reference semantics (citations inline) and
run on CPU; weights are exported into the Flax modules, outputs compared.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from fancyrec_tpu.models.gru import BiGRU
from fancyrec_tpu.models.layers import (
    MFC, AttentionPool, BatchNorm1dTorch, ConvBank, masked_mean)

TOL = dict(atol=2e-5, rtol=2e-5)


def _np(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# masked mean (reference model.py:166-168,271-273,344-346 loops)
# ---------------------------------------------------------------------------

def test_masked_mean_matches_loop():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 7, 11).astype(np.float32)
    lengths = np.array([3, 7, 1, 5, 2])
    mask = (np.arange(7)[None] < lengths[:, None]).astype(np.float32)
    want = np.stack([x[i, : lengths[i]].mean(0) for i in range(5)])
    got = masked_mean(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


# ---------------------------------------------------------------------------
# BiGRU vs torch.nn.GRU
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pad_to", [7, 12])
def test_bigru_unpacked_matches_torch(pad_to):
    """Visual-branch mode: GRU over the zero-padded batch (model.py:162)."""
    torch.manual_seed(0)
    B, T, D, H = 3, 7, 10, 6
    tg = tnn.GRU(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    want, _ = tg(x)

    xpad = np.zeros((B, pad_to, D), np.float32)
    xpad[:, :T] = _np(x)
    m = BiGRU(hidden=H, packed=False)
    params = BiGRU.params_from_torch(tg.state_dict())
    got = m.apply({"params": params}, jnp.asarray(xpad), batch_len=jnp.int32(T))
    np.testing.assert_allclose(np.asarray(got)[:, :T], _np(want), **TOL)


@pytest.mark.parametrize("pad_to", [9, 14])
def test_bigru_packed_matches_torch(pad_to):
    """Text-branch mode: packed sequences (model.py:265-268)."""
    torch.manual_seed(1)
    B, T, D, H = 4, 9, 8, 5
    lengths = [9, 6, 4, 2]  # sorted desc, as the reference collate guarantees
    tg = tnn.GRU(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    for i, L in enumerate(lengths):
        x[i, L:] = 0.0
    packed = tnn.utils.rnn.pack_padded_sequence(x, lengths, batch_first=True)
    out, _ = tg(packed)
    want, _ = tnn.utils.rnn.pad_packed_sequence(out, batch_first=True)

    xpad = np.zeros((B, pad_to, D), np.float32)
    xpad[:, :T] = _np(x)
    m = BiGRU(hidden=H, packed=True)
    params = BiGRU.params_from_torch(tg.state_dict())
    got = m.apply({"params": params}, jnp.asarray(xpad),
                  lengths=jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got)[:, :T], _np(want), **TOL)


# ---------------------------------------------------------------------------
# ConvBank vs torch Conv2d bank (model.py:141-144,177-181)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pad_to", [6, 11])
def test_convbank_matches_torch(pad_to):
    torch.manual_seed(2)
    B, T, D, K = 3, 6, 12, 4
    sizes = (2, 3, 4)
    convs = tnn.ModuleList([
        tnn.Conv2d(1, K, (ws, D), padding=(ws - 1, 0)) for ws in sizes])
    x = torch.randn(B, T, D)
    xin = x.unsqueeze(1)
    outs = [F.relu(c(xin)).squeeze(3) for c in convs]
    outs = [F.max_pool1d(o, o.size(2)).squeeze(2) for o in outs]
    want = torch.cat(outs, 1)

    xpad = np.zeros((B, pad_to, D), np.float32)
    xpad[:, :T] = _np(x)
    m = ConvBank(kernel_num=K, kernel_sizes=sizes)
    params = {}
    for ws, c in zip(sizes, convs):
        w = _np(c.weight)  # (K, 1, ws, D)
        params["conv_w%d" % ws] = {
            "kernel": np.transpose(w[:, 0], (1, 2, 0)),  # (ws, D, K)
            "bias": _np(c.bias),
        }
    got = m.apply({"params": params}, jnp.asarray(xpad), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(got), _np(want), **TOL)


# ---------------------------------------------------------------------------
# AttentionPool vs reference loop semantics (model.py:87-114)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pad_to", [8, 13])
def test_attention_pool_matches_torch(pad_to):
    torch.manual_seed(3)
    B, T, D, Hid, Heads = 4, 8, 10, 5, 3
    w1 = tnn.Linear(D, Hid, bias=False)
    w2 = tnn.Linear(Hid, Heads, bias=False)
    x = torch.randn(B, T, D)
    lengths = [8, 3, 5, 1]
    for i, L in enumerate(lengths):
        x[i, L:] = 0.0

    a = w2(torch.tanh(w1(x))).mean(dim=-1, keepdim=True)  # (B,T,1)
    weight = torch.zeros_like(a)
    for i in range(B):
        weight[i, : lengths[i]] = torch.softmax(a[i, : lengths[i]], dim=0)
    want = (weight * x).mean(dim=1)

    xpad = np.zeros((B, pad_to, D), np.float32)
    xpad[:, :T] = _np(x)
    mask = (np.arange(pad_to)[None] < np.array(lengths)[:, None]).astype(np.float32)
    m = AttentionPool(hidden=Hid, heads=Heads)
    params = {
        "w_1": {"kernel": _np(w1.weight).T},
        "w_2": {"kernel": _np(w2.weight).T},
    }
    got = m.apply({"params": params}, jnp.asarray(xpad), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), _np(want), **TOL)


# ---------------------------------------------------------------------------
# MFC (model.py:59-83)
# ---------------------------------------------------------------------------

def test_mfc_matches_torch_eval():
    torch.manual_seed(4)
    fc = tnn.Linear(20, 8)
    x = torch.randn(6, 20)
    want = F.relu(fc(x))  # dropout inactive in eval
    m = MFC(out_dim=8, dropout=0.2)
    params = {"fc1": {"kernel": _np(fc.weight).T, "bias": _np(fc.bias)}}
    got = m.apply({"params": params}, jnp.asarray(_np(x)), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), _np(want), **TOL)


# ---------------------------------------------------------------------------
# BatchNorm vs torch.nn.BatchNorm1d
# ---------------------------------------------------------------------------

def test_batchnorm_train_and_eval_match_torch():
    torch.manual_seed(5)
    F_ = 10
    bn = tnn.BatchNorm1d(F_)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.5, 0.5)

    m = BatchNorm1dTorch(F_)
    variables = {
        "params": {"scale": _np(bn.weight), "bias": _np(bn.bias)},
        "batch_stats": {"mean": np.zeros(F_, np.float32),
                        "var": np.ones(F_, np.float32)},
    }

    # two train steps update running stats identically
    for seed in (0, 1):
        torch.manual_seed(10 + seed)
        x = torch.randn(8, F_)
        bn.train()
        want = bn(x)
        got, mut = m.apply(variables, jnp.asarray(_np(x)),
                           use_running_average=False, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        np.testing.assert_allclose(np.asarray(got), _np(want), **TOL)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), _np(bn.running_mean), **TOL)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), _np(bn.running_var), **TOL)

    # eval uses running stats
    bn.eval()
    x = torch.randn(4, F_)
    want = bn(x)
    got = m.apply(variables, jnp.asarray(_np(x)), use_running_average=True)
    np.testing.assert_allclose(np.asarray(got), _np(want), **TOL)


# ---------------------------------------------------------------------------
# L1Penalty gradient (model.py:389-402)
# ---------------------------------------------------------------------------

def test_l1_penalty_gradient():
    from fancyrec_tpu.models.brand import l1_penalty

    x = jnp.asarray([[0.5, -2.0, 0.0]])
    f = lambda v: jnp.sum(l1_penalty(v) * 3.0)
    g = jax.grad(f)(x)
    # upstream grad 3.0 plus 1e-4 * sign(x)
    np.testing.assert_allclose(
        np.asarray(g), [[3.0001, 2.9999, 3.0]], atol=1e-7)
