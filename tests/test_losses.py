"""Loss golden tests vs torch oracles: values and gradients.

Oracles implement the reference loss semantics (loss.py:67-143,
loss_ctrs.py:28-214) in torch; we compare loss values and d(loss)/d(brand),
d(loss)/d(post) against the JAX implementations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fancyrec_tpu.losses import (
    ContrastiveQueueState, contrastive_loss, crossclr_loss, init_queue_state,
    lab_loss, triplet_loss)

TOL = dict(atol=1e-4, rtol=1e-4)


def _rand(seed, b=6, c=16):
    rng = np.random.RandomState(seed)
    brand = rng.randn(b, c).astype(np.float32)
    post = rng.randn(b, c).astype(np.float32)
    return brand, post


def _torch_rank_weights(scores):
    _, a1 = scores.sort(1, descending=True)
    _, b1 = a1.sort(1)
    rank1 = (b1.diag() + 1).float()
    w_p = 1 / (rank1.shape[0] - rank1 + 1) + 1
    _, a2 = scores.sort(0, descending=True)
    _, b2 = a2.sort(0)
    rank2 = (b2.diag() + 1).float()
    w_b = 1 / (rank2.shape[0] - rank2 + 1) + 1
    return w_p, w_b


def _torch_scores(brand, post):
    return post @ brand.t()


# ---------------------------------------------------------------------------

def torch_triplet(brand_ids, brand, post, margin, cost_style):
    scores = _torch_scores(brand, post)
    w_p, w_b = _torch_rank_weights(scores)
    diag = scores.diag().view(-1, 1)
    d1 = diag.expand_as(scores)
    d2 = diag.t().expand_as(scores)
    mask = torch.tensor(
        np.equal.outer(brand_ids, brand_ids))
    cost_p = (margin + scores - d1).clamp(min=0).masked_fill(mask, 0)
    cost_b = (margin + scores - d2).clamp(min=0).masked_fill(mask, 0)
    cost_p = w_p * cost_p
    cost_b = w_b * cost_b
    if cost_style == "sum":
        return cost_b.sum() + cost_p.sum()
    return cost_b.mean() + cost_p.mean()


@pytest.mark.parametrize("cost_style", ["sum", "mean"])
def test_triplet_matches_torch(cost_style):
    brand_np, post_np = _rand(0)
    brand_ids = np.array([0, 1, 2, 0, 1, 3])

    tb = torch.tensor(brand_np, requires_grad=True)
    tp = torch.tensor(post_np, requires_grad=True)
    want = torch_triplet(brand_ids, tb, tp, 0.2, cost_style)
    want.backward()

    f = lambda b, p: triplet_loss(jnp.asarray(brand_ids), b, p,
                                  margin=0.2, cost_style=cost_style)
    got, grads = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(brand_np), jnp.asarray(post_np))
    np.testing.assert_allclose(float(got), float(want), **TOL)
    np.testing.assert_allclose(np.asarray(grads[0]), tb.grad.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(grads[1]), tp.grad.numpy(), **TOL)


# ---------------------------------------------------------------------------

def torch_crossclr(brand, post, temp, neg_w, cost_style):
    scores = _torch_scores(brand, post)
    w_p, w_b = _torch_rank_weights(scores)
    b = brand.shape[0]
    brand_n = F.normalize(brand, dim=1)
    post_n = F.normalize(post, dim=1)
    lpb = brand_n @ post_n.t() / temp
    lpp = post_n @ brand_n.t() / temp
    lcb = brand_n @ brand_n.t() / temp
    lcp = post_n @ post_n.t() / temp
    off = 1 - torch.eye(b)
    neg_b = lcb * off
    neg_p = lcp * off
    bl = torch.cat([lpb, neg_w * neg_b], dim=1)
    pl = torch.cat([lpp, neg_w * neg_p], dim=1)
    m = torch.cat([torch.eye(b), torch.zeros(b, b)], dim=1)
    comp = lambda lg: -torch.log((F.softmax(lg, dim=1) * m).sum(1))
    lb = w_b * comp(bl)
    lp = w_p * comp(pl)
    if cost_style == "sum":
        return (lb.sum() + lp.sum()) / 2
    return (lb.mean() + lp.mean()) / 2


@pytest.mark.parametrize("cost_style", ["sum", "mean"])
def test_crossclr_matches_torch(cost_style):
    brand_np, post_np = _rand(1)
    tb = torch.tensor(brand_np, requires_grad=True)
    tp = torch.tensor(post_np, requires_grad=True)
    want = torch_crossclr(tb, tp, 0.03, 0.8, cost_style)
    want.backward()

    f = lambda b, p: crossclr_loss(b, p, cost_style=cost_style)
    got, grads = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(brand_np), jnp.asarray(post_np))
    np.testing.assert_allclose(float(got), float(want), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(grads[0]), tb.grad.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(grads[1]), tp.grad.numpy(), **TOL)


# ---------------------------------------------------------------------------

class TorchContrastiveOracle:
    """Queue contrastive loss oracle (loss_ctrs.py:120-214 semantics)."""

    def __init__(self, k, c, temp=0.03, neg_w=0.8, cost_style="mean",
                 no_queue=False, no_intra=False):
        self.queue = torch.zeros(k, c)
        self.ptr = 0
        self.temp, self.neg_w = temp, neg_w
        self.cost_style = cost_style
        self.no_queue, self.no_intra = no_queue, no_intra

    def __call__(self, brand, post):
        scores = _torch_scores(brand, post)
        w_p, _ = _torch_rank_weights(scores)
        b = brand.shape[0]
        brand_n = F.normalize(brand, dim=1)
        post_n = F.normalize(post, dim=1)
        if self.no_queue or self.no_intra:
            ori = post_n @ post_n.t()
            mask = torch.ones_like(ori)
            p = self.ptr
            for i in range(b):
                mask[i][p] = 0
                p += 1
        else:
            with torch.no_grad():
                self.queue[self.ptr: self.ptr + b] = post_n
                self.ptr = (self.ptr + b) % self.queue.shape[0]
            ori = post_n @ self.queue.t()
            mask = torch.ones_like(ori)
            p = self.ptr
            for i in range(b):
                mask[i][p] = 0
                p += 1
        inter = brand_n @ post_n.t() / self.temp
        intra = ori * mask / self.temp
        if self.no_intra:
            intra = torch.zeros_like(intra)
        exp_inter = torch.exp(inter)
        exp_intra = torch.exp(intra)
        exp_sum = exp_inter.sum(1) + self.neg_w * exp_intra.sum(1)
        logits = torch.diag(exp_inter).t() / exp_sum
        loss = -torch.log(logits) * w_p
        return loss.sum() if self.cost_style == "sum" else loss.mean()


@pytest.mark.parametrize("mode", ["queue", "no_queue", "no_intra"])
def test_contrastive_matches_torch_over_steps(mode):
    K, B, C = 12, 4, 8
    no_queue = mode == "no_queue"
    no_intra = mode == "no_intra"
    oracle = TorchContrastiveOracle(K, C, no_queue=no_queue, no_intra=no_intra)
    state = init_queue_state(K, C)

    for step in range(4):  # queue wraps at step 3 (12/4)
        brand_np, post_np = _rand(10 + step, b=B, c=C)
        tb = torch.tensor(brand_np, requires_grad=True)
        tp = torch.tensor(post_np, requires_grad=True)
        want = oracle(tb, tp)
        want.backward()

        def f(br, po, st):
            loss, _ = contrastive_loss(br, po, st, no_queue=no_queue,
                                       no_intra=no_intra)
            return loss

        got, grads = jax.value_and_grad(f, argnums=(0, 1))(
            jnp.asarray(brand_np), jnp.asarray(post_np), state)
        _, state = contrastive_loss(jnp.asarray(brand_np), jnp.asarray(post_np),
                                    state, no_queue=no_queue, no_intra=no_intra)

        np.testing.assert_allclose(float(got), float(want), **TOL)
        np.testing.assert_allclose(np.asarray(grads[0]), tb.grad.numpy(), **TOL)
        np.testing.assert_allclose(np.asarray(grads[1]), tp.grad.numpy(), **TOL)
        if mode == "queue":
            np.testing.assert_allclose(np.asarray(state.queue),
                                       oracle.queue.numpy(), **TOL)
            assert int(state.ptr) == oracle.ptr


# ---------------------------------------------------------------------------

def test_lab_loss_matches_torch():
    brand_np, _ = _rand(5)
    tb = torch.tensor(brand_np)
    bn = F.normalize(tb, dim=1)
    s = bn @ bn.t()
    s = s.masked_fill(torch.eye(s.size(0)) > 0.5, 0)
    want = (torch.sum(torch.exp(s)) - s.size(0)) / s.size(0)
    got = lab_loss(jnp.asarray(brand_np))
    np.testing.assert_allclose(float(got), float(want), **TOL)
