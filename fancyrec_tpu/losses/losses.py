"""Training losses: rank-weighted triplet / CrossCLR / queue-contrastive.

Pure functions of (embeddings, state) -> (loss, new_state): JAX has no
mutable module buffers, so the contrastive memory queue (reference
loss_ctrs.py:132-147 register_buffer) is explicit train state threaded
through the step function.

Faithfulness notes (semantics mirrored from loss.py / loss_ctrs.py):
  * The pairwise score matrix is scores[i, j] = brand[j] . post[i] on
    *unnormalized* embeddings (the reference's per-row matmul loop,
    loss.py:89-93) -- here one (B, C) x (C, B) matmul.
  * Rank weights use the double-argsort trick: w = 1/(B - rank + 1) + 1.
  * The queue positive-mask walks from the *post-enqueue* pointer
    (loss_ctrs.py:149-159), i.e. it masks the stale slots of the *next*
    batch, not the current one -- reference behavior, preserved.
  * Only direction='all' is usable in the reference TripletLoss (other
    values crash at loss.py:131-132); we implement 'all' and raise
    otherwise.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# similarity kernels (reference loss.py:22-47)
# ---------------------------------------------------------------------------

def _l2norm_rows(x):
    return x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))


def cosine_sim(im, s):
    return jnp.dot(_l2norm_rows(im), _l2norm_rows(s).T,
                   preferred_element_type=jnp.float32)


def order_sim(im, s):
    ymx = s[:, None, :] - im[None, :, :]
    return -jnp.sqrt(jnp.sum(jnp.maximum(ymx, 0.0) ** 2, axis=2)).T


def euclidean_sim(im, s):
    ymx = s[:, None, :] - im[None, :, :]
    return -jnp.sum(ymx ** 2, axis=2).T


# ---------------------------------------------------------------------------
# rank weights (reference loss.py:96-105, loss_ctrs.py:61-77,187-192)
# ---------------------------------------------------------------------------

def _raw_scores(brand, post):
    """scores[i, j] = brand[j] . post[i] -- replaces the per-row Python
    matmul loop (loss.py:89-93) with a single MXU matmul."""
    return jnp.dot(post, brand.T, preferred_element_type=jnp.float32)


def rank_weights(scores, axis):
    """w = 1/(B - rank + 1) + 1 where rank is the 1-based position of the
    diagonal element in its row (axis=1) / column (axis=0), descending."""
    b = scores.shape[0]
    if axis == 1:
        a = jnp.argsort(-scores, axis=1)
        pos = jnp.argsort(a, axis=1)
    else:
        a = jnp.argsort(-scores, axis=0)
        pos = jnp.argsort(a, axis=0)
    rank = jnp.diagonal(pos).astype(jnp.float32) + 1.0
    return 1.0 / (b - rank + 1.0) + 1.0


# ---------------------------------------------------------------------------
# lab loss (reference loss.py:51-63)
# ---------------------------------------------------------------------------

def lab_loss(brand_embs):
    s = cosine_sim(brand_embs, brand_embs)
    b = s.shape[0]
    s = jnp.where(jnp.eye(b, dtype=bool), 0.0, s)
    return (jnp.sum(jnp.exp(s)) - b) / b


# ---------------------------------------------------------------------------
# triplet / mrl (reference loss.py:67-143)
# ---------------------------------------------------------------------------

def triplet_loss(brand_ids, brand_emb, post_emb, *, margin: float = 0.2,
                 cost_style: str = "sum", direction: str = "all"):
    if direction != "all":
        raise NotImplementedError(
            "reference TripletLoss only functions with direction='all' "
            "(loss.py:131-132 dereference both costs unconditionally)")
    scores = _raw_scores(brand_emb, post_emb)
    rank_p = rank_weights(scores, axis=1)
    rank_b = rank_weights(scores, axis=0)

    diagonal = jnp.diagonal(scores)[:, None]           # (B, 1)
    d1 = jnp.broadcast_to(diagonal, scores.shape)       # row-constant
    d2 = jnp.broadcast_to(diagonal.T, scores.shape)     # col-constant

    same_brand = brand_ids[:, None] == brand_ids[None, :]

    cost_p = jnp.maximum(margin + scores - d1, 0.0)
    cost_p = jnp.where(same_brand, 0.0, cost_p)
    cost_b = jnp.maximum(margin + scores - d2, 0.0)
    cost_b = jnp.where(same_brand, 0.0, cost_b)

    # torch (B,) * (B,B) broadcasting scales *columns* j by w[j]
    cost_p = rank_p[None, :] * cost_p
    cost_b = rank_b[None, :] * cost_b

    if cost_style == "sum":
        return jnp.sum(cost_b) + jnp.sum(cost_p)
    return jnp.mean(cost_b) + jnp.mean(cost_p)


# ---------------------------------------------------------------------------
# CrossCLR intra-modality (reference loss_ctrs.py:28-117)
# ---------------------------------------------------------------------------

def crossclr_loss(brand, post, *, temperature: float = 0.03,
                  negative_weight: float = 0.8, cost_style: str = "sum"):
    scores = _raw_scores(brand, post)
    rank_p = rank_weights(scores, axis=1)
    rank_b = rank_weights(scores, axis=0)

    b = brand.shape[0]
    brand_n = _l2norm_rows(brand)
    post_n = _l2norm_rows(post)

    logits_per_brand = jnp.dot(brand_n, post_n.T) / temperature
    logits_per_post = jnp.dot(post_n, brand_n.T) / temperature
    logits_clstr_brand = jnp.dot(brand_n, brand_n.T) / temperature
    logits_clstr_post = jnp.dot(post_n, post_n.T) / temperature

    off_diag = 1.0 - jnp.eye(b)
    negatives_brand = logits_clstr_brand * off_diag
    negatives_post = logits_clstr_post * off_diag

    brand_logits = jnp.concatenate(
        [logits_per_brand, negative_weight * negatives_brand], axis=1)
    post_logits = jnp.concatenate(
        [logits_per_post, negative_weight * negatives_post], axis=1)

    mask = jnp.concatenate([jnp.eye(b), jnp.zeros((b, b))], axis=1)

    def compute(logits):
        return -jnp.log(jnp.sum(jax.nn.softmax(logits, axis=1) * mask, axis=1))

    loss_b = rank_b * compute(brand_logits)
    loss_p = rank_p * compute(post_logits)
    if cost_style == "sum":
        return (jnp.sum(loss_b) + jnp.sum(loss_p)) / 2.0
    return (jnp.mean(loss_b) + jnp.mean(loss_p)) / 2.0


# ---------------------------------------------------------------------------
# queue contrastive / 'cl' -- the recipe default (reference loss_ctrs.py:120-214)
# ---------------------------------------------------------------------------

class ContrastiveQueueState(NamedTuple):
    queue: jnp.ndarray   # (K, C) past normalized post embeddings
    ptr: jnp.ndarray     # () int32 insertion pointer


def init_queue_state(queue_size: int, embedding_size: int) -> ContrastiveQueueState:
    return ContrastiveQueueState(
        queue=jnp.zeros((queue_size, embedding_size), jnp.float32),
        ptr=jnp.zeros((), jnp.int32))


def contrastive_loss(brand, post, state: ContrastiveQueueState, *,
                     temperature: float = 0.03, negative_weight: float = 0.8,
                     cost_style: str = "mean", no_queue: bool = False,
                     no_intra: bool = False
                     ) -> Tuple[jnp.ndarray, ContrastiveQueueState]:
    scores = _raw_scores(brand, post)
    weight = rank_weights(scores, axis=1)

    b = brand.shape[0]
    brand_n = _l2norm_rows(brand)
    post_n = _l2norm_rows(post)

    if no_queue or no_intra:
        ori_logits = jnp.dot(post_n, post_n.T)
        ptr = state.ptr  # pointer untouched (nothing enqueued)
        cols = (ptr + jnp.arange(b)) % ori_logits.shape[1]
        pos_mask = jnp.ones_like(ori_logits).at[jnp.arange(b), cols].set(0.0)
        new_state = state
    else:
        k = state.queue.shape[0]
        idx = (state.ptr + jnp.arange(b)) % k
        queue = state.queue.at[idx].set(jax.lax.stop_gradient(post_n))
        new_ptr = (state.ptr + b) % k
        ori_logits = jnp.dot(post_n, queue.T)            # (B, K)
        # reference masks from the *advanced* pointer (loss_ctrs.py:149-159)
        cols = (new_ptr + jnp.arange(b)) % k
        pos_mask = jnp.ones_like(ori_logits).at[jnp.arange(b), cols].set(0.0)
        new_state = ContrastiveQueueState(queue=queue, ptr=new_ptr)

    inter = jnp.dot(brand_n, post_n.T) / temperature
    intra = ori_logits * pos_mask / temperature

    if no_intra:
        intra = jnp.zeros_like(intra)

    exp_inter = jnp.exp(inter)
    exp_intra = jnp.exp(intra)
    exp_sum = jnp.sum(exp_inter, axis=1) + negative_weight * jnp.sum(exp_intra, axis=1)
    logits = jnp.diagonal(exp_inter) / exp_sum

    loss_vec = -jnp.log(logits) * weight
    loss = jnp.sum(loss_vec) if cost_style == "sum" else jnp.mean(loss_vec)
    return loss, new_state
