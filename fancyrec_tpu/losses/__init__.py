from fancyrec_tpu.losses.losses import (
    ContrastiveQueueState, contrastive_loss, crossclr_loss, lab_loss,
    rank_weights, triplet_loss, cosine_sim, euclidean_sim, order_sim,
    init_queue_state)

__all__ = [
    "ContrastiveQueueState", "contrastive_loss", "crossclr_loss", "lab_loss",
    "rank_weights", "triplet_loss", "cosine_sim", "euclidean_sim",
    "order_sim", "init_queue_state",
]
