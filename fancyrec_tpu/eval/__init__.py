from fancyrec_tpu.eval.metrics import (
    RankingMetrics,
    cosine_sim_matrix,
    ranking_metrics_jax,
    ranking_metrics_oracle,
    composite_score,
)

__all__ = [
    "RankingMetrics",
    "cosine_sim_matrix",
    "ranking_metrics_jax",
    "ranking_metrics_oracle",
    "composite_score",
]
