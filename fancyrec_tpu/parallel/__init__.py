from fancyrec_tpu.parallel.mesh import (
    build_mesh, batch_sharding, replicated, param_shardings)
from fancyrec_tpu.parallel.pipeline import (
    bert_pipeline_forward, pipeline_apply, stack_layer_params)

__all__ = ["build_mesh", "batch_sharding", "replicated", "param_shardings",
           "pipeline_apply", "bert_pipeline_forward", "stack_layer_params"]
