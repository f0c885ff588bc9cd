from fancyrec_tpu.parallel.mesh import (
    build_mesh, batch_sharding, replicated, param_shardings)

__all__ = ["build_mesh", "batch_sharding", "replicated", "param_shardings"]
