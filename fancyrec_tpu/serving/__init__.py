from fancyrec_tpu.serving.index import PostIndex, build_index

__all__ = ["PostIndex", "build_index"]
from fancyrec_tpu.serving.index import (
    add_collection_to_index, append_to_index)
