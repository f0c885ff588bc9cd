from fancyrec_tpu.serving.index import (
    PostIndex, add_collection_to_index, append_to_index, build_index)

__all__ = ["PostIndex", "add_collection_to_index", "append_to_index",
           "build_index"]
