from fancyrec_tpu.serving.index import PostIndex, build_index

__all__ = ["PostIndex", "build_index"]
