from fancyrec_tpu.models.fancyrec import FancyRec

__all__ = ["FancyRec"]
