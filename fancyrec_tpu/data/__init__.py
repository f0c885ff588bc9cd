from fancyrec_tpu.data.dataset import CaptionSet, PostDataset
from fancyrec_tpu.data.loader import BatchLoader, prefetch_to_device
from fancyrec_tpu.data.modality import TxtDataset, VisDataset, encode_modality
from fancyrec_tpu.data.tokenizer import WordPieceTokenizer

__all__ = [
    "CaptionSet", "PostDataset", "BatchLoader", "prefetch_to_device",
    "WordPieceTokenizer", "TxtDataset", "VisDataset", "encode_modality",
]
