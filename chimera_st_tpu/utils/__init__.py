from .masking import lengths_to_padding_mask, padding_mask_to_lengths
from .trees import tree_size_bytes, param_count

__all__ = [
    "lengths_to_padding_mask",
    "padding_mask_to_lengths",
    "tree_size_bytes",
    "param_count",
]
