from ..config.registry import CRITERIONS
from .label_smoothed_ce import label_smoothed_nll_loss
from . import adaptive_loss, cross_entropy, ctc, masked_lm, nat_loss, sentence_prediction, triplet, wav2vec_pretraining  # noqa: F401 — registration side effects

__all__ = ["label_smoothed_nll_loss", "CRITERIONS"]
