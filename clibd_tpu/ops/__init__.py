from .knn import knn_search, make_prediction
from .loss import (
    clip_loss,
    label_equality_matrix,
    sharded_clip_loss,
    simclr_info_nce_loss,
    simclr_loss,
    soft_target_cross_entropy,
)

__all__ = [
    "knn_search",
    "make_prediction",
    "clip_loss",
    "label_equality_matrix",
    "sharded_clip_loss",
    "simclr_info_nce_loss",
    "simclr_loss",
    "soft_target_cross_entropy",
]
