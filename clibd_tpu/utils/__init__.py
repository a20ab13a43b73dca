from .metrics import (
    LEVELS,
    harmonic_mean,
    labels_to_level_arrays,
    predictions_to_level_arrays,
    top_k_macro_accuracy,
    top_k_micro_accuracy,
)
from .seed import set_seed
from .table import Table

__all__ = [
    "LEVELS",
    "harmonic_mean",
    "labels_to_level_arrays",
    "predictions_to_level_arrays",
    "top_k_macro_accuracy",
    "top_k_micro_accuracy",
    "set_seed",
    "Table",
]
