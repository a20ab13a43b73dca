from .evaluate import (
    compute_overall_acc,
    convert_acc_dict_to_wandb_dict,
    format_results,
    inference_and_eval,
    save_results,
)
from .extract import (
    ALL_TYPE_OF_FEATURES_OF_KEY,
    ALL_TYPE_OF_FEATURES_OF_QUERY,
    extract_split,
    load_extracted_features,
    make_encode_step,
    save_embedding_export,
    save_extracted_features,
    save_labels_and_ids,
)

__all__ = [
    "compute_overall_acc",
    "convert_acc_dict_to_wandb_dict",
    "format_results",
    "inference_and_eval",
    "save_results",
    "ALL_TYPE_OF_FEATURES_OF_KEY",
    "ALL_TYPE_OF_FEATURES_OF_QUERY",
    "extract_split",
    "load_extracted_features",
    "make_encode_step",
    "save_embedding_export",
    "save_extracted_features",
    "save_labels_and_ids",
]
