from .checkpoint import (
    BestLastCheckpointer,
    load_params_any,
    load_train_state,
    resolve_checkpoint_path,
    save_train_state,
)
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
    AppendableEmbeddingWriter,
    extract_split,
    load_extracted_features,
    make_encode_step,
    save_embedding_export,
    stream_extract_split,
    save_extracted_features,
    save_labels_and_ids,
)
from .finetune import make_finetune_step, species_to_index, topk_accuracy
from .fusion import (
    evaluate_with_threshold,
    fuse_predictions,
    method_linear,
    method_nn,
    search_threshold,
    train_linear_probe,
)
from .retrieval_grid import retrieve_images
from .schedules import build_schedule, one_cycle_lr, scale_learning_rate
from .simclr import SimCLRTrainer, TwoViewLoader
from .train import Trainer, build_optimizer, make_train_step
from .zeroshot import (
    OPENAI_IMAGENET_TEMPLATES,
    build_class_prototypes,
    zero_shot_classify,
)

__all__ = [
    "BestLastCheckpointer",
    "load_params_any",
    "load_train_state",
    "resolve_checkpoint_path",
    "save_train_state",
    "compute_overall_acc",
    "convert_acc_dict_to_wandb_dict",
    "format_results",
    "inference_and_eval",
    "save_results",
    "ALL_TYPE_OF_FEATURES_OF_KEY",
    "ALL_TYPE_OF_FEATURES_OF_QUERY",
    "AppendableEmbeddingWriter",
    "extract_split",
    "load_extracted_features",
    "make_encode_step",
    "save_embedding_export",
    "stream_extract_split",
    "save_extracted_features",
    "save_labels_and_ids",
    "make_finetune_step",
    "species_to_index",
    "topk_accuracy",
    "evaluate_with_threshold",
    "fuse_predictions",
    "method_linear",
    "method_nn",
    "search_threshold",
    "train_linear_probe",
    "retrieve_images",
    "build_schedule",
    "one_cycle_lr",
    "scale_learning_rate",
    "SimCLRTrainer",
    "TwoViewLoader",
    "Trainer",
    "build_optimizer",
    "make_train_step",
    "OPENAI_IMAGENET_TEMPLATES",
    "build_class_prototypes",
    "zero_shot_classify",
]
