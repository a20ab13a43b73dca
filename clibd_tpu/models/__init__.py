from .bert import bert_encode, init_bert_params, mlm_head_apply
from .clibd import (
    clibd_apply,
    count_params,
    encode_dna,
    encode_image,
    encode_language,
    init_clibd_params,
    l2_normalize,
    trainable_mask,
)
from .convert import (
    bert_params_from_hf_state_dict,
    clibd_params_from_reference_checkpoint,
    load_barcode_bert_checkpoint,
    load_params_npz,
    load_torch_state_dict,
    migrate_legacy_param_names,
    save_params_npz,
    strip_module_prefix,
    vit_params_from_timm_state_dict,
)
from .lora import init_lora_params, merge_lora_into_qkv
from .mlp import init_mlp_encoder_params, mlp_encoder_apply
from .vit import init_vit_params, patchify, vit_apply

__all__ = [
    "bert_encode",
    "init_bert_params",
    "mlm_head_apply",
    "clibd_apply",
    "count_params",
    "encode_dna",
    "encode_image",
    "encode_language",
    "init_clibd_params",
    "l2_normalize",
    "trainable_mask",
    "bert_params_from_hf_state_dict",
    "clibd_params_from_reference_checkpoint",
    "load_barcode_bert_checkpoint",
    "load_params_npz",
    "load_torch_state_dict",
    "migrate_legacy_param_names",
    "save_params_npz",
    "strip_module_prefix",
    "vit_params_from_timm_state_dict",
    "init_lora_params",
    "merge_lora_into_qkv",
    "init_mlp_encoder_params",
    "mlp_encoder_apply",
    "init_vit_params",
    "patchify",
    "vit_apply",
]
