"""Generic BERT encoder (pure JAX): serves both BarcodeBERT (DNA) and
BERT-small (taxonomic text).

Architecture parity with HF `BertModel`/`BertForMaskedLM` as used by the
reference (dna_encoder.py:16-50, language_encoder.py:13-21): word + position
+ token-type embeddings → LN, post-LN encoder blocks, optional MLM head
(transform dense + GELU + LN, then decoder).  HF's separate q/k/v linears are
fused into one [D, 3D] matmul at conversion time; LoRA rank-4 on q/v slices
(reference `_LoRALayer` on attention.self.query/value).

Readouts (in clibd.py):
- DNA checkpoint-parity: `softmax(decoder_logits, -1).mean(seq)` — the
  reference's acknowledged quirk (dna_encoder.py:131-137) that must be
  reproduced to match released checkpoints.
- Text: mean-pool last hidden states → proj (language_encoder.py:87-89).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config.schema import BertConfig
from .layers import (
    attention_mask_bias,
    gelu,
    init_stacked_block_params,
    layernorm,
    linear,
    ln_init,
    torch_linear_init,
    transformer_stack,
    trunc_normal_init,
)
from .lora import init_lora_params


def init_bert_params(
    rng,
    cfg: BertConfig,
    lora_rank: int = 0,
    head_dim: Optional[int] = None,
) -> dict:
    """head_dim: output dim of the MLM decoder (replaced by the reference with
    a Linear to output_dim when used as the DNA head) — defaults to vocab_size."""
    keys = jax.random.split(rng, 8)
    D = cfg.hidden_size
    params = {
        "embeddings": {
            "word": trunc_normal_init(keys[0], (cfg.vocab_size, D)),
            "position": trunc_normal_init(keys[1], (cfg.max_position_embeddings, D)),
            "token_type": trunc_normal_init(keys[2], (cfg.type_vocab_size, D)),
            "ln": ln_init(D),
        },
        "blocks": init_stacked_block_params(keys[3], cfg.num_layers, D, cfg.intermediate_size),
    }
    if cfg.with_mlm_head:
        out = head_dim if head_dim is not None else cfg.vocab_size
        params["mlm_head"] = {
            "transform": torch_linear_init(keys[4], D, D),
            "ln": ln_init(D),
            "decoder": torch_linear_init(keys[5], D, out),
        }
    if lora_rank > 0:
        params["lora"] = init_lora_params(keys[6], cfg.num_layers, D, lora_rank)
    return params


def bert_encode(
    params: dict,
    input_ids: jnp.ndarray,
    cfg: BertConfig,
    token_type_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    fast_math: bool = True,
) -> jnp.ndarray:
    """→ last hidden states [B, N, D]."""
    B, N = input_ids.shape
    emb = params["embeddings"]
    x = jnp.asarray(emb["word"])[input_ids]
    x = x + jnp.asarray(emb["position"])[:N][None, :, :]
    token_type_table = jnp.asarray(emb["token_type"])
    if token_type_ids is None:
        x = x + token_type_table[0][None, None, :]
    else:
        x = x + token_type_table[token_type_ids]
    fast = fast_math and compute_dtype != jnp.float32
    if fast:
        x = layernorm(emb["ln"], x.astype(compute_dtype), cfg.layernorm_eps, fast=True)
    else:
        x = layernorm(emb["ln"], x.astype(jnp.float32), cfg.layernorm_eps).astype(compute_dtype)

    mask_bias = None
    if attention_mask is not None:
        mask_bias = attention_mask_bias(attention_mask)

    x = transformer_stack(
        params["blocks"], x,
        num_heads=cfg.num_heads, pre_ln=False, ln_eps=cfg.layernorm_eps,
        mask_bias=mask_bias, lora=params.get("lora"),
        compute_dtype=compute_dtype, remat=remat, fast_math=fast_math,
    )
    return x


def mlm_head_apply(params: dict, hidden: jnp.ndarray, cfg: BertConfig, compute_dtype=jnp.bfloat16,
                   fast_math: bool = True) -> jnp.ndarray:
    """HF BertForMaskedLM cls.predictions: dense → GELU → LN → decoder."""
    fast = fast_math and compute_dtype != jnp.float32
    h = linear(params["mlm_head"]["transform"], hidden, compute_dtype)
    h = gelu(h, fast=fast)
    h = layernorm(params["mlm_head"]["ln"], h, cfg.layernorm_eps, fast=fast)
    return linear(params["mlm_head"]["decoder"], h, compute_dtype)
