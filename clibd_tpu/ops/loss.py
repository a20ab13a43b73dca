"""Tri-modal multi-positive InfoNCE (the reference's ClipLoss/ContrastiveLoss,
bioscanclip/model/loss_func.py:25-201), TPU-native.

Reference semantics reproduced exactly:

- labels (int per sample) are gathered across ranks; the target is the
  label-equality matrix M[i,j] = (l_i == l_j) (construct_label_metrix,
  loss_func.py:19-22) — multi-positive soft targets, NOT row-normalized
  (torch CrossEntropyLoss with probability targets computes
  mean_i(-Σ_j M_ij · log_softmax(sim_i)_j)).
- every ordered pair (a,b) of present modalities contributes
  CE(s·a@bᵀ, M) + CE(s·b@aᵀ, M); the total is the mean over all terms
  (duplicate ordered pairs included, loss_func.py:176-200 — the mean makes
  duplicates a no-op mathematically, and XLA CSEs the repeated matmuls).
- `bind_to` keeps only pairs touching one anchor modality (:167-179);
  `no_image_text_loss` drops image↔text (:184-185).
- features are re-normalized inside the loss (idempotent after the model's
  normalize — kept for exactness).

TPU mapping (SURVEY.md §2.6-2.9): under pjit with the batch sharded over the
'data' mesh axis, writing the loss as a *global* computation makes XLA insert
the all-gathers over ICI automatically — this IS `all_gather=True,
gather_with_grad=True` (gradients flow through collectives natively in JAX).
An explicit shard_map variant (`sharded_clip_loss`) pins the collective
pattern and supports `local_loss=True` (each device computes CE only for its
local rows against the gathered columns — same optimum, less HBM).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config.schema import LossConfig
from ..models.clibd import l2_normalize

MODALITY_ORDER = ("image", "dna", "language")
_BIND_IDX = {"image": 0, "dna": 1, "text": 2, "language": 2}


def label_equality_matrix(labels_a: jnp.ndarray, labels_b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if labels_b is None:
        labels_b = labels_a
    return (labels_a[:, None] == labels_b[None, :]).astype(jnp.float32)


def soft_target_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss(probability targets, reduction='mean')."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(targets * logp).sum(axis=-1).mean()


def _pair_list(present: list, cfg: LossConfig) -> list:
    """Ordered modality pairs per the reference's loop (loss_func.py:176-199).

    `present` is the list of modality names with features, in MODALITY_ORDER.
    Indices for bind_to / no_image_text_loss follow the reference EXACTLY,
    quirk included: the reference compares fixed indices (image=0, dna=1,
    text=2) against enumerate positions of the *filtered* feature list
    (loss_func.py:166-185), so with a modality absent the positions shift
    (e.g. dna+text only: bind_to='text' matches nothing → the reference
    divides by zero at loss_func.py:201, and so do we).  Every shipped
    reference config using these flags is tri-modal, where filtered ==
    global.  Reproduced for parity rather than "fixed".
    """
    bind_idx = _BIND_IDX.get(cfg.bind_to) if cfg.bind_to else None
    pairs = []
    for ia, a in enumerate(present):
        for ib, b in enumerate(present):
            if ia == ib:
                continue
            if bind_idx is not None and ia != bind_idx and ib != bind_idx:
                continue
            if cfg.no_image_text_loss and {ia, ib} == {0, 2}:
                continue
            pairs.append((a, b))
    return pairs


def clip_loss(
    features: Dict[str, Optional[jnp.ndarray]],
    labels: jnp.ndarray,
    logit_scale: jnp.ndarray,
    cfg: LossConfig,
) -> jnp.ndarray:
    """Global-batch loss. features: {'image','dna','language'} → [B, D] or None."""
    present = [m for m in MODALITY_ORDER if features.get(m) is not None]
    if len(present) < 2:
        raise ValueError("Too less element for calculating the contrastive loss.")
    target = label_equality_matrix(labels)
    normed = {m: l2_normalize(features[m].astype(jnp.float32)) for m in present}

    terms = []
    for a, b in _pair_list(present, cfg):
        sim_ab = logit_scale * jnp.dot(
            normed[a], normed[b].T, precision=jax.lax.Precision.HIGHEST
        )
        terms.append(soft_target_cross_entropy(sim_ab, target))
        terms.append(soft_target_cross_entropy(sim_ab.T, target))
    return sum(terms) / len(terms)


def sharded_clip_loss(
    features: Dict[str, Optional[jnp.ndarray]],
    labels: jnp.ndarray,
    logit_scale: jnp.ndarray,
    cfg: LossConfig,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Explicit-collective variant for use inside shard_map: features/labels
    are the LOCAL shard; lax.all_gather over `axis_name` builds the global
    batch (gradients flow through the gather, = gather_with_grad)."""
    present = [m for m in MODALITY_ORDER if features.get(m) is not None]
    if len(present) < 2:
        raise ValueError("Too less element for calculating the contrastive loss.")

    all_labels = jax.lax.all_gather(labels, axis_name, tiled=True)
    local_normed = {m: l2_normalize(features[m].astype(jnp.float32)) for m in present}
    gathered = {m: jax.lax.all_gather(local_normed[m], axis_name, tiled=True) for m in present}

    if cfg.local_loss:
        # CE over local rows vs. global columns, both directions; the sum of
        # per-row means across devices / world_size equals the reference's
        # local_loss. Mean over local rows == psum/world since shards equal.
        target_rows = label_equality_matrix(labels, all_labels)
        terms = []
        for a, b in _pair_list(present, cfg):
            sim_ab = logit_scale * jnp.dot(
                local_normed[a], gathered[b].T, precision=jax.lax.Precision.HIGHEST
            )
            sim_ba = logit_scale * jnp.dot(
                local_normed[b], gathered[a].T, precision=jax.lax.Precision.HIGHEST
            )
            terms.append(soft_target_cross_entropy(sim_ab, target_rows))
            terms.append(soft_target_cross_entropy(sim_ba, target_rows))
        local = sum(terms) / len(terms)
        return jax.lax.pmean(local, axis_name)

    target = label_equality_matrix(all_labels)
    terms = []
    for a, b in _pair_list(present, cfg):
        sim_ab = logit_scale * jnp.dot(
            gathered[a], gathered[b].T, precision=jax.lax.Precision.HIGHEST
        )
        terms.append(soft_target_cross_entropy(sim_ab, target))
        terms.append(soft_target_cross_entropy(sim_ab.T, target))
    # identical on every device after the gather; pmean makes the replication
    # statically inferable for shard_map's vma check (value unchanged)
    return jax.lax.pmean(sum(terms) / len(terms), axis_name)


def simclr_info_nce_loss(
    features: jnp.ndarray, temperature: float = 0.07
) -> tuple:
    """SimCLR InfoNCE (reference util/simclr.py:64-92): features [2B, D] are
    two augmented views stacked [view1(B); view2(B)]; positives are the
    (i, i+B) pairs; self-similarities are masked out; returns (logits, labels)
    where label 0 indexes the positive column — CE(logits, 0) is the loss."""
    n = features.shape[0]
    b = n // 2
    f = l2_normalize(features.astype(jnp.float32))
    sim = jnp.dot(f, f.T, precision=jax.lax.Precision.HIGHEST)

    labels_eq = (jnp.arange(n) % b)[:, None] == (jnp.arange(n) % b)[None, :]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = labels_eq & ~eye
    neg_mask = ~labels_eq

    positives = sim[pos_mask].reshape(n, 1)
    negatives = sim[neg_mask].reshape(n, -1)
    logits = jnp.concatenate([positives, negatives], axis=1) / temperature
    labels = jnp.zeros(n, dtype=jnp.int32)
    return logits, labels


def simclr_loss(features: jnp.ndarray, temperature: float = 0.07) -> jnp.ndarray:
    """jit-safe NT-Xent equal to CE(info_nce_loss logits, 0): with the
    diagonal masked out, loss_i = logsumexp_j≠i(s_ij/τ) − s_{i,partner}/τ
    (the reference's [positive|negatives] + CE-at-0 is the same quantity)."""
    n = features.shape[0]
    b = n // 2
    f = l2_normalize(features.astype(jnp.float32))
    sim = jnp.dot(f, f.T, precision=jax.lax.Precision.HIGHEST) / temperature
    neg_inf = jnp.finfo(jnp.float32).min
    sim = jnp.where(jnp.eye(n, dtype=bool), neg_inf, sim)
    partner = (jnp.arange(n) + b) % n
    pos = sim[jnp.arange(n), partner]
    return (jax.nn.logsumexp(sim, axis=-1) - pos).mean()
