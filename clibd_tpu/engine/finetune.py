"""Supervised fine-tuning engine (reference epoch/fine_tuning_epoch.py:11-103
+ scripts/BZSL/fine_tune_*.py): species-classification training of a single
encoder (image or DNA) with an extra linear classifier head, top-k eval.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import ExperimentConfig
from ..models.clibd import encode_dna, encode_image
from ..models.layers import linear, torch_linear_init


def init_classifier_head(rng, feature_dim: int, num_classes: int) -> dict:
    return torch_linear_init(rng, feature_dim, num_classes)


def species_to_index(label_dicts: List[dict], unique_species: List[str]) -> np.ndarray:
    """Reference label_batch_to_species_idx (fine_tuning_epoch.py:6-9)."""
    lookup = {s: i for i, s in enumerate(unique_species)}
    return np.asarray([lookup[l["species"]] for l in label_dicts], dtype=np.int32)


def make_finetune_step(
    cfg: ExperimentConfig,
    optimizer,
    modality: str = "image",
    train_encoder: bool = True,
):
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    def forward(params, batch):
        if modality == "image":
            feats = encode_image(params, cfg, batch["image"], compute_dtype)
        else:
            feats = encode_dna(params, cfg, batch["dna"], compute_dtype)
        if not train_encoder:
            feats = jax.lax.stop_gradient(feats)
        return linear(params["classifier"], feats, compute_dtype).astype(jnp.float32)

    def loss_fn(params, batch):
        logits = forward(params, batch)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -logp[jnp.arange(logits.shape[0]), batch["target"]].mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def predict(params, batch):
        return forward(params, batch)

    return step, predict


def fit_classifier(
    params: dict,
    cfg: ExperimentConfig,
    loader,
    targets: np.ndarray,
    num_classes: int,
    tx,
    epochs: int,
    modality: str = "image",
    train_encoder: bool = True,
    seed: int = 0,
    verbose: bool = False,
):
    """Shared supervised-classification fit used by `cli finetune` (INSECT,
    fine_tune_*.py) and `cli method-nn --linear --probe full`
    (method_linear.py:458-516): fresh classifier head, optimizer masked to
    the trained subtree (a bare adamw over the full tree would weight-decay
    frozen encoders away from their checkpoint values despite zero grads,
    and allocate m/v moments for the whole model), per-epoch batch loop.

    → (trained params, jitted predict(params, batch) → logits,
       per-epoch mean losses)."""
    params = dict(params)
    params["classifier"] = init_classifier_head(
        jax.random.PRNGKey(seed), cfg.output_dim, num_classes)
    enc_key = f"{modality}_encoder"

    def _label(key):
        train = key == "classifier" or (key == enc_key and train_encoder)
        return "train" if train else "frozen"

    labels = {k: jax.tree.map(lambda _: _label(k), v) for k, v in params.items()}
    optimizer = optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)
    opt_state = optimizer.init(params)
    step, predict = make_finetune_step(cfg, optimizer, modality=modality,
                                       train_encoder=train_encoder)
    epoch_losses = []
    for epoch in range(epochs):
        losses = []
        for batch in loader.batches(epoch=epoch):
            fb = {modality: batch[modality], "target": targets[batch["index"]]}
            params, opt_state, loss = step(params, opt_state, fb)
            losses.append(float(loss))
        epoch_losses.append(float(np.mean(losses)))
        if verbose:
            print(f"epoch {epoch}: loss {epoch_losses[-1]:.4f}")
    return params, predict, epoch_losses


def topk_accuracy(logits: np.ndarray, targets: np.ndarray, k_values: Sequence[int] = (1, 3, 5)) -> Dict[int, float]:
    """Reference evaluate_epoch semantics (fine_tuning_epoch.py:39-103)."""
    order = np.argsort(-logits, axis=1)[:, : max(k_values)]
    out = {}
    for k in k_values:
        out[k] = float((order[:, :k] == targets[:, None]).any(axis=1).mean())
    return out
