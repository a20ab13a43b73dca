"""Query→retrieved-image grid orchestration (reference
scripts/inference_and_eval.py:223-505 `retrieve_images`): sample queries from
the cached features, kNN against the key gallery, load both sides' images
from the split HDF5, render the grid figure and dump the record JSON.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List

import numpy as np

from ..analysis.plots import retrieve_images_grid
from ..data.hdf5 import BioscanSplit
from ..data.transforms import decode_jpeg, resize_bilinear
from ..ops.knn import knn_search


def _thumb(jpeg: bytes, size: int = 128) -> np.ndarray:
    img = decode_jpeg(jpeg).astype(np.float32) / 255.0
    return resize_bilinear(img, size, size, antialias=True)


def retrieve_images(
    output_dir: str,
    hdf5_path: str,
    query_split: str,
    key_split: str,
    query_features: np.ndarray,
    key_features: np.ndarray,
    query_labels: List[dict],
    key_labels: List[dict],
    num_queries: int = 5,
    max_k: int = 3,
    seed: int = 413,
    level: str = "species",
    name: str = "retrieval",
) -> Dict:
    """→ record dict {query_id: {gt, retrieved: [...]}} + saved figure path."""
    rng = random.Random(seed)
    indices = rng.sample(range(len(query_features)), min(num_queries, len(query_features)))

    _sims, nn_idx = knn_search(query_features[indices], key_features, k=max_k)

    q_reader = BioscanSplit(hdf5_path, query_split)
    k_reader = BioscanSplit(hdf5_path, key_split)
    q_jpegs = q_reader.jpeg_bytes(np.asarray(indices))
    query_images = [_thumb(j) for j in q_jpegs]
    retrieved_images, retrieved_labels, correct = [], [], []
    record: Dict = {}
    q_ids = q_reader.ids(np.asarray(indices))
    for row_i, (qi, row) in enumerate(zip(indices, nn_idx)):
        k_jpegs = k_reader.jpeg_bytes(np.asarray(row))
        retrieved_images.append([_thumb(j) for j in k_jpegs])
        labels_row = [key_labels[i][level] for i in row]
        retrieved_labels.append(labels_row)
        gt = query_labels[qi][level]
        correct.append([l == gt for l in labels_row])
        record[q_ids[row_i]] = {
            "gt": query_labels[qi],
            "retrieved": [key_labels[i] for i in row],
        }
    q_reader.close()
    k_reader.close()

    os.makedirs(output_dir, exist_ok=True)
    fig_path = retrieve_images_grid(
        os.path.join(output_dir, f"{name}.png"),
        query_images,
        retrieved_images,
        query_labels=[query_labels[i][level] for i in indices],
        retrieved_labels=retrieved_labels,
        correct=correct,
    )
    with open(os.path.join(output_dir, f"{name}.json"), "w") as f:
        json.dump(record, f, indent=2)
    return {"figure": fig_path, "record": record}
