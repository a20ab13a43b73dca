"""Analysis suite + HDF5 builders + logging/profiling utilities."""

import csv
import json
import os

import numpy as np
import pandas as pd
import pytest


def _labels(n=60, rng=None):
    rng = rng or np.random.default_rng(0)
    return [
        {
            "order": f"o{i%2}",
            "family": f"f{i%3}",
            "genus": f"g{i%5}",
            "species": f"s{i%8}",
        }
        for i in range(n)
    ]


def test_embedding_plot_and_grid(tmp_path, rng):
    from clibd_tpu.analysis.plots import generate_embedding_plot, retrieve_images_grid

    labels = _labels()
    img = rng.standard_normal((60, 16)).astype(np.float32)
    dna = rng.standard_normal((60, 16)).astype(np.float32)
    written = generate_embedding_plot(
        str(tmp_path / "plots"), img, dna, None, labels,
        embeddings_filters={"order": "o0"}, num_classes=4,
    )
    assert len(written) == 4
    assert all(os.path.exists(p) for p in written)

    q = [rng.random((32, 32, 3)) for _ in range(2)]
    r = [[rng.random((32, 32, 3)) for _ in range(3)] for _ in range(2)]
    path = retrieve_images_grid(
        str(tmp_path / "grid.png"), q, r,
        query_labels=["a", "b"],
        retrieved_labels=[["x", "y", "z"]] * 2,
        correct=[[True, False, True]] * 2,
    )
    assert os.path.exists(path)


def test_confusion_matrix_plot(tmp_path):
    from clibd_tpu.analysis.plots import plot_confusion_matrix

    gt = ["a", "a", "b", "b", "c"]
    pred = ["a", "b", "b", "b", "c"]
    out = plot_confusion_matrix(gt, pred, str(tmp_path / "cm.png"))
    assert os.path.exists(out)


def test_latex_table_and_flatten(tmp_path):
    from clibd_tpu.analysis.tables import (
        dataset_statistics,
        flatten_results_csv,
        latex_accuracy_table,
    )

    acc = {
        "encoded_image_feature": {
            "encoded_image_feature": {
                "seen": {"micro_acc": {1: {"order": 0.9, "family": 0.8, "genus": 0.7, "species": 0.6}},
                         "macro_acc": {1: {"order": 0.85, "family": 0.75, "genus": 0.65, "species": 0.55}}},
                "unseen": {"micro_acc": {1: {"order": 0.5, "family": 0.4, "genus": 0.3, "species": 0.2}},
                           "macro_acc": {1: {"order": 0.45, "family": 0.35, "genus": 0.25, "species": 0.15}}},
            }
        }
    }
    tex = latex_accuracy_table(acc)
    assert "\\begin{table}" in tex and "Species & 60.0 & 20.0 & 30.0" in tex

    # flatten csv
    rows = [
        ["learning_strategy", "Alignment", "DNA_encoder", "Image_encoder", "Language_encoder",
         "Epoch", "Latent_space_dim", "Query", "Key", "Metric",
         "Seen_Order", "Seen_Family", "Seen_Genus", "Seen_Species",
         "Unseen_Order", "Unseen_Family", "Unseen_Genus", "Unseen_Species"],
        ["LoRA", "I,D", "bb", "vit", "bert", "50", "768", "Image", "Image",
         "Micro_Top-1_acc", "0.9", "0.8", "0.7", "0.6", "0.5", "0.4", "0.3", "0.2"],
        ["LoRA", "I,D", "bb", "vit", "bert", "50", "768", "Image", "Image",
         "Micro_Top-3_acc", "0.95", "0.85", "0.75", "0.65", "0.55", "0.45", "0.35", "0.25"],
    ]
    src = str(tmp_path / "results.csv")
    with open(src, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    out = flatten_results_csv(src, str(tmp_path / "flat.csv"))
    with open(out) as f:
        flat = list(csv.DictReader(f))
    assert len(flat) == 1
    assert flat[0]["Micro_Top-1_acc_Seen_Order"] == "0.9"
    assert flat[0]["Micro_Top-3_acc_Unseen_Species"] == "0.25"

    stats = dataset_statistics(_labels())
    assert stats["num_samples"] == 60
    assert stats["species"]["num_classes"] == 8


def test_hdf5_builder_roundtrip(tmp_path, rng):
    import h5py

    from clibd_tpu.data.builders import REFERENCE_SPLIT_NAME_MAP, build_split_hdf5
    from clibd_tpu.data.hdf5 import BioscanSplit
    from tests.fixtures import TINY_VOCAB, random_jpeg_bytes, write_tiny_vocab
    from clibd_tpu.data.tokenizers import WordPieceTokenizer

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rows = []
    for i in range(10):
        name = f"img{i}.jpg"
        with open(img_dir / name, "wb") as f:
            f.write(random_jpeg_bytes(rng))
        rows.append({
            "sampleid": f"sid{i}",
            "processid": f"pid{i}",
            "image_file": name,
            "barcode": "ACGT" * 30,
            "order": "Diptera",
            "family": "Sciaridae",
            "genus": "Corynoptera",
            "species": f"species_{i%3}",
            "split": "train_seen" if i < 6 else "query_seen",
        })
    # one corrupt image: should be skipped with a warning
    with open(img_dir / "bad.jpg", "wb") as f:
        f.write(b"not a jpeg")
    rows.append(dict(rows[0], sampleid="sidbad", image_file="bad.jpg"))
    md = pd.DataFrame(rows)

    vocab = write_tiny_vocab(str(tmp_path / "vocab.txt"))
    tok = WordPieceTokenizer(vocab)
    out = build_split_hdf5(
        str(tmp_path / "built.hdf5"), md, str(img_dir),
        tokenizer=tok, split_name_map=REFERENCE_SPLIT_NAME_MAP,
    )
    with h5py.File(out) as f:
        assert set(f.keys()) == {"train_seen", "seen_keys"}
        assert f["train_seen"]["image"].shape[0] == 6  # bad.jpg dropped
        assert f["train_seen"]["language_tokens_input_ids"].shape == (6, 20)

    # and the reader can consume it
    s = BioscanSplit(out, "seen_keys")
    assert len(s) == 4
    jb = s.jpeg_bytes(np.array([0]))
    assert jb[0][:2] == b"\xff\xd8"
    labels = s.label_dicts()
    assert labels[0]["order"] == "Diptera"
    s.close()


def test_run_logger_jsonl(tmp_path):
    from clibd_tpu.utils.logging import RunLogger

    logger = RunLogger("proj", "run1", output_dir=str(tmp_path), use_wandb=False)
    logger.log({"loss": 1.0, "step": 1})
    logger.log({"loss": 0.5, "step": 2})
    logger.finish()
    with open(logger.path) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 2 and lines[1]["loss"] == 0.5


def test_step_timer():
    import time

    from clibd_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup_steps=1)
    for _ in range(4):
        t.tick()
        time.sleep(0.01)
    s = t.summary(batch_size=10)
    assert s["steps_timed"] == 3
    assert s["samples_per_sec_per_chip"] > 0


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from clibd_tpu.utils.profiling import device_memory_stats, profile_trace

    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert (tmp_path / "trace").exists()
    stats = device_memory_stats()
    assert isinstance(stats, list)
