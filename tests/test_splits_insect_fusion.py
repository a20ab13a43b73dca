"""Split creation, INSECT dataset/loader, BZSL export, fusion methods."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def _metadata(n_species=30, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    sid = 0
    for s in range(n_species):
        if s < 3:
            count = 1  # singletons -> pretrain
        elif s < 8:
            count = int(rng.integers(2, 10))  # tail
        else:
            count = int(rng.integers(10, 30))  # common
        for _ in range(count):
            rows.append(
                {
                    "sampleid": f"sid{sid}",
                    "uri": f"uri{s}",
                    "image_file": f"img{sid}.jpg",
                    "species": f"species_{s}" if s % 10 else "not_classified",
                }
            )
            sid += 1
    return pd.DataFrame(rows)


def test_create_splits_semantics():
    from clibd_tpu.data.splits import create_splits

    md = _metadata()
    out = create_splits(md, seed=42)
    assert set(out.columns) >= {"sampleid", "species", "split"}
    counts = out["split"].value_counts()
    assert counts.get("train_seen", 0) > 0
    assert counts.get("test_unseen", 0) > 0
    # not_classified stays unassigned
    nc = out[out["species"] == "not_classified"]
    assert (nc["split"] == "no_split").all()
    # unseen species never appear in seen splits
    seen_species = set(out[out["split"] == "train_seen"]["species"])
    unseen_species = set(out[out["split"] == "test_unseen"]["species"])
    assert not (seen_species & unseen_species)
    # sample-level disjointness
    for a, b in [("train_seen", "val_seen"), ("train_seen", "test_seen"), ("val_seen", "test_seen")]:
        sa = set(out[out["split"] == a]["sampleid"])
        sb = set(out[out["split"] == b]["sampleid"])
        assert not (sa & sb)


@pytest.fixture()
def insect_fixture(tmp_path, rng):
    import h5py
    import scipy.io as sio

    from tests.fixtures import random_jpeg_bytes

    n = 20
    ids = np.array([[f"im{i}"] for i in range(n)], dtype=object)
    barcodes = np.array([[("ACGT" * 40)[: 120 + i]] for i in range(n)], dtype=object)
    species = np.array([[f"sp{i % 5}"] for i in range(n)], dtype=object)
    labels = (np.arange(n) % 5 + 1).reshape(-1, 1)
    sio.savemat(str(tmp_path / "res101.mat"), {
        "ids": ids, "nucleotides": barcodes, "species": species, "labels": labels,
    })
    sio.savemat(str(tmp_path / "att_splits.mat"), {
        "trainval_loc": np.arange(1, 13).reshape(1, -1),
        "test_seen_loc": np.arange(13, 17).reshape(1, -1),
        "test_unseen_loc": np.arange(17, 21).reshape(1, -1),
    })
    with h5py.File(str(tmp_path / "images.hdf5"), "w") as f:
        g = f.create_group("images")
        for i in range(n):
            g.create_dataset(f"im{i}", data=np.frombuffer(random_jpeg_bytes(rng), dtype=np.uint8))
    s2o = {f"sp{i}": {"order": f"o{i%2}", "family": f"f{i}", "genus": f"g{i}"} for i in range(5)}
    del s2o["sp3"]["genus"]  # missing level -> not_classified
    with open(tmp_path / "s2o.json", "w") as f:
        json.dump(s2o, f)
    return tmp_path


def test_insect_dataset_and_loader(insect_fixture):
    from clibd_tpu.data.insect import INSECTDataset, INSECTLoader
    from clibd_tpu.data.pipeline import BatchSpec

    ds = INSECTDataset(
        str(insect_fixture / "att_splits.mat"),
        str(insect_fixture / "res101.mat"),
        str(insect_fixture / "images.hdf5"),
        str(insect_fixture / "s2o.json"),
        split="trainval_loc",
    )
    assert len(ds) == 12
    labels = ds.label_dicts()
    assert labels[0]["order"].startswith("o")
    sp3 = [l for l in labels if l["species"] == "sp3"]
    assert all(l["genus"] == "not_classified" for l in sp3)
    assert ds.text_strings[0].endswith(labels[0]["species"])

    loader = INSECTLoader(ds, BatchSpec(batch_size=4, train=False, with_language=False))
    batches = list(loader.batches())
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 224, 224, 3)
    assert batches[0]["dna"].shape == (4, 133)
    # mid-epoch resume contract (Trainer.train_epoch passes start_batch to
    # every loader): skipping == slicing the same deterministic epoch stream
    resumed = list(loader.batches(start_batch=1))
    assert len(resumed) == 2
    np.testing.assert_array_equal(resumed[0]["index"], batches[1]["index"])
    loader.close()

    full = INSECTDataset(
        str(insect_fixture / "att_splits.mat"),
        str(insect_fixture / "res101.mat"),
        str(insect_fixture / "images.hdf5"),
        str(insect_fixture / "s2o.json"),
        split="all",
    )
    assert len(full) == 20
    full.close()


def test_bzsl_export(tmp_path, rng):
    from clibd_tpu.data.insect import export_bzsl_csvs

    dna = rng.standard_normal((20, 8)).astype(np.float32)
    img = rng.standard_normal((20, 8)).astype(np.float32)
    classes = np.arange(20) % 5
    dna_csv = str(tmp_path / "dna.csv")
    img_csv = str(tmp_path / "img.csv")
    export_bzsl_csvs(dna, img, classes, dna_csv, img_csv)
    d = np.loadtxt(dna_csv, delimiter=",")
    assert d.shape == (8, 5)  # [D, num_classes]
    np.testing.assert_allclose(d[:, 0], dna[classes == 0].mean(axis=0), atol=1e-6)
    i = np.loadtxt(img_csv, delimiter=",")
    assert i.shape == (8, 20)  # [D, N]


def test_fusion_threshold_search(rng):
    from clibd_tpu.engine.fusion import (
        evaluate_with_threshold,
        fuse_predictions,
        harmonic_mean_list,
        search_threshold,
    )
    from clibd_tpu.utils.metrics import LEVELS

    n, k = 30, 3
    # seen-side predictions correct, high scores for first half
    gt = {lv: np.asarray([f"{lv}{i%4}" for i in range(n)], dtype=object) for lv in LEVELS}
    preds_seen = {lv: np.tile(gt[lv][:, None], (1, k)) for lv in LEVELS}
    preds_unseen = {lv: np.full((n, k), "wrong", dtype=object) for lv in LEVELS}
    scores = np.full((n, k), 0.9)
    fused = fuse_predictions(preds_seen, scores, preds_unseen, threshold=0.5)
    np.testing.assert_array_equal(fused["species"][:, 0], gt["species"])
    fused_low = fuse_predictions(preds_seen, scores, preds_unseen, threshold=0.95)
    assert (fused_low["species"] == "wrong").all()

    assert harmonic_mean_list([0.5, 0.0]) == 0.0
    assert abs(harmonic_mean_list([0.5, 0.5]) - 0.5) < 1e-12

    split = {"preds_seen": preds_seen, "scores_seen": scores, "preds_unseen": preds_unseen, "gt": gt}
    best = search_threshold([split], num_intervals=50)
    assert best < 0.9  # below the score so seen-side predictions win
    results = evaluate_with_threshold([split], best)
    assert results[0]["micro_acc"][1]["species"] == 1.0


def test_method_nn_end_to_end(rng):
    from clibd_tpu.engine.fusion import method_nn
    from clibd_tpu.utils.metrics import LEVELS

    d = 8
    # construct seen queries that match seen keys exactly, unseen likewise
    seen_keys = rng.standard_normal((10, d)).astype(np.float32)
    unseen_keys = rng.standard_normal((6, d)).astype(np.float32)
    seen_labels = {lv: np.asarray([f"s{lv}{i}" for i in range(10)], dtype=object) for lv in LEVELS}
    unseen_labels = {lv: np.asarray([f"u{lv}{i}" for i in range(6)], dtype=object) for lv in LEVELS}
    # side B queries with the IMAGE feature (reference parity: both sides
    # run on the image query, cross-modal vs DNA keys) — make the unseen
    # image queries land on their unseen DNA keys
    seen_q = {"image": seen_keys[:5], "dna": rng.standard_normal((5, d)).astype(np.float32)}
    unseen_q = {"image": unseen_keys[:4], "dna": rng.standard_normal((4, d)).astype(np.float32)}
    seen_gt = {lv: seen_labels[lv][:5] for lv in LEVELS}
    unseen_gt = {lv: unseen_labels[lv][:4] for lv in LEVELS}

    out = method_nn(
        seen_q, unseen_q, seen_keys, seen_labels, unseen_keys, unseen_labels,
        seen_gt, unseen_gt, max_k=3, k_list=[1, 3],
    )
    assert 0.0 <= out["best_threshold"] <= 1.0
    assert out["seen"]["micro_acc"][1]["species"] >= 0.0
    assert out["unseen"]["micro_acc"][1]["species"] >= 0.0

    # the dna side-B extension routes via the DNA query instead
    unseen_q_dna = {"image": rng.standard_normal((4, d)).astype(np.float32) * 0.01,
                    "dna": unseen_keys[:4]}
    out_dna = method_nn(
        seen_q, unseen_q_dna, seen_keys, seen_labels, unseen_keys, unseen_labels,
        seen_gt, unseen_gt, max_k=3, k_list=[1, 3], side_b_query="dna",
    )
    assert out_dna["unseen"]["micro_acc"][1]["species"] >= 0.0


def test_method_linear_end_to_end(rng):
    from clibd_tpu.engine.fusion import method_linear
    from clibd_tpu.utils.metrics import LEVELS

    d, n_classes = 8, 4
    # well-separated class prototypes
    protos = rng.standard_normal((n_classes, d)).astype(np.float32) * 3
    train_n = 80
    y = np.arange(train_n) % n_classes
    train_feats = protos[y] + 0.1 * rng.standard_normal((train_n, d)).astype(np.float32)
    train_species = np.asarray([f"sp{c}" for c in y], dtype=object)
    species_to_levels = {
        f"sp{c}": {"order": f"o{c%2}", "family": f"f{c}", "genus": f"g{c}", "species": f"sp{c}"}
        for c in range(n_classes)
    }
    # seen queries drawn from the same prototypes
    qy = np.arange(12) % n_classes
    seen_q = {
        "image": (protos[qy] + 0.1 * rng.standard_normal((12, d))).astype(np.float32),
        "dna": rng.standard_normal((12, d)).astype(np.float32),
    }
    seen_gt = {lv: np.asarray([species_to_levels[f"sp{c}"][lv] for c in qy], dtype=object) for lv in LEVELS}
    # unseen side: image queries point at their unseen DNA keys (cross-modal
    # side B, reference parity) but with tiny magnitude, so the probe's
    # logits stay near-uniform (low confidence → routed to side B) while the
    # inner-product argmax — magnitude-invariant — still lands on the key
    unseen_keys = rng.standard_normal((6, d)).astype(np.float32)
    unseen_labels = {lv: np.asarray([f"u{lv}{i}" for i in range(6)], dtype=object) for lv in LEVELS}
    unseen_q = {
        "image": unseen_keys[:5] * 1e-3,
        "dna": rng.standard_normal((5, d)).astype(np.float32) * 0.01,
    }
    unseen_gt = {lv: unseen_labels[lv][:5] for lv in LEVELS}

    out = method_linear(
        train_feats, train_species, seen_q, unseen_q,
        unseen_keys, unseen_labels, seen_gt, unseen_gt,
        species_to_levels, max_k=3, k_list=[1, 3], probe_steps=300,
    )
    assert 0.0 <= out["best_threshold"] <= 1.0
    # the linear probe should classify the well-separated seen queries
    assert out["seen"]["micro_acc"][1]["species"] >= 0.8
    # and the dna-exact unseen queries should route to search
    assert out["unseen"]["micro_acc"][1]["species"] >= 0.8
    # routing accuracy bounds micro accuracy from above: a correctly-labeled
    # query is by definition routed to the correct (disjoint) species pool
    for split in ("seen", "unseen"):
        for k, acc in out[split]["micro_acc"].items():
            assert out[split]["routing_acc"][k] >= acc["species"] - 1e-9


def test_routing_accuracy_vectorized():
    from clibd_tpu.engine.fusion import routing_accuracy

    fused = np.asarray([["a", "x", "b"],   # top-1 hit
                        ["x", "y", "z"],   # no hit
                        ["x", "b", "x"]],  # hit at k=2
                       dtype=object)
    acc = routing_accuracy(fused, {"a", "b"}, k_list=[1, 2, 3, 5])
    assert acc == {1: pytest.approx(1 / 3), 2: pytest.approx(2 / 3), 3: pytest.approx(2 / 3)}
