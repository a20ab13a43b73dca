"""Per-class accuracy analysis + dataset sanity utilities (reference
scripts/result/{quick_script_for_acc, per_class_acc_analyze, class_statistic,
check_unique_barcode_and_bin_number}.py)."""

import os

import pytest

import numpy as np

from clibd_tpu.analysis.per_class import (
    avg_acc_by_key_count,
    per_class_acc_vs_key_count,
    plot_per_class_acc_vs_key_count,
    pretrain_seen_unseen_overlap,
    recompute_acc_from_predictions,
    unique_counts_summary,
)


def test_recompute_acc_matches_reference_semantics():
    preds = ["a", "a", "b", "c", "b"]
    gts = ["a", "b", "b", "c", "c"]
    micro, macro = recompute_acc_from_predictions(preds, gts)
    assert abs(micro - 3 / 5) < 1e-9
    # per class: a=1/1, b=1/1... b: gt indices {1,2} preds {a,b} → 1/2; c: {3,4}→{c,b} 1/2
    assert abs(macro - (1.0 + 0.5 + 0.5) / 3) < 1e-9


def test_avg_acc_by_key_count():
    out = avg_acc_by_key_count([1, 1, 5, 5, 5], [0.2, 0.4, 1.0, 0.0, 0.5])
    assert abs(out[1] - 0.3) < 1e-9
    assert abs(out[5] - 0.5) < 1e-9


def test_per_class_scatter_plot(tmp_path):
    rng = np.random.default_rng(0)
    keys = [{"species": f"sp_{i % 6}"} for i in range(30)]
    pca = {f"q{j}": {f"sp_{i}": float(rng.random()) for i in range(6)} for j in range(2)}
    xs, ys = per_class_acc_vs_key_count(pca["q0"], keys)
    assert len(xs) == 6 and all(x == 5 for x in xs)
    p = plot_per_class_acc_vs_key_count(pca, keys, str(tmp_path / "pc.png"))
    assert os.path.getsize(p) > 0


def test_unique_counts_and_pretrain_overlap(tiny_hdf5):
    counts = unique_counts_summary(tiny_hdf5, splits=["all_keys", "train_seen"])
    assert counts["all_keys"]["unique_barcode"] == 12
    assert 1 <= counts["all_keys"]["unique_species"] <= 12
    ov = pretrain_seen_unseen_overlap(
        tiny_hdf5, pretrain_split="no_split_and_seen_train",
        seen_split="seen_keys", unseen_splits=("unseen_keys",))
    assert ov["pretrain_classes"] >= 1
    assert set(ov) == {"pretrain_classes", "seen_in_pretrain",
                       "unseen_in_pretrain", "overlap_in_pretrain"}


def test_average_acc_for_species_membership():
    from clibd_tpu.analysis.per_class import average_acc_for_species_membership

    pca = {"Aedes aegypti": 0.9, "Culex pipiens": 0.5, "Apis mellifera": 0.1}
    # list uses the reference's lowercase/underscore form already
    out = average_acc_for_species_membership(pca, ["aedes_aegypti", "culex_pipiens"])
    assert out["in_list"] == pytest.approx(0.7)
    assert out["not_in_list"] == pytest.approx(0.1)
    assert out["n_in_list"] == 2 and out["n_not_in_list"] == 1
    # empty side → None, not NaN
    assert average_acc_for_species_membership(pca, [])["in_list"] is None
