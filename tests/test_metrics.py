import numpy as np

from clibd_tpu.utils.metrics import (
    harmonic_mean,
    labels_to_level_arrays,
    predictions_to_level_arrays,
    top_k_macro_accuracy,
    top_k_micro_accuracy,
)


def _reference_micro(pred_list, gt_list, k_list):
    """Direct transcription of the reference's loop semantics for testing."""
    out = {}
    levels = ["order", "family", "genus", "species"]
    for k in k_list:
        out[k] = {}
        for level in levels:
            correct = 0
            for pred, gt in zip(pred_list, gt_list):
                if gt[level] in pred[level][:k]:
                    correct += 1
            out[k][level] = correct / len(pred_list)
    return out


def _reference_macro(pred_list, gt_list, k_list):
    levels = ["order", "family", "genus", "species"]
    macro = {}
    for k in k_list:
        macro[k] = {}
        for level in levels:
            pred_counts, gt_counts = {}, {}
            for pred, gt in zip(pred_list, gt_list):
                g = gt[level]
                pred_counts.setdefault(g, 0)
                gt_counts.setdefault(g, 0)
                if g in pred[level][:k]:
                    pred_counts[g] += 1
                gt_counts[g] += 1
            macro[k][level] = float(np.mean([pred_counts[g] / gt_counts[g] for g in gt_counts]))
    return macro


def _random_case(rng, n=50, max_k=5):
    levels = ["order", "family", "genus", "species"]
    vocab = {lv: [f"{lv}{i}" for i in range(4)] for lv in levels}
    gt_list = [{lv: rng.choice(vocab[lv]) for lv in levels} for _ in range(n)]
    pred_list = [{lv: list(rng.choice(vocab[lv], size=max_k)) for lv in levels} for _ in range(n)]
    return pred_list, gt_list


def test_micro_macro_match_reference_semantics(rng):
    pred_list, gt_list = _random_case(rng)
    gt_arrays = labels_to_level_arrays(gt_list)
    pred_arrays = {lv: np.asarray([p[lv] for p in pred_list], dtype=object) for lv in gt_arrays}

    ours = top_k_micro_accuracy(pred_arrays, gt_arrays, k_list=[1, 3, 5])
    ref = _reference_micro(pred_list, gt_list, [1, 3, 5])
    for k in (1, 3, 5):
        for lv in gt_arrays:
            assert abs(ours[k][lv] - ref[k][lv]) < 1e-12

    ours_macro, per_class = top_k_macro_accuracy(pred_arrays, gt_arrays, k_list=[1, 3, 5])
    ref_macro = _reference_macro(pred_list, gt_list, [1, 3, 5])
    for k in (1, 3, 5):
        for lv in gt_arrays:
            assert abs(ours_macro[k][lv] - ref_macro[k][lv]) < 1e-12
    assert all(0.0 <= v <= 1.0 for v in per_class[1]["order"].values())


def test_prediction_mapping():
    key_labels = {lv: np.asarray([f"{lv}{i}" for i in range(6)], dtype=object) for lv in ("order", "family", "genus", "species")}
    indices = np.array([[0, 1, 2], [5, 4, 3]])
    preds = predictions_to_level_arrays(indices, key_labels)
    assert preds["order"][0, 0] == "order0"
    assert preds["species"][1, 0] == "species5"


def test_harmonic_mean():
    assert harmonic_mean(0.0, 0.5) == 0.0
    assert abs(harmonic_mean(0.5, 0.5) - 0.5) < 1e-12
    assert abs(harmonic_mean(0.2, 0.8) - 0.32) < 1e-12
