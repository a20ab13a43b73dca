"""Round-2 analysis tail: similarity distributions, multi-experiment
comparison plots, dataset statistics summaries, failure-case /
independent / cached retrieval grids (VERDICT r1 missing #5/#8)."""

import json
import os

import numpy as np
import pytest


def _fake_dicts(n_keys=30, n_q=12, d=8, seed=0):
    rng = np.random.default_rng(seed)
    species = [f"sp_{i % 5}" for i in range(n_keys)]

    def labels(names):
        return [{"order": "Diptera", "family": "Sciaridae", "genus": "Bradysia",
                 "species": s} for s in names]

    def feats(n):
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    keys = {
        "processed_id_list": [f"k{i}" for i in range(n_keys)],
        "label_list": labels(species),
        "encoded_image_feature": feats(n_keys),
        "encoded_dna_feature": feats(n_keys),
        "encoded_language_feature": feats(n_keys),
    }
    qspecies = [f"sp_{i % 5}" for i in range(n_q)]
    seen = {
        "processed_id_list": [f"q{i}" for i in range(n_q)],
        "label_list": labels(qspecies),
        "encoded_image_feature": feats(n_q),
        "encoded_dna_feature": feats(n_q),
        "encoded_language_feature": feats(n_q),
    }
    unseen = {
        "processed_id_list": [f"u{i}" for i in range(n_q)],
        "label_list": labels(qspecies),
        "encoded_image_feature": feats(n_q),
        "encoded_dna_feature": feats(n_q),
        "encoded_language_feature": feats(n_q),
    }
    return keys, seen, unseen


def test_similarity_distributions(tmp_path):
    from clibd_tpu.analysis.distributions import (
        nearest_same_species_distances,
        plot_similarity_distributions,
        silhouette_summary,
        similarity_distribution_rows,
        write_distance_csv,
    )

    keys, seen, unseen = _fake_dicts()
    rows = similarity_distribution_rows(keys, seen, unseen)
    assert len(rows) == 24
    assert all("distance_for_image_to_dna" in r for r in rows)
    # vectorized result == brute force for one query
    r0 = rows[0]
    qi = 0
    q = seen["encoded_image_feature"][qi]
    same = [i for i, l in enumerate(keys["label_list"])
            if l["species"] == seen["label_list"][qi]["species"]]
    brute = min(np.linalg.norm(q - keys["encoded_dna_feature"][i]) for i in same)
    np.testing.assert_allclose(r0["distance_for_image_to_dna"], brute, rtol=1e-5)

    csv_path = write_distance_csv(rows, str(tmp_path / "d.csv"))
    assert os.path.getsize(csv_path) > 0
    png = plot_similarity_distributions(rows, str(tmp_path / "d.png"))
    assert os.path.getsize(png) > 0

    sil = silhouette_summary(keys["encoded_image_feature"], keys["label_list"])
    assert set(sil) == {"order", "family", "genus", "species"}
    assert np.isfinite(sil["species"])


def _fake_acc(offset=0.0):
    levels = {"order": 0.9 - offset, "family": 0.8 - offset,
              "genus": 0.7 - offset, "species": 0.6 - offset}
    entry = {s: {m: {k: dict(levels) for k in (1, 3, 5)}
                 for m in ("micro_acc", "macro_acc")}
             for s in ("seen", "unseen")}
    return {"encoded_image_feature": {"encoded_image_feature": entry}}


def test_multi_experiment_comparison(tmp_path):
    from clibd_tpu.analysis.compare import (
        add_harmonic_mean_acc,
        plot_multi_experiment_all_in_one,
        plot_multi_experiment_comparison,
    )

    exps = {"a": add_harmonic_mean_acc(_fake_acc(0.0)),
            "b": add_harmonic_mean_acc(_fake_acc(0.1))}
    hm = exps["a"]["encoded_image_feature"]["encoded_image_feature"]["harmonic_mean"]
    assert abs(hm["micro_acc"][1]["species"] - 0.6) < 1e-9  # seen==unseen → hm equal
    paths = plot_multi_experiment_comparison(exps, str(tmp_path / "cmp"))
    assert len(paths) == 6  # micro/macro × seen/unseen/harmonic_mean
    assert all(os.path.getsize(p) > 0 for p in paths)
    one = plot_multi_experiment_all_in_one(exps, str(tmp_path / "all.png"))
    assert os.path.getsize(one) > 0

    # round-trips through accuracy.json files
    from clibd_tpu.analysis.compare import load_experiment_acc_dicts

    p = tmp_path / "acc_a.json"
    with open(p, "w") as f:
        json.dump(_fake_acc(), f)
    loaded = load_experiment_acc_dicts({"a": str(p)})
    # JSON stringifies the k keys — the plotters must still find them
    paths = plot_multi_experiment_comparison(loaded, str(tmp_path / "cmp2"),
                                             splits=("seen",))
    assert len(paths) == 2


def test_line_plot_pair(tmp_path):
    from clibd_tpu.analysis.compare import plot_line_plot_pair

    exps = {"a": _fake_acc(0.0), "b": _fake_acc(0.1)}
    p = plot_line_plot_pair(exps, str(tmp_path / "lp.png"),
                            query_type="encoded_image_feature",
                            key_type="encoded_image_feature")
    assert p and os.path.getsize(p) > 0
    # absent pair → None, no file
    assert plot_line_plot_pair(exps, str(tmp_path / "none.png"),
                               query_type="encoded_dna_feature",
                               key_type="encoded_dna_feature") is None
    assert not (tmp_path / "none.png").exists()

    # an experiment with NO data for the pair must not shift later
    # experiments' legend colors off their lines, and >6 experiments must
    # all be drawn (colors cycle instead of truncating)
    import matplotlib.pyplot as plt

    many = {"empty": {}}
    many.update({f"e{i}": _fake_acc(0.01 * i) for i in range(7)})
    p2 = plot_line_plot_pair(many, str(tmp_path / "many.png"),
                             query_type="encoded_image_feature",
                             key_type="encoded_image_feature")
    assert p2 and os.path.getsize(p2) > 0

    captured = {}
    orig_subplots = plt.subplots

    def spy_subplots(*a, **k):
        fig, ax = orig_subplots(*a, **k)
        captured["ax"] = ax
        return fig, ax

    plt.subplots = spy_subplots
    try:
        plot_line_plot_pair(many, str(tmp_path / "many2.png"),
                            query_type="encoded_image_feature",
                            key_type="encoded_image_feature")
    finally:
        plt.subplots = orig_subplots
    ax = captured["ax"]
    # 7 drawn experiments × 2 splits = 14 lines; legend lists all 7 with
    # e0's color being the SECOND palette color (index 1: "empty" consumed
    # index 0 but drew nothing and is absent from the legend)
    data_lines = [l for l in ax.get_lines() if l.get_linewidth() == 3]
    assert len(data_lines) == 14
    # first legend (colors) was pinned with add_artist; collect all texts
    legend_texts = {t.get_text() for leg in ax.artists + [ax.legend_]
                    if hasattr(leg, "get_texts") for t in leg.get_texts()}
    assert {f"e{i}" for i in range(7)} <= legend_texts
    assert "empty" not in legend_texts
    color_leg = next(leg for leg in ax.artists if hasattr(leg, "get_texts")
                     and leg.get_texts() and leg.get_texts()[0].get_text() == "e0")
    e0_legend_color = color_leg.get_lines()[0].get_color()
    assert e0_legend_color == data_lines[0].get_color()


def test_statistics_summary(tiny_hdf5, tmp_path, capsys):
    from clibd_tpu.analysis.statistics import (
        count_frequencies,
        print_table,
        range_histogram,
        overlap_statistics,
        write_statistics_csvs,
    )

    paths = write_statistics_csvs(tiny_hdf5, str(tmp_path / "stats"))
    assert set(paths) >= {"split_level_counts", "records_per_class_histogram",
                          "seen_unseen_overlap", "histogram_png"}
    for p in paths.values():
        assert os.path.getsize(p) > 0
    with open(paths["split_level_counts"]) as f:
        header = f.readline().strip().split(",")
    assert header == ["split", "records", "order_classes", "family_classes",
                      "genus_classes", "species_classes"]

    from collections import Counter

    hist = range_histogram(Counter({"a": 1, "b": 5, "c": 500, "d": 5000}))
    assert hist == {"1": 1, "2-9": 1, "10-99": 0, "100-999": 1, "1000+": 1}
    ov = overlap_statistics(Counter({"x": 1, "y": 2}), Counter({"y": 1, "z": 3}))
    assert ov["overlap_classes"] == 1 and ov["unseen_classes"] == 2
    print_table([["split", "n"], ["train", 10]], "t")
    assert "train" in capsys.readouterr().out


def test_species_split_composition(tiny_hdf5, tmp_path):
    """data_visualization.py parity: composite species-split groups,
    maj/min membership fractions, stacked distribution figure."""
    from clibd_tpu.analysis.statistics import (
        species_split_composition,
        write_species_split_composition,
        plot_species_split_distribution,
    )
    import h5py

    comp = species_split_composition(tiny_hdf5)
    # fixture carries seen_keys/train_seen/val_seen/test_seen + val_unseen,
    # test_unseen + (combined) unseen_keys
    assert set(comp["groups"]) == {"seen", "val_unseen", "test_unseen"}
    seen = comp["groups"]["seen"]
    assert seen["records"] == 4 * 12  # 4 member splits × 12 records
    fr = seen["per_split_record_fraction"]
    assert set(fr) == {"seen_keys", "train_seen", "val_seen", "test_seen"}
    assert abs(sum(fr.values()) - 1.0) < 1e-9
    # every species in the fixture has >= 1 record; bins start at 2 so the
    # histogram never counts more species than the group holds
    assert sum(seen["range_histogram"].values()) <= seen["unique_species"]
    assert list(seen["range_histogram"]) == ["2-10", "11-20", "21-40",
                                             "41-80", "81-160", "161+"]

    # maj/min partition the global species set; fractions in [0, 1]
    mm = comp["maj_min"]
    with h5py.File(tiny_hdf5) as f:
        n_global = len({v for s in f.keys()
                        if s not in ("no_split_and_seen_train", "no_split",
                                     "all_keys", "single_species")
                        for v in f[s]["species"][...]})
    assert mm["maj"]["total"] + mm["min"]["total"] == n_global
    for kind in ("maj", "min"):
        for g in ("seen", "val_unseen", "test_unseen"):
            assert 0.0 <= mm[kind][g] <= 1.0

    csv_p = write_species_split_composition(comp, str(tmp_path / "comp.csv"))
    png_p = plot_species_split_distribution(comp, str(tmp_path / "comp.png"))
    assert os.path.getsize(csv_p) > 0 and os.path.getsize(png_p) > 0
    with open(csv_p) as f:
        header = f.readline().strip().split(",")
    assert header[:5] == ["row", "group", "records", "unique_species",
                          "per_split_record_fraction"]


def test_retrieve_images_multi_modes(tiny_hdf5, tmp_path):
    from clibd_tpu.engine.retrieval_grid import retrieve_images_multi

    rng = np.random.default_rng(3)
    n = 12

    def feats():
        x = rng.standard_normal((n, 8)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    import h5py

    with h5py.File(tiny_hdf5) as f:
        species = [s.decode() for s in f["all_keys"]["species"][...]]
    labels = [{"order": "o", "family": "f", "genus": "g", "species": s} for s in species]
    keys_dict = {
        "processed_id_list": [f"k{i}" for i in range(n)],
        "label_list": labels,
        "encoded_image_feature": feats(),
        "encoded_dna_feature": feats(),
    }
    query_dict = {
        "processed_id_list": [f"q{i}" for i in range(n)],
        "label_list": labels,
        "encoded_image_feature": feats(),
        "encoded_dna_feature": feats(),
    }

    out = retrieve_images_multi(
        str(tmp_path / "ind"), tiny_hdf5, "all_keys", "all_keys",
        query_dict, keys_dict, num_queries=3, max_k=2, independent=True,
    )
    assert len(out["figures"]) == 3  # one per pair
    assert os.path.exists(out["json"])

    # combined figure mode
    out2 = retrieve_images_multi(
        str(tmp_path / "comb"), tiny_hdf5, "all_keys", "all_keys",
        query_dict, keys_dict, num_queries=3, max_k=2, independent=False,
    )
    assert len(out2["figures"]) == 1

    # cached replay must not re-run kNN (poison the features to prove it)
    poisoned = dict(query_dict)
    poisoned["encoded_image_feature"] = None
    out3 = retrieve_images_multi(
        str(tmp_path / "ind"), tiny_hdf5, "all_keys", "all_keys",
        poisoned, keys_dict, num_queries=3, max_k=2, independent=True,
        load_cached_results=True,
    )
    assert [r["query"]["file_name"] for r in out3["record"]] == \
           [r["query"]["file_name"] for r in out["record"]]

    # failure-only mode: every sampled query's top-1 species must be wrong
    out4 = retrieve_images_multi(
        str(tmp_path / "fail"), tiny_hdf5, "all_keys", "all_keys",
        query_dict, keys_dict, num_queries=4, max_k=2, only_failures=True,
    )
    for r in out4["record"]:
        top1 = r["results"][0]["predictions"][0]["taxonomy"]["species"]
        assert top1 != r["query"]["taxonomy"]["species"]


def test_html_report(tmp_path):
    from clibd_tpu.analysis.report import eval_report_sections, write_html_report

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    folder = tmp_path / "run"
    (folder / "plots").mkdir(parents=True)
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    fig.savefig(folder / "plots" / "embedding_order.png")
    plt.close(fig)

    sections = eval_report_sections(str(folder),
                                    acc_table_rows=[["q", "k", "acc"], ["img", "img", 0.9]])
    out = write_html_report(str(folder / "report.html"), "tiny run", sections)
    text = open(out).read()
    assert "data:image/png;base64," in text
    assert "<table>" in text and "img" in text
    assert text.startswith("<!doctype html>")


def test_retrieve_cache_invalidated_on_pair_change(tiny_hdf5, tmp_path):
    """A cached retrieved_images.json written with different query_keys must
    be recomputed, not replayed (code-review finding)."""
    from clibd_tpu.engine.retrieval_grid import retrieve_images_multi

    rng = np.random.default_rng(5)
    n = 12

    def feats():
        x = rng.standard_normal((n, 8)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    labels = [{"order": "o", "family": "f", "genus": "g", "species": f"s{i%3}"}
              for i in range(n)]
    keys_dict = {"processed_id_list": [f"k{i}" for i in range(n)],
                 "label_list": labels,
                 "encoded_image_feature": feats(),
                 "encoded_dna_feature": feats()}
    query_dict = dict(keys_dict)

    one_pair = [("encoded_image_feature", "encoded_image_feature")]
    two_pairs = one_pair + [("encoded_dna_feature", "encoded_dna_feature")]
    out1 = retrieve_images_multi(str(tmp_path / "r"), tiny_hdf5, "all_keys",
                                 "all_keys", query_dict, keys_dict,
                                 query_keys=one_pair, num_queries=2, max_k=2)
    assert len(out1["record"][0]["results"]) == 1
    out2 = retrieve_images_multi(str(tmp_path / "r"), tiny_hdf5, "all_keys",
                                 "all_keys", query_dict, keys_dict,
                                 query_keys=two_pairs, num_queries=2, max_k=2,
                                 load_cached_results=True)
    assert len(out2["record"][0]["results"]) == 2  # recomputed, not replayed


def test_unique_barcode_bin_counts(tiny_hdf5):
    from clibd_tpu.analysis.statistics import unique_barcode_bin_counts

    out = unique_barcode_bin_counts(tiny_hdf5, splits=["all_keys", "test_seen"])
    assert set(out) == {"all_keys", "test_seen"}
    for entry in out.values():
        assert entry["records"] == 12
        assert 1 <= entry["unique_barcodes"] <= 12
        assert entry["unique_dna_bins"] is None  # fixture has no dna_bin column


def test_interactive_embedding_plot(tmp_path):
    """Self-contained interactive HTML plot: template fully rendered, data
    embedded as valid JSON, modality/level controls present."""
    import json
    import re

    import numpy as np

    from clibd_tpu.analysis.interactive import write_interactive_embedding_plot

    rng = np.random.default_rng(0)
    n = 40
    labels = [{"order": f"o{i%2}", "family": f"f{i%3}", "genus": f"g{i%4}",
               "species": f"s{i%5}"} for i in range(n)]
    pieces = {"image": rng.normal(size=(n, 2)),
              "text": rng.normal(size=(5, 2))}
    inv = np.arange(n) % 5
    path = write_interactive_embedding_plot(
        str(tmp_path / "emb.html"), pieces, labels, lang_inverse=inv)
    src = open(path).read()
    assert "{data_json}" not in src and "{{" not in src
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", src, re.S).group(1))
    assert len(data["points"]) == 2 * n
    assert data["modalities"] == ["image", "text"]
    # text rows route through lang_inverse
    t0 = [p for p in data["points"] if p["m"] == "text"][0]
    assert t0["order"] == "o0"
    for control in ('id="level"', 'id="m_image"', 'id="m_text"', "function draw()"):
        assert control in src


def test_generate_embedding_plot_html_format(tmp_path):
    import numpy as np

    from clibd_tpu.analysis.plots import generate_embedding_plot

    rng = np.random.default_rng(1)
    n = 30
    labels = [{"order": f"o{i%2}", "family": f"f{i%2}", "genus": f"g{i%3}",
               "species": f"s{i%3}"} for i in range(n)]
    written = generate_embedding_plot(
        str(tmp_path / "plots"), rng.normal(size=(n, 8)).astype(np.float32),
        rng.normal(size=(n, 8)).astype(np.float32), None, labels,
        formats=("png", "html"))
    html_files = [p for p in written if p.endswith(".html")]
    assert len(html_files) == 1
    assert html_files[0].endswith("embedding_interactive.html")


def test_poster_plot(tmp_path):
    """Poster-style per-level figure (plot_for_5m_poster.py — whose own loop
    was dead code; ours actually draws)."""
    from clibd_tpu.analysis.compare import plot_poster_accuracy

    acc = _fake_acc(0.05)
    p = plot_poster_accuracy(acc, str(tmp_path / "poster.pdf"),
                             experiment_name="Image + DNA + Taxonomy")
    assert os.path.getsize(p) > 0


def test_subset_confusion_matrices(tmp_path):
    from clibd_tpu.analysis.plots import (
        most_common_class_indices,
        most_confused_class_indices,
        plot_subset_confusion_matrices,
    )

    # 4 classes: c0 dominant (most correct), c2<->c3 heavily confused
    cm = np.array([[9, 0, 0, 1],
                   [1, 5, 0, 0],
                   [0, 0, 2, 6],
                   [0, 0, 7, 1]], dtype=np.int64)
    common = most_common_class_indices(cm, top_n=2)
    assert list(common) == [0, 1]
    cm_norm = cm / cm.sum(axis=1, keepdims=True)
    confused = most_confused_class_indices(cm_norm, top_n=2)
    assert confused == [2, 3]

    # end-to-end from a pred_dict payload (the cached JSON layout)
    rng = np.random.default_rng(0)
    n = 40
    gt = [{lv: f"{lv}{i % 4}" for lv in ("order", "family", "genus", "species")}
          for i in range(n)]
    preds = [{lv: [f"{lv}{(i + (1 if i % 5 == 0 else 0)) % 4}"]
              for lv in ("order", "family", "genus", "species")} for i in range(n)]
    pred_dict = {
        "seen_gt_label": gt,
        "unseen_gt_label": [],
        "encoded_image_feature": {"encoded_image_feature": {
            "curr_seen_pred_list": preds, "curr_unseen_pred_list": []}},
    }
    paths = plot_subset_confusion_matrices(
        pred_dict, str(tmp_path / "cmx"),
        query_key_pairs=(("encoded_image_feature", "encoded_image_feature"),),
        levels=("species",), top_n=3)
    assert len(paths) == 2  # common + confused, seen split only
    assert all(os.path.getsize(p) > 0 for p in paths)

    # predictions OUTSIDE the split's ground-truth class set (e.g. unseen
    # queries predicted as seen species) must stay in the matrix: with a
    # gt-only label set sklearn drops those samples and the row
    # normalization inflates the diagonal
    gt2 = [{lv: "u0" for lv in ("order", "family", "genus", "species")}
           for _ in range(10)]
    # 8/10 predicted as a class not among the ground truths, 2 correct
    preds2 = [{lv: ["seenX" if i < 8 else "u0"]
               for lv in ("order", "family", "genus", "species")}
              for i in range(10)]
    pred_dict2 = {
        "seen_gt_label": [],
        "unseen_gt_label": gt2,
        "encoded_image_feature": {"encoded_dna_feature": {
            "curr_seen_pred_list": [], "curr_unseen_pred_list": preds2}},
    }
    out2 = plot_subset_confusion_matrices(
        pred_dict2, str(tmp_path / "cmx2"),
        query_key_pairs=(("encoded_image_feature", "encoded_dna_feature"),),
        levels=("species",), top_n=2)
    assert len(out2) == 2
    # and the normalized diagonal for u0 is 0.2, not 1.0 — checked via the
    # same code path's building blocks
    from sklearn.metrics import confusion_matrix

    y_true = ["u0"] * 10
    y_pred = ["seenX"] * 8 + ["u0"] * 2
    classes = sorted(set(y_true) | set(y_pred))
    cm2 = confusion_matrix(y_true, y_pred, labels=classes)
    row = cm2[classes.index("u0")].astype(float)
    assert row.sum() == 10 and row[classes.index("u0")] / row.sum() == 0.2
