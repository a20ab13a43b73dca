"""Dataset statistics summaries (reference scripts/create_statistics_summaries.py,
723 LoC): per-split × per-level class/record counts, records-per-class range
histograms, seen/unseen overlap statistics, average-records-per-class tables,
with CSV and PNG outputs."""

from __future__ import annotations

import csv
import os
import sys
from collections import Counter
from typing import Dict, List, Optional, Sequence, TextIO

import numpy as np

LEVELS = ("order", "family", "genus", "species")

# the reference's records-per-class bins (create_statistics_summaries.py ranges)
DEFAULT_RANGES = ((1, 1), (2, 9), (10, 99), (100, 999), (1000, None))


def count_frequencies(label_dicts: Sequence[dict],
                      levels: Sequence[str] = LEVELS) -> Dict[str, Counter]:
    """{level: Counter(class → record count)} (reference count_frequencies)."""
    out = {lvl: Counter() for lvl in levels}
    for d in label_dicts:
        for lvl in levels:
            out[lvl][d.get(lvl, "not_classified")] += 1
    return out


def split_level_counts(hdf5_path: str, splits: Optional[Sequence[str]] = None) -> Dict[str, Dict]:
    """Per split: records + per-level unique-class counts straight from the
    HDF5 (the reference walks the TSVs; the HDF5 groups are the same data)."""
    import h5py

    out: Dict[str, Dict] = {}
    with h5py.File(hdf5_path, "r") as f:
        names = splits if splits is not None else list(f.keys())
        for split in names:
            if split not in f:
                continue
            g = f[split]
            entry = {"records": int(g["order"].shape[0])}
            for lvl in LEVELS:
                vals = [v.decode() if isinstance(v, bytes) else str(v) for v in g[lvl][...]]
                entry[f"{lvl}_classes"] = len(set(vals))
            out[split] = entry
    return out


def range_histogram(counts: Counter, ranges=DEFAULT_RANGES) -> Dict[str, int]:
    """Bin classes by records-per-class (reference expand_ranges/get_dist):
    {"1": n_singletons, "2-9": ..., "1000+": ...} counting CLASSES per bin."""
    out = {}
    for lo, hi in ranges:
        label = f"{lo}" if lo == hi else (f"{lo}+" if hi is None else f"{lo}-{hi}")
        out[label] = sum(1 for c in counts.values()
                         if c >= lo and (hi is None or c <= hi))
    return out


def overlap_statistics(seen_counts: Counter, unseen_counts: Counter) -> Dict:
    """Class overlap between seen/unseen groupings (reference
    get_overlap_statistics; the split design asserts species-level overlap
    is zero — exam_1m_splits_overlap.py)."""
    seen = set(seen_counts)
    unseen = set(unseen_counts)
    both = seen & unseen
    return {
        "seen_classes": len(seen),
        "unseen_classes": len(unseen),
        "overlap_classes": len(both),
        "overlap_fraction_of_unseen": (len(both) / len(unseen)) if unseen else 0.0,
    }


def average_records_per_class(counts: Counter) -> float:
    return (sum(counts.values()) / len(counts)) if counts else 0.0


def print_table(rows: List[Sequence], title: str, output: Optional[TextIO] = None) -> None:
    """ASCII table (reference print_table, create_statistics_summaries.py:459).
    output resolves to sys.stdout at CALL time (an import-time default would
    escape pytest's capture and any later stream redirection)."""
    if output is None:
        output = sys.stdout
    if not rows:
        return
    widths = [max(len(str(r[i])) for r in rows) for i in range(len(rows[0]))]
    print(title, file=output)
    for ri, row in enumerate(rows):
        line = "  ".join(str(v).ljust(w) for v, w in zip(row, widths))
        print(line, file=output)
        if ri == 0:
            print("-" * len(line), file=output)


def write_statistics_csvs(hdf5_path: str, output_dir: str,
                          splits: Optional[Sequence[str]] = None) -> Dict[str, str]:
    """The full summary: split_level_counts.csv, per-level range histograms,
    seen/unseen species overlap, averages.  Returns {name: path}."""
    import h5py

    os.makedirs(output_dir, exist_ok=True)
    paths: Dict[str, str] = {}

    counts_by_split = split_level_counts(hdf5_path, splits)
    p = os.path.join(output_dir, "split_level_counts.csv")
    with open(p, "w", newline="") as f:
        cols = ["split", "records"] + [f"{l}_classes" for l in LEVELS]
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for split, entry in sorted(counts_by_split.items()):
            w.writerow({"split": split, **entry})
    paths["split_level_counts"] = p

    with h5py.File(hdf5_path, "r") as f:
        freq_by_split = {}
        for split in counts_by_split:
            g = f[split]
            dicts = [
                {lvl: (v.decode() if isinstance(v, bytes) else str(v))
                 for lvl, v in zip(LEVELS, vals)}
                for vals in zip(*(g[lvl][...] for lvl in LEVELS))
            ]
            freq_by_split[split] = count_frequencies(dicts)

    p = os.path.join(output_dir, "records_per_class_histogram.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        header_bins = list(range_histogram(Counter({"x": 1})).keys())
        w.writerow(["split", "level", "avg_records_per_class"] + header_bins)
        for split, freqs in sorted(freq_by_split.items()):
            for lvl in LEVELS:
                hist = range_histogram(freqs[lvl])
                w.writerow([split, lvl, round(average_records_per_class(freqs[lvl]), 2)]
                           + [hist[b] for b in header_bins])
    paths["records_per_class_histogram"] = p

    seen_split = next((s for s in ("train_seen", "seen_keys", "all_keys") if s in freq_by_split), None)
    unseen_split = next((s for s in ("test_unseen", "val_unseen", "unseen_keys") if s in freq_by_split), None)
    if seen_split and unseen_split:
        p = os.path.join(output_dir, "seen_unseen_overlap.csv")
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["level", "seen_classes", "unseen_classes",
                        "overlap_classes", "overlap_fraction_of_unseen"])
            for lvl in LEVELS:
                st = overlap_statistics(freq_by_split[seen_split][lvl],
                                        freq_by_split[unseen_split][lvl])
                w.writerow([lvl, st["seen_classes"], st["unseen_classes"],
                            st["overlap_classes"], round(st["overlap_fraction_of_unseen"], 4)])
        paths["seen_unseen_overlap"] = p

    p = os.path.join(output_dir, "unique_barcode_bin_counts.csv")
    ub = unique_barcode_bin_counts(hdf5_path, splits=list(counts_by_split))
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["split", "records", "unique_barcodes", "unique_dna_bins"])
        for split, entry in sorted(ub.items()):
            w.writerow([split, entry["records"], entry["unique_barcodes"],
                        entry["unique_dna_bins"]])
    paths["unique_barcode_bin_counts"] = p

    paths["histogram_png"] = plot_records_per_class_histogram(
        freq_by_split, os.path.join(output_dir, "records_per_class_histogram.png"))
    return paths


def unique_barcode_bin_counts(hdf5_path: str,
                              splits: Optional[Sequence[str]] = None) -> Dict[str, Dict]:
    """Unique barcode + DNA-BIN counts per split (reference scripts/result/
    check_unique_barcode_and_bin_number.py — which joins the 5M TSV for
    dna_bin; here the HDF5's own dna_bin column is used when present)."""
    import h5py

    from ..data.hdf5 import list_splits

    if splits is None:
        splits = list_splits(hdf5_path)
    out: Dict[str, Dict] = {}
    with h5py.File(hdf5_path, "r") as f:
        for split in splits:
            g = f[split]
            if "barcode" not in g:
                continue
            barcodes = g["barcode"][...]
            entry = {"records": int(len(barcodes)),
                     "unique_barcodes": int(len(np.unique(barcodes))),
                     "unique_dna_bins": None}
            if "dna_bin" in g:
                entry["unique_dna_bins"] = int(len(np.unique(g["dna_bin"][...])))
            out[split] = entry
    return out


def plot_records_per_class_histogram(freq_by_split: Dict[str, Dict[str, Counter]],
                                     output_path: str, level: str = "species") -> str:
    """Grouped bar chart of class counts per records-per-class bin (reference
    plot_count_in_splits_as_histogram)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    splits = sorted(freq_by_split)
    bins = list(range_histogram(Counter({"x": 1})).keys())
    x = np.arange(len(bins))
    width = 0.8 / max(len(splits), 1)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for i, split in enumerate(splits):
        hist = range_histogram(freq_by_split[split][level])
        ax.bar(x + i * width, [hist[b] for b in bins], width, label=split)
    ax.set_xticks(x + width * (len(splits) - 1) / 2)
    ax.set_xticklabels(bins)
    ax.set_xlabel(f"records per {level}")
    ax.set_ylabel("classes")
    ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
    return output_path
