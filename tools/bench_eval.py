"""End-to-end `clibd eval` at BIOSCAN-1M production shapes (VERDICT r3 #5).

Times the REAL cmd_eval path — cached-embedding load, the full kNN grid
(9 query/key modality pairs × 4 taxonomy levels × micro/macro, on the
chip), result tables/CSVs/JSONs, embedding plots, HTML report — with
synthetic unit-norm embeddings at the reference's eval scale
(DATA.md:44-59: ~40k test queries, ~21k keys): seen 20k + unseen 20k
queries, 21k keys × 3 modalities, dim 768, ~1.3k species.

The per-phase breakdown comes from cmd_eval's own PhaseTimer
(CLIBD_EVAL_TIMING=1) so the bench measures the production code path,
not a reimplementation.

Usage: python tools/bench_eval.py [--seen 20000 --unseen 20000 --keys 21000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_split(rng, n, dim, n_species, species_names):
    d = {}
    for t in ("encoded_image_feature", "encoded_dna_feature",
              "encoded_language_feature"):
        x = rng.standard_normal((n, dim), dtype=np.float32)
        d[t] = x / np.linalg.norm(x, axis=1, keepdims=True)
    sp = rng.integers(0, n_species, n)
    d["label_list"] = [
        {"order": f"o{m % 15}", "family": f"f{m % 120}",
         "genus": f"g{m % 400}", "species": species_names[m]}
        for m in sp
    ]
    d["file_name_list"] = [f"rec_{i}" for i in range(n)]
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seen", type=int, default=20_000)
    ap.add_argument("--unseen", type=int, default=20_000)
    ap.add_argument("--keys", type=int, default=21_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--species", type=int, default=1300)
    a = ap.parse_args()

    os.environ["CLIBD_EVAL_TIMING"] = "1"
    import tempfile

    root = tempfile.mkdtemp(prefix="bench_eval_")
    rng = np.random.default_rng(0)
    species_names = [f"sp{m}" for m in range(a.species)]

    seen = synth_split(rng, a.seen, a.dim, a.species, species_names)
    unseen = synth_split(rng, a.unseen, a.dim, a.species, species_names)
    keys = synth_split(rng, a.keys, a.dim, a.species, species_names)
    # all_key_features exactly as extract_split stacks them (3 modalities)
    keys["all_key_features"] = np.concatenate(
        [keys["encoded_image_feature"], keys["encoded_dna_feature"],
         keys["encoded_language_feature"]])
    keys["all_key_features_label"] = keys["label_list"] * 3

    from clibd_tpu.config.schema import GlobalConfig
    from clibd_tpu.engine.extract import save_extracted_features, save_labels_and_ids

    g = GlobalConfig()
    mc = g.model_config
    folder = os.path.join(root, "extracted_embedding", mc.dataset, mc.model_output_name)
    os.makedirs(folder, exist_ok=True)
    eval_on = "test"
    t0 = time.time()
    save_extracted_features(
        os.path.join(folder, f"extracted_feature_from_{eval_on}_split.hdf5"),
        seen, unseen, keys)
    save_labels_and_ids(
        os.path.join(folder, f"labels_{eval_on}.json"),
        os.path.join(folder, f"processed_id_{eval_on}.json"),
        seen, unseen, keys)
    print(f"synthetic cache written ({time.time()-t0:.1f}s) → {folder}", flush=True)

    from clibd_tpu.cli import main as cli_main

    t0 = time.time()
    rc = cli_main([
        "eval",
        f"project_root_path={root}",
        "load_inference=true",
        "save_inference=true",
        "model_config.language.enable=true",
    ])
    wall = time.time() - t0
    q = a.seen + a.unseen
    print(f"\nclibd eval end-to-end: rc={rc}  wall={wall:.1f}s  "
          f"({q} queries x {a.keys} keys x 3 modalities, dim {a.dim})")


if __name__ == "__main__":
    main()
