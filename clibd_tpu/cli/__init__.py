"""Command-line entry points (replacing the reference's Hydra-decorated
scripts, README.md:109-127):

  clibd train   --experiment <cfg.yaml> [--global-config g.yaml] [k=v ...]
  clibd eval    --experiment <cfg.yaml> ...      (inference_and_eval.py)
  clibd extract --experiment <cfg.yaml> --split all_keys --out emb.hdf5
  clibd bench   (throughput microbenchmark)
  clibd configs (list bundled experiment configs)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

from ..config import GlobalConfig, load_config, save_config

from .common import _dataset_hdf5_path, _load_cfg, _resolve_params, _checkpoint_candidates, _resolve_params_local, _stringify, _extract_split_auto
from .train_cmds import cmd_train, cmd_simclr, cmd_finetune
from .eval_cmds import cmd_eval, cmd_zeroshot, cmd_method_nn, cmd_verify_parity
from .extract_cmds import cmd_extract, cmd_bzsl_extract, cmd_extract_single
from .data_cmds import cmd_create_splits, cmd_build_hdf5, cmd_subset_hdf5, cmd_generate_split_csv, cmd_fetch_taxonomy
from .analysis_cmds import cmd_flatten_csv, cmd_plot_embeddings, cmd_stats_summary, cmd_compare_experiments, cmd_confusion_matrices, cmd_attention_maps, cmd_failure_cases
from .ops_cmds import cmd_serve, cmd_doctor, cmd_configs, cmd_bench


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="clibd", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--experiment", "-e", default=None, help="experiment config name or path")
        p.add_argument("--global-config", "-g", default=None)
        p.add_argument("--hdf5", default=None, help="override dataset HDF5 path")
        p.add_argument("overrides", nargs="*", help="key.path=value overrides")

    p_train = sub.add_parser("train", help="contrastive training (train_cl.py)")
    common(p_train)
    p_train.add_argument("--output-dir", default=None)
    p_train.add_argument("--train-split", default="no_split_and_seen_train")
    p_train.add_argument("--resume", nargs="?", const=True, default=None,
                         help="resume from checkpoint dir (default: <output>/last)")

    p_eval = sub.add_parser("eval", help="extract + retrieval eval (inference_and_eval.py)")
    common(p_eval)
    p_eval.add_argument("--unimodel", default=None, metavar="SIMCLR_CKPT",
                        help="evaluate a SimCLR-pretrained image encoder alone "
                             "(unimodel/inference_and_eval_with_unimodel.py)")

    p_extract = sub.add_parser("extract", help="embedding export (save_embedding/)")
    common(p_extract)
    p_extract.add_argument("--split", default="all_keys")
    p_extract.add_argument("--out", default="embeddings.hdf5")
    p_extract.add_argument("--stream", action="store_true",
                           help="append per batch (resizable HDF5; 5M-scale "
                                "exports that do not fit RAM)")
    p_extract.add_argument("--resume", action="store_true",
                           help="with --stream: continue a partial output "
                                "(bit-identical to an uninterrupted run)")

    p_simclr = sub.add_parser("simclr", help="SimCLR image pretraining (unimodel/)")
    common(p_simclr)
    p_simclr.add_argument("--output-dir", default=None)
    p_simclr.add_argument("--train-split", default="no_split_and_seen_train")
    p_simclr.add_argument("--temperature", type=float, default=0.07)

    p_splits = sub.add_parser("create-splits", help="BIOSCAN split creation (dataset/create_splits.py)")
    p_splits.add_argument("--metadata", required=True)
    p_splits.add_argument("--out", default="splits.tsv")
    p_splits.add_argument("--min-species-size", type=int, default=10)
    p_splits.add_argument("--seen-ratio", type=float, default=0.8)
    p_splits.add_argument("--seed", type=int, default=None)
    p_splits.set_defaults(overrides=[])

    p_build = sub.add_parser("build-hdf5", help="build split HDF5 (data_processing/)")
    p_build.add_argument("--metadata", required=True)
    p_build.add_argument("--splits", default=None)
    p_build.add_argument("--image-dir", required=True)
    p_build.add_argument("--out", required=True)
    p_build.add_argument("--vocab", default=None, help="vocab.txt for language token pre-tokenization")
    p_build.add_argument("--compress", action="store_true")
    p_build.add_argument("--parallel", action="store_true",
                         help="5M-scale builder: multiprocessing ingestion, chunked resumable writes")
    p_build.add_argument("--chunk-size", type=int, default=4096)
    p_build.add_argument("--processes", type=int, default=None)
    p_build.add_argument("--resume", action="store_true",
                         help="continue an interrupted --parallel build")
    p_build.set_defaults(overrides=[])

    p_bzsl = sub.add_parser("bzsl-extract", help="INSECT feature → BZSL CSVs (scripts/BZSL/)")
    common(p_bzsl)
    p_bzsl.add_argument("--batch-size", type=int, default=200)

    p_single = sub.add_parser("extract-single", help="embed one image/barcode (save_embedding/extract_single_image.py)")
    common(p_single)
    p_single.add_argument("--image", default=None)
    p_single.add_argument("--barcode", default=None)
    p_single.add_argument("--out", default=None)

    p_serve = sub.add_parser(
        "serve", help="resident HTTP inference server (micro-batched embed + "
                      "top-k search; the backend-export use case of "
                      "save_embedding/extract_embedding_for_backend.py, resident)")
    common(p_serve)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--keys", default=None,
                         help="save_embedding_export HDF5 gallery for /search")
    p_serve.add_argument("--window-ms", type=float, default=4.0,
                         help="micro-batch coalescing window")
    p_serve.add_argument("--max-batch", type=int, default=32)
    p_serve.add_argument("--no-warm", action="store_true",
                         help="skip compiling all (modality, bucket) programs at startup")
    p_serve.add_argument("--shard-keys", action="store_true",
                         help="shard the gallery rows over all local devices "
                              "(for galleries larger than one chip's HBM)")
    p_serve.add_argument("--keys-dtype", default="float32",
                         choices=("float32", "int8"),
                         help="int8: 4x-compressed gallery (approximate "
                              "scores; 5M x 768 fits one chip's HBM)")
    p_serve.add_argument("--keys-rerank", type=int, default=4,
                         help="oversample factor for the exact host-side "
                              "re-rank of candidates against the original "
                              "fp32 rows; active for int8 galleries and for "
                              "fp32 under --keys-selector approx (0 = trust "
                              "device ranks, no host fp32 copy)")
    p_serve.add_argument("--keys-selector", default="auto",
                         choices=("auto", "exact", "approx"),
                         help="candidate selection: approx = TPU-native "
                              "approx_max_k (4.8x at 5M keys; with "
                              "--keys-rerank the final top-k is re-ranked "
                              "exactly on the host); auto = approx only for "
                              "int8+rerank galleries, exact otherwise")
    p_serve.add_argument("--compile-cache", default=None, metavar="DIR",
                         help="persistent XLA compilation cache directory: "
                              "server restarts skip recompiles (129 s -> "
                              "7 s measured warm; also via "
                              "CLIBD_COMPILE_CACHE for every subcommand)")
    p_serve.add_argument("--reload-watch", type=float, default=0.0,
                         metavar="SECONDS",
                         help="poll the --keys file and hot-reload the "
                              "gallery when it changes (stable across two "
                              "polls; failed loads retry with the old "
                              "gallery serving); 0 = off")
    p_serve.add_argument("--language-vocab", default=None,
                         help="WordPiece vocab.txt enabling taxonomy-text "
                              "queries (text → language embedding)")
    p_serve.add_argument("--max-queue", type=int, default=1024,
                         help="shed load (503) beyond this request backlog")

    p_doc = sub.add_parser("doctor", help="deployment diagnostic: device "
                                          "reachability (bounded), native decoder, "
                                          "config/dataset/checkpoint resolution")
    common(p_doc)
    p_doc.add_argument("--timeout", type=float, default=30.0,
                       help="seconds before declaring the device unreachable")
    p_doc.add_argument("--build-native", action="store_true",
                       help="attempt to build the native decoder if missing")

    p_flat = sub.add_parser("flatten-csv", help="flatten results.csv (scripts/flattenCsv.py)")
    p_flat.add_argument("--input", required=True)
    p_flat.add_argument("--out", default="flat.csv")
    p_flat.set_defaults(overrides=[])

    p_plot = sub.add_parser("plot-embeddings", help="2D embedding plots from cached features")
    common(p_plot)
    p_plot.add_argument("--features", required=True, help="extracted_feature_*.hdf5")
    p_plot.add_argument("--labels", required=True, help="labels_*.json")
    p_plot.add_argument("--group", default="key", choices=["seen", "unseen", "key"])
    p_plot.add_argument("--out", default="plots")

    p_ft = sub.add_parser("finetune", help="supervised fine-tune on INSECT (scripts/BZSL/fine_tune_*.py)")
    common(p_ft)
    p_ft.add_argument("--modality", choices=["image", "dna"], default="image")
    p_ft.add_argument("--epochs", type=int, default=15)
    p_ft.add_argument("--lr", type=float, default=1e-4)
    p_ft.add_argument("--freeze-encoder", action="store_true")
    p_ft.add_argument("--output-dir", default=None)

    p_mnn = sub.add_parser("method-nn", help="seen/unseen threshold fusion (scripts/method_nn.py)")
    common(p_mnn)
    p_mnn.add_argument("--unseen-keys-split", default="unseen_keys",
                       help="comma-separated splits concatenated into the "
                            "unseen key set (the reference pools "
                            "val_unseen_keys,test_unseen_keys — the "
                            "unseen_keys group is that union)")
    p_mnn.add_argument("--side-b-query", default="image", choices=("image", "dna"),
                       help="query modality for the unseen-DNA-key search; "
                            "the reference uses the image query on both "
                            "sides (cross-modal side B)")
    p_mnn.add_argument("--linear", action="store_true",
                       help="method_linear variant: side A = linear probe "
                            "over image features (scripts/method_linear.py)")
    p_mnn.add_argument("--probe-steps", type=int, default=500)
    p_mnn.add_argument("--probe", default="frozen", choices=("frozen", "full"),
                       help="frozen: linear probe on extracted features; "
                            "full: fine-tune the whole image encoder + head "
                            "(reference method_linear.py:458-490)")
    p_mnn.add_argument("--probe-epochs", type=int, default=5,
                       help="epochs for --probe full fine-tuning")
    p_mnn.add_argument("--train-split", default="seen_keys",
                       help="split whose image features train the probe "
                            "(must cover every seen species)")

    p_zs = sub.add_parser("zeroshot", help="CLIP/BioCLIP zero-shot eval (scripts/bioclip/)")
    common(p_zs)
    p_zs.add_argument("--split", default="test_seen")
    p_zs.add_argument("--level", default="species")
    p_zs.add_argument("--batch-size", type=int, default=64)
    p_zs.add_argument("--image-to-image", action="store_true",
                      help="retrieve against the CLIP-encoded image gallery instead of text prototypes "
                           "(..._with_image_to_image.py)")
    p_zs.add_argument("--four-level", action="store_true",
                      help="class prompts are 'order family genus species' strings "
                           "(..._with_four_level_text_input.py)")
    p_zs.add_argument("--keys-split", default="all_keys")

    p_tax = sub.add_parser("fetch-taxonomy", help="NCBI-Entrez species taxonomy fetch (data/INSECT/)")
    p_tax.add_argument("--out", required=True)
    p_tax.add_argument("--email", required=True, help="NCBI requires a contact email")
    p_tax.add_argument("--species", nargs="*", default=None)
    p_tax.add_argument("--res101-mat", default=None, help="INSECT res101.mat to read species from")
    p_tax.set_defaults(overrides=[])

    p_stats = sub.add_parser("stats-summary", help="dataset statistics summaries (create_statistics_summaries.py)")
    p_stats.add_argument("--hdf5", required=True)
    p_stats.add_argument("--out", required=True)
    p_stats.add_argument("--splits-list", nargs="*", default=None)
    p_stats.set_defaults(overrides=[])

    p_cmx = sub.add_parser("confusion-matrices",
                           help="most-common/most-confused class heatmaps from a "
                                "cached pred_dict JSON (create_confusion_matrix.py)")
    p_cmx.add_argument("--pred-json", required=True,
                       help="pred_dict_<split>.json written by `clibd eval`")
    p_cmx.add_argument("--out", default="confusion_matrix")
    p_cmx.add_argument("--top-n", type=int, default=10)

    p_cmp = sub.add_parser("compare-experiments", help="multi-experiment comparison plots (scripts/result/)")
    p_cmp.add_argument("experiments", nargs="+", help="name=accuracy.json pairs")
    p_cmp.add_argument("--out", required=True)
    p_cmp.add_argument("--query-type", default="encoded_image_feature")
    p_cmp.add_argument("--key-type", default="encoded_image_feature")
    p_cmp.add_argument("--k", type=int, default=1)
    p_cmp.add_argument("--poster", action="store_true",
                       help="also write one poster-style per-level figure per experiment "
                            "(plot_for_5m_poster.py)")
    p_cmp.add_argument("--line-plots", action="store_true",
                       help="also write the paper-figure line plots (one per "
                            "dna→dna / image→dna / image→image pair, seen "
                            "solid / unseen dashed; scripts/result/plots/)")
    p_cmp.set_defaults(overrides=[])

    p_am = sub.add_parser("attention-maps",
                          help="attention-rollout visualization (representation_visualization/)")
    common(p_am)
    p_am.add_argument("--modality", choices=["image", "dna", "both"], default="image")
    p_am.add_argument("--split", default="test_seen")
    p_am.add_argument("--out", default="attention_maps")
    p_am.add_argument("--n-samples", type=int, default=8)
    p_am.add_argument("--n-orders", type=int, default=5)
    p_am.add_argument("--before-ckpt", default=None,
                      help="unaligned encoder checkpoint for the 'before' row")
    p_am.add_argument("--discard-ratio", type=float, default=0.9)
    p_am.add_argument("--head-fusion", choices=["max", "mean", "min"], default="max")
    p_am.add_argument("--layer-range", type=int, nargs=2, default=[1, -6],
                      help="rollout layer window (reference attentions[1:-6])")

    p_sub = sub.add_parser("subset-hdf5",
                           help="stratified 1/N pretrain subset or per-split-count subset "
                                "(create_special_pre_train_for_bioscan_5m.py)")
    p_sub.add_argument("--hdf5", required=True)
    p_sub.add_argument("--out", required=True)
    p_sub.add_argument("--ratio", type=float, default=None,
                       help="per-species stratified keep ratio (>=1 record per species)")
    p_sub.add_argument("--split", default="no_split_and_seen_train")
    p_sub.add_argument("--sizes", nargs="*", default=None, help="split=count pairs (plain subset)")
    p_sub.add_argument("--seed", type=int, default=42)
    p_sub.add_argument("--no-other-splits", action="store_true")
    p_sub.set_defaults(overrides=[])

    p_gsc = sub.add_parser("generate-split-csv",
                           help="per-record metadata CSV across splits (generate_split_csv_from_the_hdf5.py)")
    p_gsc.add_argument("--hdf5", required=True)
    p_gsc.add_argument("--out", required=True)
    p_gsc.add_argument("--splits-list", nargs="*", default=None)
    p_gsc.set_defaults(overrides=[])

    p_fc = sub.add_parser("failure-cases",
                          help="paired GT-vs-top1 failure figures (show_paired_failure_cases.py)")
    p_fc.add_argument("--features", required=True, help="extracted_feature_*.hdf5")
    p_fc.add_argument("--labels", required=True, help="labels_*.json")
    p_fc.add_argument("--ids", required=True, help="processed_id_*.json")
    p_fc.add_argument("--hdf5", required=True, help="dataset HDF5 (for the images)")
    p_fc.add_argument("--out", default="failure_cases")
    p_fc.add_argument("--seen-split", default="test_seen")
    p_fc.add_argument("--unseen-split", default="test_unseen")
    p_fc.add_argument("--keys-split", default="all_keys")
    p_fc.add_argument("--max-cases", type=int, default=10)
    p_fc.add_argument("--pairs", nargs="*", default=None,
                      help="query:key feature-type pairs (default: image→image, dna→dna, image→dna)")
    p_fc.set_defaults(overrides=[])

    p_vp = sub.add_parser(
        "verify-parity",
        help="released-artifact parity harness (convert → re-extract → compare; RELEASE_PARITY.md)")
    common(p_vp)
    p_vp.add_argument("--ckpt", default=None, help="released best.pth (or our .npz)")
    p_vp.add_argument("--released-embeddings", default=None,
                      help="released extracted_feature_from_*_split.hdf5")
    p_vp.add_argument("--released-labels", default=None,
                      help="labels_*.json sidecar (default: sibling of the embeddings file)")
    p_vp.add_argument("--released-ids", default=None,
                      help="processed_id_*.json sidecar (default: sibling)")
    p_vp.add_argument("--n", type=int, default=2000,
                      help="records per split to re-extract (None/0 = all)")
    p_vp.add_argument("--tokenizer", default=None,
                      help="vendored BarcodeBERT tokenizer.json or snapshot dir")
    p_vp.add_argument("--expected", default=None,
                      help="JSON of expected species top-1 per grid cell (paper table)")
    p_vp.add_argument("--cos-threshold", type=float, default=0.99)
    p_vp.add_argument("--top1-threshold", type=float, default=0.005)
    p_vp.add_argument("--out", default=None, help="write the JSON report here")

    sub.add_parser("configs", help="list bundled experiment configs")
    sub.add_parser("bench", help="run the throughput microbenchmark")

    args = parser.parse_args(argv)
    overrides = getattr(args, "overrides", [])
    # CLIBD_COMPILE_CACHE=<dir> (or `serve --compile-cache`): persistent
    # XLA compilation cache — restart-warm serving/CLI (129 s → 7 s
    # measured; utils/compile_cache.py).  Pure process-local config, safe
    # for every command incl. doctor.
    from ..utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache(getattr(args, "compile_cache", None))
    if args.command != "doctor":
        # Multi-host slice entry: rendezvous before any backend touch
        # (reference ddp_setup, train_cl.py:44-48); no-op on single-host/CPU
        # (env-gated).  Skipped for `doctor`: the rendezvous itself touches
        # the backend (e.g. TPU_WORKER_HOSTNAMES is set on Cloud TPU AND on
        # this tunnel), and a diagnostic must not hang on the exact failure
        # it exists to report.
        from ..parallel.mesh import maybe_initialize_distributed

        maybe_initialize_distributed()
    return {
        "train": cmd_train,
        "eval": cmd_eval,
        "extract": cmd_extract,
        "simclr": cmd_simclr,
        "create-splits": cmd_create_splits,
        "build-hdf5": cmd_build_hdf5,
        "bzsl-extract": cmd_bzsl_extract,
        "extract-single": cmd_extract_single,
        "serve": cmd_serve,
        "doctor": cmd_doctor,
        "finetune": cmd_finetune,
        "method-nn": cmd_method_nn,
        "zeroshot": cmd_zeroshot,
        "flatten-csv": cmd_flatten_csv,
        "plot-embeddings": cmd_plot_embeddings,
        "fetch-taxonomy": cmd_fetch_taxonomy,
        "stats-summary": cmd_stats_summary,
        "compare-experiments": cmd_compare_experiments,
        "confusion-matrices": cmd_confusion_matrices,
        "attention-maps": cmd_attention_maps,
        "subset-hdf5": cmd_subset_hdf5,
        "generate-split-csv": cmd_generate_split_csv,
        "failure-cases": cmd_failure_cases,
        "verify-parity": cmd_verify_parity,
        "configs": cmd_configs,
        "bench": cmd_bench,
    }[args.command](args, overrides)
