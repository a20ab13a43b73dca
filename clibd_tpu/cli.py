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

from .config import GlobalConfig, load_config, save_config


def _dataset_hdf5_path(cfg: GlobalConfig) -> str:
    name = cfg.model_config.dataset
    if name == "bioscan_5m":
        if cfg.model_config.train_with_small_subset:
            return cfg.bioscan_5m_data.path_to_smaller_hdf5_data
        return cfg.bioscan_5m_data.path_to_hdf5_data
    return cfg.bioscan_data.path_to_hdf5_data


def _load_cfg(args, overrides) -> GlobalConfig:
    return load_config(
        global_yaml=args.global_config, experiment=args.experiment, overrides=overrides
    )


def _resolve_params(cfg: GlobalConfig):
    """Checkpoint resolution chain (reference simple_clip.py:248-285):
    configured path → model_output_dir best/last → fresh init.

    Multi-host: every process resolves locally, then process 0's result is
    broadcast — on per-host disks the chain can resolve DIFFERENTLY per
    host (checkpoint only on process 0, stale local copies, HF-cache
    divergence), and host-sharded extraction would then allgather
    embeddings computed with different weights: no crash, silently wrong
    numbers."""
    import jax

    params = _resolve_params_local(cfg)
    if jax.process_count() > 1:
        import numpy as np

        from .parallel.mesh import broadcast_from_main

        params = broadcast_from_main(jax.tree.map(np.asarray, params))
    return params


def _checkpoint_candidates(cfg: GlobalConfig) -> List[str]:
    """The checkpoint search chain, in order (shared by _resolve_params_local
    and `clibd doctor` so the diagnostic can never diverge from the loader)."""
    mc = cfg.model_config
    candidates = []
    if mc.ckpt_path:
        candidates.append(mc.ckpt_path)
    # where cmd_train actually saves (reference: {model_output_dir}/{name}/…,
    # train_cl.py:273-319) — searched BEFORE the canonical published tree so
    # `clibd eval` after `clibd train` finds the just-trained model
    candidates.append(os.path.join(cfg.model_output_dir, mc.model_output_name))
    candidates.append(
        os.path.join(
            cfg.project_root_path, "ckpt", "bioscan_clip", cfg.version, mc.dataset, mc.model_output_name
        )
    )
    return candidates


def _resolve_params_local(cfg: GlobalConfig):
    import jax

    from .engine.checkpoint import load_params_any, resolve_checkpoint_path
    from .models import init_clibd_params

    mc = cfg.model_config
    candidates = _checkpoint_candidates(cfg)
    if mc.load_ckpt:
        for cand in candidates:
            resolved = resolve_checkpoint_path(cand)
            if resolved:
                print(f"Loading checkpoint: {resolved}")
                return load_params_any(resolved, mc)
        # HF Hub fallback (reference simple_clip.py:265-281); requires network
        try:
            from huggingface_hub import hf_hub_download

            hf_name = f"ckpt/bioscan_clip/{cfg.version}/{mc.dataset}/{mc.model_output_name}/best.pth"
            path = hf_hub_download(repo_id=cfg.hf_repo_id, filename=hf_name)
            print(f"Loaded from hf repo: {cfg.hf_repo_id}/{hf_name}")
            return load_params_any(path, mc)
        except Exception:
            pass
    print("No checkpoint found/requested — using fresh init")
    return init_clibd_params(jax.random.PRNGKey(mc.default_seed), mc)


def cmd_train(args, overrides) -> int:
    cfg = _load_cfg(args, overrides)
    from .engine.train import Trainer
    from .utils.seed import set_seed

    seed = None if cfg.model_config.random_seed else cfg.model_config.default_seed
    set_seed(seed)

    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    out_dir = args.output_dir or os.path.join(
        cfg.model_output_dir, cfg.model_config.model_output_name
    )
    eval_splits = {
        "keys": "all_keys",
        "seen": "val_seen",
        "unseen": "val_unseen",
    }
    train_split = args.train_split
    if train_split == "no_split_and_seen_train" and not cfg.model_config.using_train_seen_for_pre_train:
        train_split = "no_split"  # reference load_dataloader (dataset.py:699-727)

    logger = None
    log_fn = print if cfg.debug_flag else None
    if cfg.activate_wandb:
        from .utils.logging import RunLogger

        logger = RunLogger(
            project=f"CLIBD-{cfg.model_config.dataset}",
            name=cfg.model_config.model_output_name,
            output_dir="logs",
        )
        log_fn = logger.log

    train_loader = None
    eval_loader_factory = None
    if cfg.model_config.dataset == "INSECT":
        # contrastive fine-tune on INSECT (reference train_cl.py:166-169)
        from .data.insect import INSECTDataset, INSECTLoader
        from .data.pipeline import BatchSpec

        mc = cfg.model_config

        def make_loader(split, train):
            ds = INSECTDataset(
                cfg.insect_data.path_to_att_splits_mat,
                cfg.insect_data.path_to_res_101_mat,
                cfg.insect_data.path_to_image_hdf5,
                cfg.insect_data.species_to_other,
                split=split,
            )
            # batch_size is PER-DEVICE (reference: one process per GPU with
            # batch_size each); the train loader must therefore yield this
            # process's device share, like Trainer's internal BioscanLoader —
            # otherwise multi-device runs edge-pad every batch with duplicate
            # rows that enter the contrastive loss
            import jax as _jax

            share = _jax.local_device_count() if train else 1
            spec = BatchSpec(
                batch_size=mc.batch_size * share, train=train,
                with_image=mc.image.enable, with_dna=mc.dna.enable,
                with_language=False,
            )
            return INSECTLoader(ds, spec, seed=mc.default_seed)

        train_loader = make_loader("trainval_loc", True)
        eval_loader_factory = make_loader
        eval_splits = {"keys": "trainval_loc", "seen": "test_seen_loc", "unseen": "test_unseen_loc"}

    trainer = Trainer(
        cfg,
        hdf5,
        output_dir=out_dir,
        train_split=train_split,
        eval_splits=eval_splits,
        log_fn=log_fn,
        train_loader=train_loader,
        eval_loader_factory=eval_loader_factory,
    )
    from .parallel.mesh import is_main_process

    if is_main_process():
        save_config(cfg, os.path.join(out_dir, "config.yaml"))
    start_epoch = 0
    if args.resume:
        resume_dir = args.resume if args.resume is not True else os.path.join(out_dir, "last")
        # multi-host safe: checkpoints may exist only on process 0's disk
        # (process-0-gated writes) — a per-host os.path.exists here would
        # fresh-start every non-0 host against a resumed process 0
        resumed = trainer.resume_multihost(str(resume_dir))
        if resumed is not None:
            start_epoch = resumed
            print(f"Resumed from {resume_dir} at epoch {start_epoch}")
    history = trainer.fit(progress=True, start_epoch=start_epoch)
    trainer.close()
    if logger is not None:
        logger.finish()
    print(json.dumps({"best_epoch": history["best_epoch"], "final_loss": history["loss"][-1] if history["loss"] else None}))
    return 0


def cmd_eval(args, overrides) -> int:
    cfg = _load_cfg(args, overrides)
    if getattr(args, "unimodel", None):
        # SimCLR-encoder unimodal retrieval eval (reference scripts/unimodel/
        # inference_and_eval_with_unimodel.py:1-190: wrap the SimCLR ViT into
        # an image-only SimpleCLIP, run the standard grid) — image-only
        # model, backbone from the SimCLR checkpoint, no CLIBD ckpt load
        mc0 = cfg.model_config
        mc0.dna.enable = False
        mc0.language.enable = False
        mc0.image.simclr_ckpt_path = args.unimodel
        mc0.load_ckpt = False
        # separate cache/output namespace: sharing the named model's folder
        # would load_inference the WRONG cached embeddings (or overwrite the
        # real model's cache with image-only features)
        mc0.model_output_name = f"{mc0.model_output_name}_unimodel"
    from .data.pipeline import BatchSpec, BioscanLoader
    from .engine.evaluate import format_results, inference_and_eval, save_results
    from .engine.extract import (
        extract_split,
        load_extracted_features,
        save_extracted_features,
        save_labels_and_ids,
    )
    from .config.schema import to_dict

    from .parallel.mesh import all_hosts_agree, is_main_process

    mc = cfg.model_config
    eval_on = cfg.inference_and_eval_setting.eval_on
    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    folder = os.path.join(
        cfg.project_root_path, "extracted_embedding", mc.dataset, mc.model_output_name
    )
    os.makedirs(folder, exist_ok=True)
    # multi-host: every process computes (deterministic, host-sharded
    # extraction reassembles identically) but only process 0 writes files
    main = is_main_process()
    feat_path = os.path.join(folder, f"extracted_feature_from_{eval_on}_split.hdf5")
    labels_path = os.path.join(folder, f"labels_{eval_on}.json")
    ids_path = os.path.join(folder, f"processed_id_{eval_on}.json")

    # the branch must be agreed across processes (extraction below runs
    # collectives): only process 0 writes the cache, so on per-host disks a
    # local exists() check would deadlock the pod — load only when EVERY
    # host has the files
    if all_hosts_agree(cfg.load_inference and
                       all(os.path.exists(p) for p in (feat_path, labels_path, ids_path))):
        print("Loading embeddings from file...")
        seen_dict, unseen_dict, keys_dict = load_extracted_features(feat_path, labels_path, ids_path)
    else:
        params = _resolve_params(cfg)
        spec = BatchSpec.eval_spec(mc)

        def run(split, for_key=False):
            # multi-host pods shard the split across processes (allgather
            # reassembly), like the in-training eval
            return _extract_split_auto(params, mc, cfg, hdf5, split, spec,
                                       for_key=for_key, progress=True)

        keys_dict = run("all_keys", for_key=True)
        seen_dict = run(f"{eval_on}_seen")
        unseen_dict = run(f"{eval_on}_unseen")
        if cfg.save_inference and main:
            save_extracted_features(feat_path, seen_dict, unseen_dict, keys_dict)
            save_labels_and_ids(labels_path, ids_path, seen_dict, unseen_dict, keys_dict)

    k_list = list(cfg.inference_and_eval_setting.k_list)
    # pred_dict is only persisted below (save_inference, process 0) —
    # skip the ~0.5 s/cell per-query payload assembly everywhere else
    acc_dict, per_class_acc, pred_dict = inference_and_eval(
        keys_dict, seen_dict, unseen_dict, k_list=k_list,
        query_chunk=cfg.inference_and_eval_setting.knn_query_chunk,
        with_preds=bool(cfg.save_inference and main),
    )

    if cfg.inference_and_eval_setting.retrieve_images and main:
        from .engine.retrieval_grid import retrieve_images_multi

        rs = cfg.inference_and_eval_setting.retrieve_settings
        pairs = [(q, k) for q in ("encoded_image_feature", "encoded_dna_feature")
                 for k in ("encoded_image_feature", "encoded_dna_feature")
                 if seen_dict.get(q) is not None and keys_dict.get(k) is not None]
        retrieve_images_multi(
            os.path.join(folder, "retrieval"),
            hdf5, f"{eval_on}_seen", "all_keys",
            seen_dict, keys_dict, query_keys=pairs or [
                ("encoded_image_feature", "encoded_image_feature")],
            num_queries=rs.num_queries, max_k=rs.max_k, seed=rs.seed,
            independent=rs.independent,
            load_cached_results=rs.load_cached_results,
            only_failures=rs.only_failures,
        )
    if cfg.inference_and_eval_setting.similarity_distributions and main:
        from .analysis.distributions import (
            plot_similarity_distributions,
            similarity_distribution_rows,
            write_distance_csv,
        )

        rows = similarity_distribution_rows(keys_dict, seen_dict, unseen_dict)
        write_distance_csv(rows, os.path.join(folder, "similarity_distances.csv"))
        plot_similarity_distributions(
            rows, os.path.join(folder, "similarity_distributions.png"))
    if cfg.inference_and_eval_setting.plot_embeddings and main:
        from .analysis.plots import generate_embedding_plot

        generate_embedding_plot(
            os.path.join(folder, "plots"),
            keys_dict.get("encoded_image_feature"),
            keys_dict.get("encoded_dna_feature"),
            keys_dict.get("encoded_language_feature"),
            keys_dict["label_list"],
            embeddings_filters=dict(cfg.inference_and_eval_setting.embeddings_filters),
            formats=("png", "html"),
        )
    alignment = "I"
    if mc.dna.enable:
        alignment += ",D"
    if mc.language.enable:
        alignment += ",T"
    meta = {
        "learning_strategy": "FineTuning" if mc.disable_lora else "LoRA",
        "dna_encoder": mc.dna.model,
        "image_encoder": mc.image.model,
        "language_encoder": mc.language.model,
        "epochs": mc.epochs,
        "output_dim": mc.output_dim,
    }
    table, csv_rows, raw_rows, copy_rows = format_results(acc_dict, k_list, alignment, meta)
    print(table)
    print("For copy to google doc")
    for row in copy_rows:
        print(row)
    if cfg.save_inference and main:
        save_results("logs", acc_dict, csv_rows, raw_rows, config_snapshot=to_dict(cfg))
        for name, payload in (
            (f"per_class_acc_{eval_on}.json", per_class_acc),
            (f"acc_dict_{eval_on}.json", acc_dict),
            (f"pred_dict_{eval_on}.json", pred_dict),
        ):
            with open(os.path.join(folder, name), "w") as f:
                json.dump(_stringify(payload), f, indent=4)
        # self-contained HTML report (the reference's html_plots/ artifacts)
        from .analysis.report import eval_report_sections, write_html_report

        sections = eval_report_sections(folder, acc_table_rows=csv_rows or None)
        write_html_report(
            os.path.join(folder, "report.html"),
            f"{mc.model_output_name} — {mc.dataset} ({eval_on})", sections,
        )
    return 0


def _stringify(obj):
    if isinstance(obj, dict):
        return {str(k): _stringify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_stringify(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    return obj


def cmd_extract(args, overrides) -> int:
    """Embedding export (reference scripts/save_embedding/extract_embedding.py).

    On a multi-host pod the split is host-sharded (each process decodes and
    encodes 1/H, allgather reassembles) and process 0 writes the file."""
    cfg = _load_cfg(args, overrides)
    from .data.pipeline import BatchSpec
    from .engine.extract import save_embedding_export
    from .parallel.mesh import is_main_process

    mc = cfg.model_config
    params = _resolve_params(cfg)
    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    spec = BatchSpec.eval_spec(mc)
    out = _extract_split_auto(params, mc, cfg, hdf5, args.split, spec, progress=True)
    if is_main_process():
        save_embedding_export(args.out, out)
        print(f"Saved embeddings for split {args.split!r} to {args.out}")
    return 0


def _extract_split_auto(params, mc, cfg, hdf5, split, spec, for_key=False,
                        progress=False):
    """extract_split with automatic multi-host sharding: single process uses
    the plain loader; a multi-process job shards the split across hosts and
    allgathers (extract_split_multihost) — every host returns the identical
    full-split dict."""
    import jax

    from .data.pipeline import BioscanLoader
    from .engine.extract import extract_split, extract_split_multihost

    if jax.process_count() > 1:
        return extract_split_multihost(
            params, mc, hdf5, split, spec, for_key_set=for_key,
            num_workers=cfg.pipeline.num_workers,
            use_native=cfg.pipeline.use_native_decoder, progress=progress)
    loader = BioscanLoader(hdf5, split, spec, num_workers=cfg.pipeline.num_workers,
                           use_native=cfg.pipeline.use_native_decoder)
    out = extract_split(params, mc, loader, for_key_set=for_key, progress=progress)
    loader.close()
    return out


def cmd_simclr(args, overrides) -> int:
    """SimCLR unimodal image pretraining (reference scripts/unimodel/)."""
    cfg = _load_cfg(args, overrides)
    from .engine.simclr import SimCLRTrainer

    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    out_dir = args.output_dir or os.path.join(
        cfg.project_root_path, "ckpt", "uni_model", "uni_model", "image",
        cfg.model_config.model_output_name,
    )
    trainer = SimCLRTrainer(
        cfg, hdf5, output_dir=out_dir, split=args.train_split,
        temperature=args.temperature, num_workers=cfg.pipeline.num_workers,
    )
    hist = trainer.fit(progress=True)
    trainer.close()
    print(json.dumps({"final_loss": hist["loss"][-1] if hist["loss"] else None}))
    return 0


def cmd_create_splits(args, overrides) -> int:
    """BIOSCAN split creation (reference dataset/create_splits.py)."""
    import pandas as pd

    from .data.splits import create_splits

    metadata = pd.read_csv(args.metadata, sep="\t")
    out = create_splits(
        metadata,
        min_species_size=args.min_species_size,
        seen_ratio=args.seen_ratio,
        seed=args.seed,
    )
    out.to_csv(args.out, sep="\t")
    print(out["split"].value_counts())
    return 0


def cmd_build_hdf5(args, overrides) -> int:
    """Build split HDF5 from metadata + split TSVs + an image directory."""
    import pandas as pd

    from .data.builders import REFERENCE_SPLIT_NAME_MAP, build_split_hdf5
    from .data.tokenizers import WordPieceTokenizer

    metadata = pd.read_csv(args.metadata, sep="\t")
    if args.splits:
        splits = pd.read_csv(args.splits, sep="\t")[["sampleid", "split"]]
        metadata = metadata.merge(splits, on="sampleid", how="inner")
    tokenizer = WordPieceTokenizer(args.vocab) if args.vocab else None
    if args.parallel:
        # 5M-scale path (reference generate_hdf5_file_5m.py): multiprocessing
        # image ingestion, chunked resizable writes, resume support
        from .data.builders_5m import build_split_hdf5_parallel

        stats = build_split_hdf5_parallel(
            args.out, metadata, args.image_dir,
            tokenizer=tokenizer, split_name_map=REFERENCE_SPLIT_NAME_MAP,
            compression="gzip" if args.compress else None,
            chunk_size=args.chunk_size, num_processes=args.processes,
            resume=args.resume,
        )
        print(f"Wrote {args.out}: {stats}")
        return 0
    build_split_hdf5(
        args.out, metadata, args.image_dir,
        tokenizer=tokenizer, split_name_map=REFERENCE_SPLIT_NAME_MAP,
        compression="gzip" if args.compress else None,
    )
    print(f"Wrote {args.out}")
    return 0


def cmd_bzsl_extract(args, overrides) -> int:
    """INSECT feature extraction → BZSL CSVs (scripts/BZSL/
    extract_feature_for_insect_dataset.py)."""
    cfg = _load_cfg(args, overrides)
    import scipy.io as sio

    from .data.insect import INSECTDataset, INSECTLoader, export_bzsl_csvs
    from .data.pipeline import BatchSpec
    from .engine.extract import extract_split

    mc = cfg.model_config
    params = _resolve_params(cfg)
    ds = INSECTDataset(
        cfg.insect_data.path_to_att_splits_mat,
        cfg.insect_data.path_to_res_101_mat,
        cfg.insect_data.path_to_image_hdf5,
        cfg.insect_data.species_to_other,
        split="all",
    )
    spec = BatchSpec(batch_size=args.batch_size, train=False, with_language=False)
    loader = INSECTLoader(ds, spec)
    out = extract_split(params, mc, loader, progress=True)
    loader.close()

    res = sio.loadmat(cfg.insect_data.path_to_res_101_mat)
    class_labels = res["labels"].squeeze() - 1
    folder = os.path.join(
        cfg.project_root_path, "extracted_embedding", "INSECT",
        mc.model_output_name, "trained_on_BIOSCAN_1M",
    )
    os.makedirs(folder, exist_ok=True)
    dna_csv = os.path.join(folder, "dna_embedding_from_bioscan_clip_no_fine_tuned_on_INSECT.csv")
    img_csv = os.path.join(folder, "image_embedding_from_bioscan_clip_no_fine_tuned_on_INSECT.csv")
    export_bzsl_csvs(out["encoded_dna_feature"], out["encoded_image_feature"], class_labels, dna_csv, img_csv)
    print(dna_csv)
    print(img_csv)
    return 0


def cmd_extract_single(args, overrides) -> int:
    """Single-record encoder (reference scripts/save_embedding/
    extract_single_image.py / extract_embedding_for_single_image.py):
    embed one image file and/or one DNA barcode string."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from .data.pipeline import preprocess_single_image, tokenize_single_barcode
    from .models.clibd import clibd_apply

    mc = cfg.model_config
    params = _resolve_params(cfg)
    image_input = dna_input = None
    if args.image:
        with open(args.image, "rb") as f:
            image_input = preprocess_single_image(mc, f.read())[None]
    if args.barcode:
        tok = tokenize_single_barcode(mc, args.barcode)
        dna_input = ({k: v[None] for k, v in tok.items()}
                     if isinstance(tok, dict) else tok[None])
    out = clibd_apply(params, mc, image_input=image_input, dna_input=dna_input)
    result = {}
    if out["image"] is not None:
        result["image_embedding"] = np.asarray(out["image"][0]).tolist()
    if out["dna"] is not None:
        result["dna_embedding"] = np.asarray(out["dna"][0]).tolist()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
        print(f"Wrote {args.out}")
    else:
        print(json.dumps({k: v[:8] for k, v in result.items()}))
    return 0


def cmd_serve(args, overrides) -> int:
    """Resident inference server (engine/serve.py): loads the checkpoint
    once, pre-compiles the bucketed forward programs, then serves
    /embed + /search over HTTP with micro-batched device calls."""
    cfg = _load_cfg(args, overrides)

    from .engine.serve import InferenceService, make_server

    mc = cfg.model_config
    params = _resolve_params(cfg)
    # derive the image geometry from the checkpoint's image tower (pre_warm
    # would crash at startup on a mismatch, but derive rather than assume 224)
    image_size = (mc.clip.image_size if mc.backbone == "open_clip"
                  else mc.image.vit.image_size)
    keys_mesh = None
    if args.shard_keys:
        from .parallel.mesh import local_mesh

        keys_mesh = local_mesh()
    service = InferenceService(
        params, mc, keys_path=args.keys,
        buckets=tuple(b for b in (1, 2, 4, 8, 16, 32) if b <= args.max_batch),
        window_ms=args.window_ms, max_batch=args.max_batch,
        image_size=image_size, resize_to=round(image_size * 256 / 224),
        keys_mesh=keys_mesh, keys_dtype=args.keys_dtype,
        keys_rerank=args.keys_rerank, keys_selector=args.keys_selector,
        language_vocab=args.language_vocab,
        text_max_len=mc.language.max_len, max_queue=args.max_queue)
    if not args.no_warm:
        print("compiling bucketed forward programs ...", flush=True)
        service.pre_warm()
    if args.reload_watch > 0:
        if not args.keys:
            print("--reload-watch needs --keys", file=sys.stderr)
            return 2
        service.start_reload_watch(args.reload_watch)
    server = make_server(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(keys: {service.keys.n if service.keys else 'none'})", flush=True)

    # SIGTERM (the orchestrator's stop signal) → the same clean-exit path
    # as Ctrl-C: raise in the main thread, which is inside serve_forever
    import signal

    def _terminate(signum, frame):
        raise KeyboardInterrupt

    prev_handler = signal.signal(signal.SIGTERM, _terminate)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
        server.shutdown()
        server.server_close()
        service.close()
    return 0


def cmd_doctor(args, overrides) -> int:
    """Deployment diagnostic: device reachability (WITH a timeout — a dead
    tunnel hangs jax.devices() forever), native decoder availability,
    multi-host identity, and optionally config/dataset/checkpoint
    resolution for an experiment.  One JSON object; rc 1 if any check
    fails."""
    import importlib.metadata
    import sys as _sys
    import threading

    report: dict = {"python": _sys.version.split()[0]}
    try:
        report["jax"] = importlib.metadata.version("jax")
    except importlib.metadata.PackageNotFoundError:
        report["jax"] = None

    # -- device probe in a daemon thread so an unreachable backend can't
    # hang the diagnostic (observed: tunnel outages block jax.devices())
    probe: dict = {}

    def _probe():
        import time as _time

        import numpy as np

        import jax
        import jax.numpy as jnp

        from .parallel.mesh import _MULTIHOST_ENV_HINTS, maybe_initialize_distributed

        t0 = _time.perf_counter()
        probe["distributed_hints"] = {
            k: os.environ[k] for k in _MULTIHOST_ENV_HINTS if os.environ.get(k)}
        # the exact sequence every other subcommand runs at startup —
        # rendezvous first, then backend
        probe["distributed"] = maybe_initialize_distributed()
        devs = jax.devices()
        probe["platform"] = devs[0].platform
        probe["device_count"] = len(devs)
        probe["process_index"] = jax.process_index()
        probe["process_count"] = jax.process_count()
        x = jnp.ones((256, 256))
        float(np.asarray((x @ x).sum()))  # force a real device round-trip
        probe["device_roundtrip_s"] = round(_time.perf_counter() - t0, 3)

    def _probe_guarded():
        try:
            _probe()
        except Exception as e:  # surface the failure IN the report
            probe["exception"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=_probe_guarded, daemon=True)
    t.start()
    t.join(timeout=args.timeout)
    # keep whatever the probe recorded before hanging/failing — e.g. the
    # distributed-hint env vars are exactly what explains a rendezvous hang
    if t.is_alive():
        report["device"] = {"status": "unreachable",
                            "detail": f"no response within {args.timeout}s "
                                      "(tunnel/driver hang)", **probe}
    elif "device_roundtrip_s" not in probe:
        report["device"] = {"status": "error", **probe}
    else:
        report["device"] = {"status": "ok", **probe}

    # -- native decoder
    try:
        from .data.native import load_native_decoder, native_lib_path

        dec = load_native_decoder(build_if_missing=args.build_native)
        report["native_decoder"] = {
            "status": "ok" if dec is not None else "unavailable",
            "lib": native_lib_path(),
        }
    except Exception as e:  # diagnostic must never crash on a broken leg
        report["native_decoder"] = {"status": "error", "detail": str(e)}

    # -- experiment-specific checks
    if args.experiment:
        exp: dict = {}
        try:
            cfg = _load_cfg(args, overrides)
            exp["config"] = "ok"
            hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
            exp["hdf5"] = {"path": hdf5, "exists": bool(hdf5) and os.path.exists(hdf5)}
            # THE candidate chain _resolve_params_local uses, without loading
            from .engine.checkpoint import resolve_checkpoint_path

            mc = cfg.model_config
            ckpt = None
            for cand in _checkpoint_candidates(cfg):
                ckpt = resolve_checkpoint_path(cand)
                if ckpt:
                    break
            exp["checkpoint"] = {"resolved": ckpt,
                                 "load_ckpt": mc.load_ckpt,
                                 "would_fresh_init": not (ckpt and mc.load_ckpt)}
        except Exception as e:
            exp["error"] = f"{type(e).__name__}: {e}"
        report["experiment"] = exp

    ok = report["device"]["status"] == "ok" and \
        report["native_decoder"]["status"] in ("ok", "unavailable") and \
        "error" not in report.get("experiment", {})
    report["status"] = "ok" if ok else "problems"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def cmd_flatten_csv(args, overrides) -> int:
    from .analysis.tables import flatten_results_csv

    out = flatten_results_csv(args.input, args.out)
    print(f"Wrote {out}")
    return 0


def cmd_plot_embeddings(args, overrides) -> int:
    """Embedding plots from a cached extraction HDF5 (inference_and_eval.py:98-220)."""
    cfg = _load_cfg(args, overrides)
    import json as _json

    import h5py

    from .analysis.plots import generate_embedding_plot

    with h5py.File(args.features) as f:
        g = f[args.group]
        img = g["encoded_image_feature"][:] if "encoded_image_feature" in g else None
        dna = g["encoded_dna_feature"][:] if "encoded_dna_feature" in g else None
        lang = g["encoded_language_feature"][:] if "encoded_language_feature" in g else None
    with open(args.labels) as f:
        total = _json.load(f)
    key = {"seen": "seen_gt_dict", "unseen": "unseen_gt_dict", "key": "key_gt_dict"}[args.group]
    written = generate_embedding_plot(
        args.out, img, dna, lang, total[key],
        embeddings_filters=dict(cfg.inference_and_eval_setting.embeddings_filters),
        formats=("png", "html"),
    )
    for p in written:
        print(p)
    return 0


def cmd_finetune(args, overrides) -> int:
    """Supervised species-classification fine-tune of one encoder on INSECT
    (reference scripts/BZSL/fine_tune_*.py + epoch/fine_tuning_epoch.py)."""
    cfg = _load_cfg(args, overrides)
    import jax
    import numpy as np
    import optax

    from .data.insect import INSECTDataset, INSECTLoader
    from .data.pipeline import BatchSpec
    from .engine.checkpoint import save_train_state
    from .engine.finetune import fit_classifier, species_to_index, topk_accuracy

    mc = cfg.model_config
    params = _resolve_params(cfg)

    def make_loader(split, train):
        ds = INSECTDataset(
            cfg.insect_data.path_to_att_splits_mat,
            cfg.insect_data.path_to_res_101_mat,
            cfg.insect_data.path_to_image_hdf5,
            cfg.insect_data.species_to_other,
            split=split,
        )
        spec = BatchSpec(batch_size=mc.batch_size, train=train,
                         with_image=args.modality == "image",
                         with_dna=args.modality == "dna", with_language=False)
        return INSECTLoader(ds, spec, seed=mc.default_seed)

    train_loader = make_loader("trainval_loc", True)
    eval_loader = make_loader("test_seen_loc", False)

    unique_species = sorted({l["species"] for l in train_loader.label_dicts()})
    train_targets = species_to_index(train_loader.label_dicts(), unique_species)
    eval_targets = species_to_index(eval_loader.label_dicts(), unique_species)

    params, predict, _losses = fit_classifier(
        params, mc, train_loader, train_targets, len(unique_species),
        tx=optax.adamw(args.lr), epochs=args.epochs, modality=args.modality,
        train_encoder=not args.freeze_encoder, seed=mc.default_seed,
        verbose=True)

    logits, targets = [], []
    for batch in eval_loader.batches(shuffle=False):
        fb = {args.modality: batch[args.modality]}
        logits.append(np.asarray(predict(params, fb)))
        targets.append(eval_targets[batch["index"]])
    acc = topk_accuracy(np.concatenate(logits), np.concatenate(targets))
    print(json.dumps({"top_k_acc": {str(k): v for k, v in acc.items()},
                      "num_species": len(unique_species)}))
    if args.output_dir:
        save_train_state(args.output_dir, jax.device_get(params))
    train_loader.close()
    eval_loader.close()
    return 0


def cmd_method_nn(args, overrides) -> int:
    """Seen/unseen threshold-fusion eval (reference scripts/method_nn.py):
    image-query-vs-seen-keys similarity routes confident queries, DNA search
    against unseen keys handles the rest; threshold maximizes the harmonic
    mean of seen/unseen species top-1.  With --linear, side A is a linear
    probe over image features instead (reference scripts/method_linear.py);
    --probe full additionally fine-tunes the whole image encoder + head
    like the reference (method_linear.py:458-490)."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from .data.pipeline import BatchSpec, BioscanLoader
    from .engine.extract import extract_split
    from .engine.fusion import (
        class_labels_by_level_from_map,
        method_from_classifier,
        method_linear,
        method_nn,
        predictions_from_logits,
    )
    from .utils.metrics import LEVELS, labels_to_level_arrays

    mc = cfg.model_config
    params = _resolve_params(cfg)
    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    eval_on = cfg.inference_and_eval_setting.eval_on
    spec = BatchSpec(
        batch_size=mc.batch_size, train=False,
        with_image=True, with_dna=True, with_language=mc.language.enable,
        clip_tokenizer=BatchSpec.maybe_clip_tokenizer(mc),
    )

    _cache: dict = {}

    def run(split):
        if split not in _cache:
            loader = BioscanLoader(hdf5, split, spec, num_workers=cfg.pipeline.num_workers,
                                   use_native=cfg.pipeline.use_native_decoder)
            _cache[split] = extract_split(params, mc, loader, progress=True)
            loader.close()
        return _cache[split]

    def run_concat(splits):
        """Comma-separated splits → one concatenated key set (the reference
        always concatenates val_unseen_keys + test_unseen_keys,
        method_nn.py:181-203; the pooled `unseen_keys` group is that union)."""
        outs = [run(s) for s in splits.split(",")]
        if len(outs) == 1:
            return outs[0]
        return {
            "encoded_dna_feature": np.concatenate([o["encoded_dna_feature"] for o in outs]),
            "label_list": [lab for o in outs for lab in o["label_list"]],
        }

    unseen_keys = run_concat(args.unseen_keys_split)
    common_kw = dict(
        max_k=max(cfg.inference_and_eval_setting.k_list),
        k_list=list(cfg.inference_and_eval_setting.k_list),
        side_b_query=args.side_b_query,
    )

    _species_map: dict = {}

    def train_species_map():
        """(sorted classes, species→levels) from the probe-training split —
        a raw HDF5 label read, NOT an embedding extraction: the --probe full
        branch consumes only the labels, and the frozen branch reads its
        features via run() separately."""
        if not _species_map:
            from .data.hdf5 import BioscanSplit

            if args.train_split in _cache:
                train_labels = _cache[args.train_split]["label_list"]
            else:
                reader = BioscanSplit(hdf5, args.train_split)
                train_labels = reader.label_dicts()
                reader.close()
            species_to_levels: dict = {}
            for lab in train_labels:
                species_to_levels.setdefault(lab["species"], {lv: lab[lv] for lv in LEVELS})
            _species_map["classes"] = sorted(species_to_levels)
            _species_map["levels"] = species_to_levels
        return _species_map["classes"], _species_map["levels"]

    _ft: dict = {}

    def finetuned_logits(split):
        """Logits of the fully fine-tuned image classifier on a query split
        (reference method_linear.py:458-516: deepcopy image encoder + new
        head, every param trainable, AdamW 1e-4 + OneCycleLR)."""
        import optax

        from .engine.finetune import fit_classifier, species_to_index
        from .engine.schedules import one_cycle_lr

        if "predict" not in _ft:
            classes, _ = train_species_map()
            train_loader = BioscanLoader(
                hdf5, args.train_split,
                BatchSpec(batch_size=mc.batch_size, train=True, with_image=True,
                          with_dna=False, with_language=False),
                num_workers=cfg.pipeline.num_workers,
                use_native=cfg.pipeline.use_native_decoder, seed=mc.default_seed)
            targets = species_to_index(train_loader.label_dicts(), classes)
            total_steps = max(1, len(train_loader) * args.probe_epochs)
            ft_params, predict, _losses = fit_classifier(
                params, mc, train_loader, targets, len(classes),
                tx=optax.adamw(one_cycle_lr(1e-4, total_steps)),
                epochs=args.probe_epochs, modality="image",
                train_encoder=True, seed=mc.default_seed)
            train_loader.close()
            _ft["params"], _ft["predict"] = ft_params, predict
        if split not in _ft:
            loader = BioscanLoader(
                hdf5, split,
                BatchSpec(batch_size=mc.batch_size, train=False, with_image=True,
                          with_dna=False, with_language=False),
                num_workers=cfg.pipeline.num_workers,
                use_native=cfg.pipeline.use_native_decoder)
            chunks = [np.asarray(_ft["predict"](_ft["params"], {"image": b["image"]}))
                      for b in loader.batches(shuffle=False)]
            loader.close()
            _ft[split] = np.concatenate(chunks)
        return _ft[split]

    def fuse(seen_split, unseen_split, threshold):
        seen_q, unseen_q = run(seen_split), run(unseen_split)
        seen_q_feats = {"image": seen_q["encoded_image_feature"], "dna": seen_q["encoded_dna_feature"]}
        unseen_q_feats = {"image": unseen_q["encoded_image_feature"], "dna": unseen_q["encoded_dna_feature"]}
        gts = (labels_to_level_arrays(seen_q["label_list"]),
               labels_to_level_arrays(unseen_q["label_list"]))
        unseen_key_kw = (unseen_keys["encoded_dna_feature"],
                         labels_to_level_arrays(unseen_keys["label_list"]))
        if args.linear and args.probe == "full":
            classes, species_to_levels = train_species_map()
            class_labels = class_labels_by_level_from_map(classes, species_to_levels)
            side_a = [predictions_from_logits(finetuned_logits(s), class_labels,
                                              common_kw["max_k"])
                      for s in (seen_split, unseen_split)]
            return method_from_classifier(
                side_a, seen_q_feats, unseen_q_feats, *unseen_key_kw, *gts,
                classes, threshold=threshold, **common_kw)
        if args.linear:
            _, species_to_levels = train_species_map()
            # fit the probe once: the threshold-search pass and the eval
            # pass train on identical inputs (same split, same steps), so a
            # second 500-step AdamW fit would be pure duplicated work
            if "probe" not in _ft:
                from .engine.fusion import fit_frozen_probe

                train = run(args.train_split)
                _ft["probe"] = fit_frozen_probe(
                    train["encoded_image_feature"],
                    np.asarray([lab["species"] for lab in train["label_list"]],
                               dtype=object),
                    probe_steps=args.probe_steps)
            return method_linear(
                None, None,
                seen_q_feats, unseen_q_feats, *unseen_key_kw,
                *gts, species_to_levels,
                probe_steps=args.probe_steps, threshold=threshold,
                trained_probe=_ft["probe"],
                **common_kw,
            )
        seen_keys = run("seen_keys")
        return method_nn(
            seen_q_feats, unseen_q_feats,
            seen_keys["encoded_image_feature"],
            labels_to_level_arrays(seen_keys["label_list"]),
            *unseen_key_kw,
            *gts, threshold=threshold,
            **common_kw,
        )

    # the reference searches the threshold on the VAL queries, then applies
    # it to the eval_on split (method_nn.py:318-358); when eval_on == val the
    # second pass re-evaluates the same queries with the searched threshold,
    # which is identical to the first — skip it
    if eval_on == "val":
        result = fuse("val_seen", "val_unseen", None)
    else:
        val_result = fuse("val_seen", "val_unseen", None)
        result = fuse(f"{eval_on}_seen", f"{eval_on}_unseen",
                      val_result["best_threshold"])
    summary = {
        "best_threshold": result["best_threshold"],
        "seen_species_top1": result["seen"]["micro_acc"][1]["species"],
        "unseen_species_top1": result["unseen"]["micro_acc"][1]["species"],
        # fraction of queries routed to the correct side (the seen/unseen
        # species pools are disjoint) — method_linear_on_INSECT.py:412-425
        "seen_routing_top1": result["seen"]["routing_acc"][1],
        "unseen_routing_top1": result["unseen"]["routing_acc"][1],
    }
    print(json.dumps(_stringify(summary)))
    return 0


def cmd_zeroshot(args, overrides) -> int:
    """CLIP/BioCLIP zero-shot taxonomic classification with prompt ensembles
    (reference scripts/bioclip/inference_and_eval_with_bioclip.py)."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from .data.clip_tokenizer import CLIPTokenizer
    from .data.pipeline import BatchSpec, BioscanLoader
    from .engine.zeroshot import build_class_prototypes, zero_shot_classify
    from .models.clibd import _clip_configs
    from .models.clip import (
        clip_normalize,
        clip_params_from_state_dict,
        clip_text_apply,
        clip_vision_apply,
    )
    from .models.convert import load_torch_state_dict

    mc = cfg.model_config
    vcfg, tcfg = _clip_configs(mc)
    if not mc.clip.checkpoint or not mc.clip.bpe_path:
        raise SystemExit("zeroshot requires model_config.clip.checkpoint and .bpe_path")
    sd = load_torch_state_dict(mc.clip.checkpoint)
    sd.pop("__meta__", None)
    vision, text, _scale = clip_params_from_state_dict(sd, vcfg, tcfg)
    tokenizer = CLIPTokenizer(mc.clip.bpe_path, context_length=mc.clip.context_length)

    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    spec = BatchSpec(batch_size=args.batch_size, train=False, with_dna=False, with_language=False)
    loader = BioscanLoader(hdf5, args.split, spec, num_workers=cfg.pipeline.num_workers,
                           use_native=cfg.pipeline.use_native_decoder)
    import jax

    @jax.jit
    def encode_images(imgs):
        return clip_vision_apply(vision, clip_normalize(imgs), vcfg)

    feats, labels = [], loader.label_dicts()
    for batch in loader.batches(shuffle=False):
        feats.append(np.asarray(encode_images(batch["image"])))
    loader.close()
    image_features = np.concatenate(feats)

    from .utils.metrics import (
        labels_to_level_arrays,
        predictions_to_level_arrays,
        top_k_macro_accuracy,
        top_k_micro_accuracy,
    )

    gt_by_level = labels_to_level_arrays(labels)

    def per_level_report(preds_by_level, mode):
        micro = top_k_micro_accuracy(preds_by_level, gt_by_level, (1, 3, 5))
        macro, _pc = top_k_macro_accuracy(preds_by_level, gt_by_level, (1, 3, 5))
        print(json.dumps({"mode": mode, "split": args.split,
                          "micro_acc": micro, "macro_acc": macro}, default=str))

    if args.image_to_image:
        # image→image retrieval against the CLIP-encoded key gallery
        # (reference inference_and_eval_with_bioclip_with_image_to_image.py:
        # make_image_key_features + encode_image_feature_and_calculate_accuracy)
        from .ops.knn import knn_search

        kloader = BioscanLoader(hdf5, args.keys_split, spec,
                                num_workers=cfg.pipeline.num_workers,
                                use_native=cfg.pipeline.use_native_decoder)
        kfeats = []
        for batch in kloader.batches(shuffle=False):
            kfeats.append(np.asarray(encode_images(batch["image"])))
        key_labels = kloader.label_dicts()
        kloader.close()
        key_features = np.concatenate(kfeats)
        _, idx = knn_search(image_features, key_features, k=5)
        preds = predictions_to_level_arrays(idx, labels_to_level_arrays(key_labels))
        per_level_report(preds, "image_to_image")
        return 0

    @jax.jit
    def encode_text_ids(ids):
        return clip_text_apply(text, ids, tcfg)

    def encode_text(prompts):
        return np.asarray(encode_text_ids(tokenizer(prompts)))

    if args.four_level:
        # class prompts are the full "order family genus species" strings
        # (reference ..._with_four_level_text_input.py:103-119); predictions
        # are species-level and mapped back to their taxon dicts for the
        # per-level tables
        from .engine.zeroshot import taxon_prompt

        kloader = BioscanLoader(hdf5, args.keys_split, spec, num_workers=0)
        species_to_label = {}
        for lab in kloader.label_dicts():
            species_to_label.setdefault(lab["species"], lab)
        kloader.close()
        species = sorted(species_to_label)
        prompts = [taxon_prompt(species_to_label[s]).replace("_", " ") for s in species]
        protos = build_class_prototypes(prompts, encode_text)
        pred_species, _sc = zero_shot_classify(image_features, protos, species, max_k=5)
        preds = {
            lv: np.asarray([[species_to_label[s][lv] for s in row] for row in pred_species],
                           dtype=object)
            for lv in ("order", "family", "genus", "species")
        }
        per_level_report(preds, "four_level_text")
        return 0

    level = args.level
    class_names = sorted({l[level] for l in labels})
    protos = build_class_prototypes(class_names, encode_text)
    preds, _scores = zero_shot_classify(image_features, protos, class_names, max_k=5)
    gt = np.asarray([l[level] for l in labels], dtype=object)
    hits = {k: float((preds[:, :k] == gt[:, None]).any(1).mean()) for k in (1, 3, 5)}
    print(json.dumps({"level": level, "top_k_micro_acc": hits, "num_classes": len(class_names)}))
    return 0


def cmd_configs(args, overrides) -> int:
    from .config import available_configs

    for name in available_configs():
        print(name)
    return 0


def cmd_fetch_taxonomy(args, overrides) -> int:
    """NCBI-Entrez species -> order/family/genus JSON (reference
    data/INSECT/get_all_species_taxo_labels_dict_and_save_to_json.py).
    Needs outbound HTTPS; resumable via the output JSON."""
    from .data.ncbi import fetch_species_taxonomy_json, species_from_insect_mats

    if args.species:
        species = args.species
    elif args.res101_mat:
        species = species_from_insect_mats(args.res101_mat)
    else:
        print("pass --species ... or --res101-mat", file=sys.stderr)
        return 2
    fetch_species_taxonomy_json(species, args.out, email=args.email)
    print(f"Wrote {args.out}")
    return 0


def cmd_stats_summary(args, overrides) -> int:
    """Dataset statistics summaries (reference create_statistics_summaries.py)."""
    from .analysis.statistics import write_statistics_csvs

    paths = write_statistics_csvs(args.hdf5, args.out,
                                  splits=args.splits_list or None)
    for name, p in paths.items():
        print(f"{name}: {p}")
    return 0


def cmd_compare_experiments(args, overrides) -> int:
    """Multi-experiment comparison plots (reference scripts/result/
    comparing_multi_experiment_results_in_same_plot[_all_in_one].py)."""
    from .analysis.compare import (
        add_harmonic_mean_acc,
        load_experiment_acc_dicts,
        plot_multi_experiment_all_in_one,
        plot_multi_experiment_comparison,
    )

    spec = {}
    for item in args.experiments:
        name, _, path = item.partition("=")
        spec[name] = path or name
    experiments = {n: add_harmonic_mean_acc(a)
                   for n, a in load_experiment_acc_dicts(spec).items()}
    paths = plot_multi_experiment_comparison(
        experiments, args.out, query_type=args.query_type,
        key_type=args.key_type, k=args.k)
    paths.append(plot_multi_experiment_all_in_one(
        experiments, os.path.join(args.out, "compare_all_in_one.png"),
        query_type=args.query_type, key_type=args.key_type, k=args.k))
    if args.poster:
        from .analysis.compare import plot_poster_accuracy

        for name, acc in experiments.items():
            paths.append(plot_poster_accuracy(
                acc, os.path.join(args.out, f"poster_{name}.pdf"),
                experiment_name=name, k=args.k))
    if args.line_plots:
        from .analysis.compare import LINE_PLOT_PAIRS, plot_line_plot_pair

        short = {"encoded_image_feature": "image", "encoded_dna_feature": "dna"}
        for q, key in LINE_PLOT_PAIRS:
            p = plot_line_plot_pair(
                experiments, os.path.join(
                    args.out, f"line_plot_{short[q]}_to_{short[key]}.png"),
                query_type=q, key_type=key, k=args.k)
            if p:
                paths.append(p)
    for p in paths:
        print(p)
    return 0


def cmd_confusion_matrices(args, overrides) -> int:
    """Subset confusion-matrix heatmaps (10 most-common / 10 most-confused
    classes per split × query→key pair × taxonomic level) from a cached
    pred_dict_<split>.json written by `clibd eval` (reference
    scripts/result/create_confusion_matrix.py)."""
    from .analysis.plots import plot_subset_confusion_matrices

    with open(args.pred_json) as f:
        pred_dict = json.load(f)
    paths = plot_subset_confusion_matrices(pred_dict, args.out, top_n=args.top_n)
    for p in paths:
        print(p)
    return 0


def cmd_attention_maps(args, overrides) -> int:
    """Attention-rollout representation visualization (reference
    scripts/result/representation_visualization/)."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from .analysis.attention_maps import (
        attention_rollout,
        bert_attention_probs,
        save_dna_attention_figure,
        save_image_attention_figure,
        top_orders_barcodes,
        vit_attention_probs,
    )
    from .engine.checkpoint import load_params_any

    mc = cfg.model_config
    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    params = _resolve_params(cfg)
    os.makedirs(args.out, exist_ok=True)
    layer_range = tuple(args.layer_range)
    written = []

    if args.modality in ("image", "both"):
        from .data.pipeline import BatchSpec, BioscanLoader

        spec = BatchSpec(batch_size=args.n_samples, train=False,
                         with_dna=False, with_language=False)
        loader = BioscanLoader(hdf5, args.split, spec, num_workers=0, limit=args.n_samples)
        batch = next(loader.batches(shuffle=False))
        loader.close()
        images = batch["image"]
        if images.dtype == np.uint8:  # uint8 transport mode
            images = images.astype(np.float32) / 255.0
        else:
            images = np.asarray(images, np.float32)
        rows = {}
        if args.before_ckpt:
            before = load_params_any(args.before_ckpt, mc)
            bp = before.get("image_encoder", before)
            probs = vit_attention_probs(bp, images, mc.image.vit)
            rows["before alignment"] = attention_rollout(
                probs, args.discard_ratio, args.head_fusion, layer_range=layer_range)
        probs = vit_attention_probs(params["image_encoder"], images, mc.image.vit)
        rows["after alignment"] = attention_rollout(
            probs, args.discard_ratio, args.head_fusion, layer_range=layer_range)
        path = os.path.join(args.out, f"image_attention_{args.split}.png")
        written.append(save_image_attention_figure(path, images, rows))

    if args.modality in ("dna", "both"):
        from .data.tokenizers import tokenize_dna_batch, tokenize_dna_batch_overlapping

        by_order = top_orders_barcodes(hdf5, args.split, n_orders=args.n_orders,
                                       n_samples=args.n_samples)
        masks = {}
        for order, barcodes in by_order.items():
            if mc.dna.tokenizer == "overlap":
                ids, att = tokenize_dna_batch_overlapping(
                    barcodes, k=mc.dna.kmer, stride=mc.dna.stride, max_bp=mc.dna.max_bp)
                att = att[:, : ids.shape[1]]
            else:
                ids = tokenize_dna_batch(barcodes, k=mc.dna.kmer, max_bp=mc.dna.max_bp)
                att = None
            probs = bert_attention_probs(params["dna_encoder"], ids, att, mc.dna.bert)
            masks[order] = attention_rollout(
                probs, args.discard_ratio, args.head_fusion, layer_range=layer_range)
        path = os.path.join(args.out, f"dna_attention_{args.split}.png")
        written.append(save_dna_attention_figure(path, masks))

    for p in written:
        print(f"wrote {p}")
    return 0


def cmd_subset_hdf5(args, overrides) -> int:
    """Smaller-HDF5 builders: per-species stratified pretrain subset
    (create_special_pre_train_for_bioscan_5m.py) or plain per-split counts."""
    from .data.subset import subset_hdf5, subset_hdf5_stratified

    if args.ratio is not None:
        n = subset_hdf5_stratified(args.hdf5, args.out, split=args.split,
                                   ratio=args.ratio, seed=args.seed,
                                   copy_other_splits=not args.no_other_splits)
        print(f"kept {n} stratified records of split {args.split!r} → {args.out}")
        return 0
    sizes = {}
    for item in args.sizes or []:
        split, sep, count = item.partition("=")
        if not sep or not count.isdigit():
            raise SystemExit(f"--sizes items must be split=count, got {item!r}")
        sizes[split] = int(count)
    if not sizes:
        raise SystemExit("pass --ratio R (stratified) or split=count pairs via --sizes")
    subset_hdf5(args.hdf5, args.out, sizes, seed=args.seed)
    print(f"subset written → {args.out}")
    return 0


def cmd_generate_split_csv(args, overrides) -> int:
    """Per-record metadata CSV across all splits (reference
    scripts/data_processing/generate_split_csv_from_the_hdf5.py)."""
    from .data.splits import export_split_csv

    n = export_split_csv(args.hdf5, args.out, splits=args.splits_list or None)
    print(f"wrote {n} rows to {args.out}")
    return 0


def cmd_failure_cases(args, overrides) -> int:
    """Paired failure-case figures from cached extracted features (reference
    scripts/result/show_paired_failure_cases.py)."""
    from .analysis.failure_cases import QUERY_AND_KEY_WE_CARE_ABOUT, save_paired_failure_cases
    from .engine.extract import load_extracted_features

    seen_dict, unseen_dict, keys_dict = load_extracted_features(
        args.features, args.labels, args.ids)
    pairs = QUERY_AND_KEY_WE_CARE_ABOUT
    if args.pairs:
        pairs = [tuple(p.split(":")) for p in args.pairs]
    written = save_paired_failure_cases(
        args.out, args.hdf5, args.seen_split, args.unseen_split, args.keys_split,
        seen_dict, unseen_dict, keys_dict, pairs=pairs, max_cases=args.max_cases)
    print(f"wrote {len(written)} failure-case figures under {args.out}")
    return 0


def cmd_verify_parity(args, overrides) -> int:
    """Released-artifact parity harness (RELEASE_PARITY.md runbook;
    reference README.md:29-44 artifacts, BASELINE.md 0.5% criterion)."""
    cfg = _load_cfg(args, overrides)
    from .engine.verify_parity import format_report, save_report, verify_parity

    expected = None
    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)
    report = verify_parity(
        cfg.model_config,
        ckpt=args.ckpt,
        released_embeddings=args.released_embeddings,
        released_labels=args.released_labels,
        released_ids=args.released_ids,
        hdf5=args.hdf5 or (_dataset_hdf5_path(cfg) if args.ckpt else None),
        n=args.n if args.n and args.n > 0 else None,
        eval_on=cfg.inference_and_eval_setting.eval_on,
        tokenizer_file=args.tokenizer,
        expected=expected,
        cos_threshold=args.cos_threshold,
        top1_threshold=args.top1_threshold,
        num_workers=cfg.pipeline.num_workers,
        use_native=cfg.pipeline.use_native_decoder,
    )
    print(format_report(report))
    if args.out:
        save_report(report, args.out)
        print(f"report written to {args.out}")
    return 0 if report["ok"] else 1


def cmd_bench(args, overrides) -> int:
    import runpy

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    if not os.path.exists(path):
        # pip-installed package: bench.py lives at the repo root, not in the
        # wheel — point the user at the checkout instead of a FileNotFoundError
        raise SystemExit("clibd bench requires a repository checkout "
                         "(bench.py is not shipped in the installed package)")
    runpy.run_path(path, run_name="__main__")
    return 0


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
    from .utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache(getattr(args, "compile_cache", None))
    if args.command != "doctor":
        # Multi-host slice entry: rendezvous before any backend touch
        # (reference ddp_setup, train_cl.py:44-48); no-op on single-host/CPU
        # (env-gated).  Skipped for `doctor`: the rendezvous itself touches
        # the backend (e.g. TPU_WORKER_HOSTNAMES is set on Cloud TPU AND on
        # this tunnel), and a diagnostic must not hang on the exact failure
        # it exists to report.
        from .parallel.mesh import maybe_initialize_distributed

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


if __name__ == "__main__":
    sys.exit(main())
