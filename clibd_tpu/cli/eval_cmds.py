"""Evaluation entry points: inference_and_eval, zero-shot
(scripts/bioclip/), method_nn fusion, released-artifact verify-parity."""

from __future__ import annotations

import json
import os


from .common import _dataset_hdf5_path, _load_cfg, _resolve_params, _stringify, _extract_split_auto


def cmd_eval(args, overrides) -> int:
    from ..utils.profiling import PhaseTimer

    cfg = _load_cfg(args, overrides)
    timing = PhaseTimer()  # reported when CLIBD_EVAL_TIMING=1
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
    from ..data.pipeline import BatchSpec, BioscanLoader
    from ..engine.evaluate import format_results, inference_and_eval, save_results
    from ..engine.extract import (
        extract_split,
        load_extracted_features,
        save_extracted_features,
        save_labels_and_ids,
    )
    from ..config.schema import to_dict

    from ..parallel.mesh import all_hosts_agree, is_main_process

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
        with timing.phase("load cached embeddings (I/O)"):
            seen_dict, unseen_dict, keys_dict = load_extracted_features(feat_path, labels_path, ids_path)
    else:
        params = _resolve_params(cfg)
        spec = BatchSpec.eval_spec(mc)

        def run(split, for_key=False):
            # multi-host pods shard the split across processes (allgather
            # reassembly), like the in-training eval
            return _extract_split_auto(params, mc, cfg, hdf5, split, spec,
                                       for_key=for_key, progress=True)

        with timing.phase("extraction (decode+encode)"):
            keys_dict = run("all_keys", for_key=True)
            seen_dict = run(f"{eval_on}_seen")
            unseen_dict = run(f"{eval_on}_unseen")
        if cfg.save_inference and main:
            with timing.phase("write embedding cache (I/O)"):
                save_extracted_features(feat_path, seen_dict, unseen_dict, keys_dict)
                save_labels_and_ids(labels_path, ids_path, seen_dict, unseen_dict, keys_dict)

    k_list = list(cfg.inference_and_eval_setting.k_list)
    # pred_dict is only persisted below (save_inference, process 0) —
    # skip the ~0.5 s/cell per-query payload assembly everywhere else
    with timing.phase("kNN grid + micro/macro metrics"):
        acc_dict, per_class_acc, pred_dict = inference_and_eval(
            keys_dict, seen_dict, unseen_dict, k_list=k_list,
            query_chunk=cfg.inference_and_eval_setting.knn_query_chunk,
            with_preds=bool(cfg.save_inference and main),
        )

    if cfg.inference_and_eval_setting.retrieve_images and main:
        from ..engine.retrieval_grid import retrieve_images_multi

        rs = cfg.inference_and_eval_setting.retrieve_settings
        pairs = [(q, k) for q in ("encoded_image_feature", "encoded_dna_feature")
                 for k in ("encoded_image_feature", "encoded_dna_feature")
                 if seen_dict.get(q) is not None and keys_dict.get(k) is not None]
        with timing.phase("retrieval image grids"):
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
        from ..analysis.distributions import (
            plot_similarity_distributions,
            similarity_distribution_rows,
            write_distance_csv,
        )

        with timing.phase("similarity distributions"):
            rows = similarity_distribution_rows(keys_dict, seen_dict, unseen_dict)
            write_distance_csv(rows, os.path.join(folder, "similarity_distances.csv"))
            plot_similarity_distributions(
                rows, os.path.join(folder, "similarity_distributions.png"))
    if cfg.inference_and_eval_setting.plot_embeddings and main:
        from ..analysis.plots import generate_embedding_plot

        with timing.phase("embedding plots"):
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
        with timing.phase("CSV/JSON + HTML report (I/O)"):
            save_results("logs", acc_dict, csv_rows, raw_rows, config_snapshot=to_dict(cfg))
            for name, payload in (
                (f"per_class_acc_{eval_on}.json", per_class_acc),
                (f"acc_dict_{eval_on}.json", acc_dict),
                (f"pred_dict_{eval_on}.json", pred_dict),
            ):
                with open(os.path.join(folder, name), "w") as f:
                    json.dump(_stringify(payload), f, indent=4)
            # self-contained HTML report (the reference's html_plots/ artifacts)
            from ..analysis.report import eval_report_sections, write_html_report

            sections = eval_report_sections(folder, acc_table_rows=csv_rows or None)
            write_html_report(
                os.path.join(folder, "report.html"),
                f"{mc.model_output_name} — {mc.dataset} ({eval_on})", sections,
            )
    if os.environ.get("CLIBD_EVAL_TIMING"):
        print(timing.report("clibd eval wall-time breakdown"))
    return 0


def cmd_zeroshot(args, overrides) -> int:
    """CLIP/BioCLIP zero-shot taxonomic classification with prompt ensembles
    (reference scripts/bioclip/inference_and_eval_with_bioclip.py)."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from ..data.clip_tokenizer import CLIPTokenizer
    from ..data.pipeline import BatchSpec, BioscanLoader
    from ..engine.zeroshot import build_class_prototypes, zero_shot_classify
    from ..models.clibd import _clip_configs
    from ..models.clip import (
        clip_normalize,
        clip_params_from_state_dict,
        clip_text_apply,
        clip_vision_apply,
    )
    from ..models.convert import load_torch_state_dict

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

    from ..utils.metrics import (
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
        from ..ops.knn import knn_search

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
        from ..engine.zeroshot import taxon_prompt

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

    from ..data.pipeline import BatchSpec, BioscanLoader
    from ..engine.extract import extract_split
    from ..engine.fusion import (
        class_labels_by_level_from_map,
        method_from_classifier,
        method_linear,
        method_nn,
        predictions_from_logits,
    )
    from ..utils.metrics import LEVELS, labels_to_level_arrays

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
            from ..data.hdf5 import BioscanSplit

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

        from ..engine.finetune import fit_classifier, species_to_index
        from ..engine.schedules import one_cycle_lr

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
                from ..engine.fusion import fit_frozen_probe

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


def cmd_verify_parity(args, overrides) -> int:
    """Released-artifact parity harness (RELEASE_PARITY.md runbook;
    reference README.md:29-44 artifacts, BASELINE.md 0.5% criterion)."""
    cfg = _load_cfg(args, overrides)
    from ..engine.verify_parity import format_report, save_report, verify_parity

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
