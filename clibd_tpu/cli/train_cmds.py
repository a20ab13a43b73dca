"""Training entry points: contrastive train (train_cl.py), SimCLR
pretraining (unimodel/), supervised INSECT fine-tune (scripts/BZSL/)."""

from __future__ import annotations

import json
import os

from ..config import save_config

from .common import _dataset_hdf5_path, _load_cfg, _resolve_params


def cmd_train(args, overrides) -> int:
    cfg = _load_cfg(args, overrides)
    from ..engine.train import Trainer
    from ..utils.seed import set_seed

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
        from ..utils.logging import RunLogger

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
        from ..data.insect import INSECTDataset, INSECTLoader
        from ..data.pipeline import BatchSpec

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
    from ..parallel.mesh import is_main_process

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


def cmd_simclr(args, overrides) -> int:
    """SimCLR unimodal image pretraining (reference scripts/unimodel/)."""
    cfg = _load_cfg(args, overrides)
    from ..engine.simclr import SimCLRTrainer

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


def cmd_finetune(args, overrides) -> int:
    """Supervised species-classification fine-tune of one encoder on INSECT
    (reference scripts/BZSL/fine_tune_*.py + epoch/fine_tuning_epoch.py)."""
    cfg = _load_cfg(args, overrides)
    import jax
    import numpy as np
    import optax

    from ..data.insect import INSECTDataset, INSECTLoader
    from ..data.pipeline import BatchSpec
    from ..engine.checkpoint import save_train_state
    from ..engine.finetune import fit_classifier, species_to_index, topk_accuracy

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
