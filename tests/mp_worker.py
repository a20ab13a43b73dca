"""Subprocess entry for the REAL multi-process jax.distributed integration
test (tests/test_multiprocess.py). Not a pytest file.

Each process: gloo CPU collectives → jax.distributed.initialize rendezvous →
host-sharded Trainer (global mesh spanning both processes,
make_array_from_process_local_data batch assembly) → fit with the
host-sharded in-training eval (extract_split_multihost / process_allgather)
→ extract_split default-mesh routing → JSON result for the parent to
compare across processes and against a single-process run.

This executes the paths the reference exercises with mp.spawn + DDP + NCCL
(scripts/train_cl.py:44-48,365): rendezvous, per-host loader sharding,
cross-process global-batch assembly, rank-0 checkpoint gating.
"""

import argparse
import json
import os
import sys


def build_global_cfg(hdf5: str):
    from clibd_tpu.config.schema import (
        BertConfig,
        GlobalConfig,
    )

    gcfg = GlobalConfig()
    cfg = gcfg.model_config
    cfg.model_output_name = "mp_tiny"
    cfg.batch_size = 3  # per-device (reference semantics) → global 3 × mesh
    cfg.epochs = 2
    cfg.output_dim = 16
    cfg.load_ckpt = False
    cfg.evaluation_period = 1
    cfg.eval_skip_epoch = -1
    # fp32 + no image tower: global InfoNCE is then invariant to the strided
    # row order difference between the 1-proc and 2-proc global batches
    # (image augmentation randomness is positional; fp32 keeps the reduction
    # noise ~1e-7)
    cfg.amp = False
    cfg.image.enable = False
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.bert = BertConfig(vocab_size=2000, hidden_size=16,
                                   num_layers=2, num_heads=2,
                                   intermediate_size=32,
                                   max_position_embeddings=24)
    gcfg.pipeline.num_workers = 0
    gcfg.save_ckpt = True
    gcfg.enable_early_stopping = False
    return gcfg


def light_main(args) -> int:
    """Train-only multi-process leg (called after jax.distributed init)."""
    import jax
    import numpy as np

    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import host_id, num_hosts

    gcfg = build_global_cfg(args.hdf5)
    gcfg.model_config.epochs = 1
    gcfg.model_config.eval_skip_epoch = 0  # skips every eval (epoch 0 only)
    losses = []

    def log_fn(d):
        if "loss" in d:
            losses.append((int(d["step"]), float(d["loss"])))

    trainer = Trainer(
        gcfg, args.hdf5, args.outdir,
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        log_fn=log_fn,
        num_workers=0,
    )
    trainer.fit()
    trainer.close()
    result = {
        "proc_id": args.proc_id,
        "host_id": host_id(),
        "num_hosts": num_hosts(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "losses": losses,
        "ckpt_last_exists": os.path.exists(os.path.join(args.outdir, "last", "params.npz")),
    }
    with open(args.result, "w") as f:
        json.dump(result, f)
    print(f"[proc {args.proc_id}] light done", flush=True)
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--proc-id", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--port", required=True)
    p.add_argument("--hdf5", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--result", required=True)
    p.add_argument("--light", action="store_true",
                   help="train-only leg for __graft_entry__.dryrun_multichip: "
                        "rendezvous + host-sharded loaders + make_array batch "
                        "assembly + per-step losses + process-0 checkpoint "
                        "gating, skipping the eval/resume/extract legs")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs,
            process_id=args.proc_id,
        )

    if args.light:
        return light_main(args)

    import numpy as np

    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
    from clibd_tpu.engine.extract import extract_split
    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import host_id, num_hosts

    gcfg = build_global_cfg(args.hdf5)

    losses, accs = [], []

    def log_fn(d):
        if "loss" in d:
            losses.append((int(d["step"]), float(d["loss"])))
        if "overall_acc" in d:
            accs.append(float(d["overall_acc"]))

    trainer = Trainer(
        gcfg, args.hdf5, args.outdir,
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        log_fn=log_fn,
        num_workers=0,
    )
    history = trainer.fit()
    trainer.close()

    # extract leg: default mesh routing must pick the LOCAL mesh inside a
    # multi-process job (extract loaders are not host-sharded)
    cfg = gcfg.model_config
    spec = BatchSpec(batch_size=6, train=False, with_image=False,
                     with_dna=True, with_language=True)
    loader = BioscanLoader(args.hdf5, "test_seen", spec, num_workers=0)
    extracted = extract_split(jax.device_get(trainer.params), cfg, loader)
    loader.close()

    # host-sharded eval extraction, called directly for matrix-level compare
    from clibd_tpu.engine.extract import extract_split_multihost

    mh = extract_split_multihost(
        jax.device_get(trainer.params), cfg, args.hdf5, "val_seen", spec,
        num_workers=0)

    # multi-host resume with the checkpoint only on process 0's disk
    # (per-process outdirs): process 0 loads, every other process receives
    # the broadcast state — weights, optimizer state and best-metric
    # tracking must agree everywhere afterwards
    from clibd_tpu.parallel.mesh import all_hosts_agree

    def param_sum(params):
        return float(sum(np.asarray(x, np.float64).sum()
                         for x in jax.tree.leaves(jax.device_get(params))))

    trained_sum = param_sum(trainer.params)
    trainer2 = Trainer(
        gcfg, args.hdf5, args.outdir + "_resume",
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        num_workers=0,
    )
    resume_epoch = trainer2.resume_multihost(os.path.join(args.outdir, "last"))
    resume_sum = param_sum(trainer2.params)
    resume_best = trainer2.checkpointer.best_metric
    trainer2.close()

    # stale-local-copy scenario: every process has a file at the resume
    # path, but non-0 hosts hold a STALE state (older run at the same
    # path).  resume_multihost must ignore the local bytes and take
    # process 0's broadcast — matching shapes would otherwise let the pod
    # silently train on divergent weights.
    import shutil

    from clibd_tpu.engine.checkpoint import save_train_state

    stale_dir = os.path.join(args.outdir + "_stale", "last")
    trainer3 = Trainer(
        gcfg, args.hdf5, args.outdir + "_stale",
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        num_workers=0,
    )
    if host_id() == 0:
        shutil.copytree(os.path.join(args.outdir, "last"), stale_dir,
                        dirs_exist_ok=True)
    else:
        # fresh-init params + a wrong epoch/step: all of it must be ignored
        save_train_state(stale_dir, jax.device_get(trainer3.params),
                         step=999, epoch=7)
    stale_epoch = trainer3.resume_multihost(stale_dir)
    stale_sum = param_sum(trainer3.params)
    trainer3.close()

    # checkpoint-resolution divergence (cli._resolve_params): configure the
    # chain so only process 0's disk has the trained checkpoint — the
    # broadcast must give every process identical weights
    from clibd_tpu.cli import _resolve_params

    rcfg = build_global_cfg(args.hdf5)
    rcfg.model_config.load_ckpt = True
    rcfg.model_config.ckpt_path = os.path.join(args.outdir, "last")
    resolved_sum = param_sum(_resolve_params(rcfg))

    # the FULL cmd_eval under multi-process, per-host disks: run 1 extracts
    # (host-sharded) and only process 0 writes the embedding cache; run 2
    # with load_inference=true then sees the cache on process 0's disk ONLY
    # — the all_hosts_agree gate must send every process down the
    # re-extraction branch (a local exists() check would deadlock the pod
    # here), and both runs must print identical accuracy tables
    from clibd_tpu.cli import main as cli_main
    from clibd_tpu.config.loader import save_config

    ecfg = rcfg
    ecfg.project_root_path = args.outdir + "_eval"  # per-process disk
    ecfg.inference_and_eval_setting.eval_on = "val"
    ecfg.inference_and_eval_setting.plot_embeddings = False
    ecfg.load_inference = True
    gpath = os.path.join(args.outdir + "_eval", "mp_eval.yaml")
    os.makedirs(ecfg.project_root_path, exist_ok=True)
    save_config(ecfg, gpath)
    eval_rcs = []
    for _ in range(2):
        eval_rcs.append(cli_main(["eval", "--global-config", gpath,
                                  "--hdf5", args.hdf5]))
    cache = os.path.join(ecfg.project_root_path, "extracted_embedding",
                         "bioscan_1m", "mp_tiny",
                         "extracted_feature_from_val_split.hdf5")
    acc_path = os.path.join(os.path.dirname(cache), "acc_dict_val.json")
    acc_payload = open(acc_path).read() if os.path.exists(acc_path) else None

    result = {
        "proc_id": args.proc_id,
        "trained_param_sum": trained_sum,
        "resume_epoch": resume_epoch,
        "resume_param_sum": resume_sum,
        "resume_best_metric": resume_best,
        "stale_resume_epoch": stale_epoch,
        "stale_resume_param_sum": stale_sum,
        "resolved_param_sum": resolved_sum,
        "eval_rcs": eval_rcs,
        "eval_cache_exists": os.path.exists(cache),
        "eval_acc_payload": acc_payload,
        "agree_mixed": all_hosts_agree(host_id() == 0),
        "agree_true": all_hosts_agree(True),
        "host_id": host_id(),
        "num_hosts": num_hosts(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "losses": losses,
        "overall_accs": accs,
        "history_loss": history["loss"],
        "extract_dna": np.asarray(extracted["encoded_dna_feature"]).tolist(),
        "multihost_eval_dna": np.asarray(mh["encoded_dna_feature"]).tolist(),
        "ckpt_last_exists": os.path.exists(os.path.join(args.outdir, "last", "params.npz")),
        "ckpt_best_exists": os.path.exists(os.path.join(args.outdir, "best", "params.npz")),
    }
    with open(args.result, "w") as f:
        json.dump(result, f)
    print(f"[proc {args.proc_id}] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
