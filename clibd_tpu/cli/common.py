"""Shared CLI plumbing: config loading, dataset path resolution, and
the checkpoint resolution chain (reference simple_clip.py:248-285)."""

from __future__ import annotations

import os
from typing import List

from ..config import GlobalConfig, load_config


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

        from ..parallel.mesh import broadcast_from_main

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

    from ..engine.checkpoint import load_params_any, resolve_checkpoint_path
    from ..models import init_clibd_params

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


def _stringify(obj):
    if isinstance(obj, dict):
        return {str(k): _stringify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_stringify(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    return obj


def _extract_split_auto(params, mc, cfg, hdf5, split, spec, for_key=False,
                        progress=False):
    """extract_split with automatic multi-host sharding: single process uses
    the plain loader; a multi-process job shards the split across hosts and
    allgathers (extract_split_multihost) — every host returns the identical
    full-split dict."""
    import jax

    from ..data.pipeline import BioscanLoader
    from ..engine.extract import extract_split, extract_split_multihost

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
