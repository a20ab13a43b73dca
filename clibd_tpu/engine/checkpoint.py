"""Checkpointing: best/last semantics (reference train_cl.py:273-319) with
full training state — params + optimizer state + step — which the reference's
main path lacks (SURVEY.md §5.4: "no mid-epoch resume; optimizer state is not
saved"), enabling true resume.

Storage: flat-npz for arrays + a JSON meta sidecar.  Optimizer state is
restored against a freshly-initialized optax state (structure donor), so no
pickling of optax internals is needed.  Loading also resolves the reference's
chain: exact file → best → last (util/util.py:951-963), and imports released
PyTorch `best.pth` checkpoints via models/convert.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..models.convert import (
    clibd_params_from_reference_checkpoint,
    load_params_npz,
    load_torch_state_dict,
    save_params_npz,
)


def _flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _atomic_npz(path: str, arrays: dict) -> None:
    """Write-then-rename so a crash mid-write never leaves a truncated file
    where a resumable checkpoint used to be."""
    tmp = path + ".tmp.npz"  # np.savez appends .npz to names without it
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _write_train_state_host(
    directory: str,
    host_params: dict,
    host_opt_flat: Optional[dict],
    step: int,
    epoch: int,
    meta: Optional[dict],
) -> None:
    """Disk leg only — inputs are host numpy trees (no device access), so
    this can run on a background thread."""
    from ..models.convert import flatten_pytree

    os.makedirs(directory, exist_ok=True)
    _atomic_npz(os.path.join(directory, "params.npz"), flatten_pytree(host_params))
    if host_opt_flat is not None:
        _atomic_npz(os.path.join(directory, "opt_state.npz"), host_opt_flat)
    info = {"step": int(step), "epoch": int(epoch)}
    info.update(meta or {})
    tmp = os.path.join(directory, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(info, f, indent=2)
    os.replace(tmp, os.path.join(directory, "meta.json"))


def _host_snapshot(params, opt_state):
    """Device→host fetch shared by the sync and async save paths (a fix to
    one must not silently diverge the other)."""
    host_params = jax.tree.map(np.asarray, params)
    host_opt = _flatten_with_paths(jax.tree.map(np.asarray, opt_state)) \
        if opt_state is not None else None
    return host_params, host_opt


def save_train_state(
    directory: str,
    params,
    opt_state=None,
    step: int = 0,
    epoch: int = 0,
    meta: Optional[dict] = None,
) -> None:
    host_params, host_opt = _host_snapshot(params, opt_state)
    _write_train_state_host(directory, host_params, host_opt, step, epoch, meta)


class AsyncCheckpointWriter:
    """Overlap checkpoint DISK writes with the next training epoch: the
    device→host fetch happens on the caller's thread (it must — device
    buffers are donated/updated by the next step), then the
    serialize+write+rename runs on a background thread.  A new submit to the
    same directory joins the previous write first (last/ is rewritten every
    epoch); `wait()` joins everything — call it before reading the files
    back or exiting.  The reference (and round-2 clibd_tpu) blocked the
    training loop for the whole np.savez (~seconds at ViT-B scale,
    every epoch)."""

    def __init__(self):
        import threading

        self._threading = threading
        self._pending: dict = {}
        self._errors: list = []

    def submit(self, directory: str, params, opt_state, step: int, epoch: int,
               meta: Optional[dict] = None) -> None:
        self.wait(directory)
        host_params, host_opt = _host_snapshot(params, opt_state)

        def write():
            try:
                _write_train_state_host(directory, host_params, host_opt,
                                        step, epoch, meta)
            except Exception as e:  # surfaced on the next wait()
                self._errors.append((directory, e))

        # NON-daemon: the interpreter joins outstanding writes at exit, so an
        # uncaught exception in the training loop cannot tear a half-written
        # checkpoint set (the write-then-rename makes each file atomic; the
        # join makes the SET complete)
        t = self._threading.Thread(target=write, daemon=False)
        t.start()
        self._pending[directory] = t

    def wait(self, directory: Optional[str] = None) -> None:
        """Join the write for one directory (or all); re-raise any failures —
        a silently lost checkpoint must not look like a saved one.  ALL
        queued errors drain in one exception (a stale failure must not
        resurface on a later, unrelated wait)."""
        dirs = [directory] if directory is not None else list(self._pending)
        for d in dirs:
            t = self._pending.pop(d, None)
            if t is not None:
                t.join()
        if self._errors:
            errors, self._errors = self._errors, []
            detail = "; ".join(f"{d!r}: {e!r}" for d, e in errors)
            raise RuntimeError(f"async checkpoint write(s) failed: {detail}") \
                from errors[0][1]


def load_train_state(
    directory: str, opt_state_like=None
) -> Tuple[dict, Any, dict]:
    """→ (params, opt_state or None, meta). opt_state_like: a freshly
    initialized optax state supplying the pytree structure."""
    params = load_params_npz(os.path.join(directory, "params.npz"))
    meta = {}
    meta_path = os.path.join(directory, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    opt_state = None
    opt_path = os.path.join(directory, "opt_state.npz")
    if opt_state_like is not None and os.path.exists(opt_path):
        with np.load(opt_path) as data:
            flat = {k: data[k] for k in data.files}
        donor_flat = _flatten_with_paths(opt_state_like)
        if set(donor_flat) != set(flat):
            raise ValueError("Optimizer state keys do not match the checkpoint")
        leaves_with_path = jax.tree_util.tree_leaves_with_path(opt_state_like)
        treedef = jax.tree_util.tree_structure(opt_state_like)
        new_leaves = []
        for path, leaf in leaves_with_path:
            key = "/".join(_path_str(p) for p in path)
            new_leaves.append(np.asarray(flat[key], dtype=np.asarray(leaf).dtype))
        opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params, opt_state, meta


def resolve_checkpoint_path(base: str) -> Optional[str]:
    """Reference resolution chain (util/util.py:951-963): exact path → best →
    last, for both our directories and torch .pth files."""
    for cand in (
        base,
        os.path.join(base, "best"),
        os.path.join(base, "last"),
        os.path.join(base, "best.pth"),
        os.path.join(base, "last.pth"),
    ):
        if os.path.isdir(cand) and os.path.exists(os.path.join(cand, "params.npz")):
            return cand
        if os.path.isfile(cand):
            return cand
    return None


def load_params_any(path: str, cfg=None) -> dict:
    """Load params from our npz dirs/files or a reference torch checkpoint."""
    if os.path.isdir(path):
        return load_params_npz(os.path.join(path, "params.npz"))
    if path.endswith(".npz"):
        return load_params_npz(path)
    if path.endswith((".pth", ".pt", ".tar")):
        if cfg is None:
            raise ValueError("Loading a torch checkpoint requires the ExperimentConfig")
        sd = load_torch_state_dict(path)
        sd.pop("__meta__", None)
        return clibd_params_from_reference_checkpoint(sd, cfg)
    raise ValueError(f"Unrecognized checkpoint {path!r}")


class BestLastCheckpointer:
    """best/last checkpoint pair selected by overall_acc (train_cl.py:292-319).

    async_writes=True overlaps the disk leg with the next epoch
    (AsyncCheckpointWriter); call `wait()` before reading the files back."""

    def __init__(self, directory: str, async_writes: bool = False):
        self.directory = directory
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        self._writer = AsyncCheckpointWriter() if async_writes else None

    def _save(self, subdir, params, opt_state, step, epoch, meta):
        path = os.path.join(self.directory, subdir)
        if self._writer is not None:
            self._writer.submit(path, params, opt_state, step, epoch, meta)
        else:
            save_train_state(path, params, opt_state, step, epoch, meta)

    def save_last(self, params, opt_state, step, epoch, meta=None):
        self._save("last", params, opt_state, step, epoch, meta)

    def maybe_save_best(
        self, metric: float, params, opt_state, step, epoch, meta=None, save: bool = True
    ) -> bool:
        """Track (and optionally persist) the best state; returns whether the
        metric improved — the reference's early-stop signal is `not improved`
        (train_cl.py:304-313)."""
        if self.best_metric is None or metric > self.best_metric:
            self.best_metric = metric
            self.best_epoch = epoch
            if save:
                info = dict(meta or {})
                info["overall_acc"] = metric
                self._save("best", params, opt_state, step, epoch, info)
            return True
        return False

    def wait(self):
        """Join any in-flight async writes (no-op in sync mode)."""
        if self._writer is not None:
            self._writer.wait()
