"""Feature extraction engine (reference epoch/inference_epoch.py:43-111
`get_feature_and_label` + util/util.py:702-742 `get_features_and_label`).

One jitted forward over the tri-encoder model, batch sharded over the mesh's
'data' axis; ragged final batches are edge-padded to the device multiple and
trimmed on the host.  Output dict layout and the cached
`extracted_feature_from_{split}_split.hdf5` (groups seen/unseen/key ×
encoded_*_feature / averaged_feature / concatenated_feature /
all_key_features) + labels/processed-id JSONs match the reference
bit-for-bit in schema (scripts/inference_and_eval.py:535-667).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import ExperimentConfig
from ..data.pipeline import BioscanLoader
from ..models.clibd import clibd_apply
from ..parallel.mesh import (create_mesh, data_sharding, pad_to_multiple,
                             replicate, replicated, shard_batch)

ALL_TYPE_OF_FEATURES_OF_QUERY = [
    "encoded_image_feature",
    "encoded_dna_feature",
    "encoded_language_feature",
    "averaged_feature",
    "concatenated_feature",
]
ALL_TYPE_OF_FEATURES_OF_KEY = ALL_TYPE_OF_FEATURES_OF_QUERY + ["all_key_features"]


def make_encode_step(cfg: ExperimentConfig, mesh=None, compute_dtype=jnp.bfloat16,
                     use_shard_map: Optional[bool] = None):
    """Build the jitted embedding step: batch → {image, dna, language} [B, D].

    Multi-device meshes run the encoders under `shard_map` (per-device local
    shapes) rather than global-math jit: encoding is purely data-parallel, so
    the results are identical, and local shapes let the flash Pallas attention
    kernel (which does not auto-partition under jit) run per device on a
    v5e-8 the same way it runs single-chip."""

    def step(params, batch):
        out = clibd_apply(
            params,
            cfg,
            image_input=batch.get("image"),
            dna_input=batch.get("dna"),
            language_input=batch.get("language"),
            compute_dtype=compute_dtype,
        )
        return {k: out[k] for k in ("image", "dna", "language") if out[k] is not None}

    if mesh is None:
        return jax.jit(step)
    if use_shard_map is None:
        use_shard_map = mesh.size > 1
    if use_shard_map:
        from jax.sharding import PartitionSpec as P

        from ..models.layers import flash_context

        def local_step(params, batch):
            # local shapes per device → the flash kernel is safe on any mesh
            with flash_context(True):
                return step(params, batch)

        sharded = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P("data")),  # prefix specs: params replicated, batch leaves data-sharded
            out_specs=P("data"),
            # pallas_call out_shapes carry no varying-mesh-axes info — skip
            # the vma check (encoding has no cross-device collectives anyway)
            check_vma=False,
        )
        return jax.jit(sharded)
    in_shard = (replicated(mesh), data_sharding(mesh))
    return jax.jit(step, in_shardings=in_shard, out_shardings=None)


def extract_split(
    params,
    cfg: ExperimentConfig,
    loader: BioscanLoader,
    for_key_set: bool = False,
    mesh=None,
    compute_dtype=None,
    progress: bool = False,
) -> Dict:
    """→ dict with encoded_*_feature, averaged/concatenated features,
    label_list (taxon dicts), processed_id_list, file_name_list, and for key
    sets all_key_features (+labels) — reference util/util.py:702-742.

    compute_dtype follows cfg.amp by default (fp32 experiments must not be
    silently extracted in bf16 — accuracy/best-checkpoint selection would
    run at lower precision than training)."""
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    if mesh is None:
        # the loader is not host-sharded and the drain reads back full
        # arrays, both host-local patterns — default to this process's
        # devices (a global multiprocess mesh would mis-assemble batches
        # and the read-back would span non-addressable devices)
        from ..parallel.mesh import local_mesh, mesh_is_multiprocess

        mesh = create_mesh()
        if mesh_is_multiprocess(mesh):
            mesh = local_mesh()
    n_dev = mesh.size
    step = make_encode_step(cfg, mesh=mesh, compute_dtype=compute_dtype)
    params = replicate(mesh, params)

    feats = {"image": [], "dna": [], "language": []}
    t0 = time.time()
    total = 0
    pending = None  # one-step-delayed fetch: device computes batch i+1 while
    # the host materializes batch i (async dispatch keeps the TPU busy)

    def drain(item):
        out, n = item
        for k, v in out.items():
            feats[k].append(np.asarray(v[:n], np.float32))

    for batch in loader.batches(epoch=0, shuffle=False):
        model_batch = {k: batch[k] for k in ("image", "dna", "language") if k in batch}
        padded, n = pad_to_multiple(model_batch, n_dev)
        padded = shard_batch(mesh, padded)
        out = step(params, padded)
        total += n
        if pending is not None:
            drain(pending)
        pending = (out, n)
        if progress:
            dt = time.time() - t0
            print(f"\rencoded {total} samples ({total/max(dt,1e-9):.1f}/s)", end="")
    if pending is not None:
        drain(pending)
    if progress:
        print()

    enc = {
        k: (np.concatenate(v, axis=0) if v else None) for k, v in feats.items()
    }
    return finalize_split_dict(enc, loader.label_dicts(), loader.ids(), for_key_set,
                               strict_all_keys=getattr(cfg, "parity_strict", False))


def finalize_split_dict(enc: Dict, label_list, ids, for_key_set: bool,
                        strict_all_keys: bool = False) -> Dict:
    """Assemble the split dict (derived features + labels/ids) from the raw
    per-modality encoded matrices — shared by the single-host and the
    host-sharded extraction paths."""
    averaged = concatenated = None
    if enc["image"] is not None and enc["dna"] is not None:
        averaged = np.mean([enc["image"], enc["dna"]], axis=0)
        concatenated = np.concatenate([enc["image"], enc["dna"]], axis=1)

    out_dict: Dict = {
        "file_name_list": ids,
        "processed_id_list": ids,
        "encoded_image_feature": enc["image"],
        "encoded_dna_feature": enc["dna"],
        "encoded_language_feature": enc["language"],
        "averaged_feature": averaged,
        "concatenated_feature": concatenated,
        "label_list": label_list,
    }

    all_key_features = all_key_features_label = None
    if for_key_set:
        # Stack whichever modality galleries exist (reference
        # get_features_and_label, util/util.py:709-742 — its guard demands all
        # three modalities; we relax to >=2 so an image+DNA model still gets
        # the All-keys eval column instead of silently losing it;
        # cfg.parity_strict restores the reference's all-3 requirement for
        # byte-identical results tables).
        present = [enc[m] for m in ("image", "dna", "language") if enc[m] is not None]
        if len(present) >= (3 if strict_all_keys else 2):
            all_key_features = np.concatenate(present, axis=0)
            all_key_features_label = label_list * len(present)
    out_dict["all_key_features"] = all_key_features
    out_dict["all_key_features_label"] = all_key_features_label
    return out_dict


def extract_split_multihost(
    params,
    cfg: ExperimentConfig,
    path: str,
    split: str,
    spec,
    for_key_set: bool = False,
    num_workers: int = 2,
    use_native: bool = False,
    progress: bool = False,
) -> Dict:
    """Host-sharded eval extraction: each process decodes+encodes a strided
    1/H shard of the split on its LOCAL devices, the encoded matrices are
    exchanged with `process_allgather`, and every host reassembles the
    identical full-split dict.

    This removes the multi-host in-training eval duplication (previously
    every host encoded the FULL split — at 5M scale, 21k+ keys × 3 splits ×
    H hosts of redundant decode+encode per eval epoch).  Labels/ids are a
    cheap metadata read, so only the pixel/encode work is sharded; the kNN
    grid downstream stays per-host (pure device matmuls, and identical
    inputs keep the early-stop decision deterministic on every host —
    replaces the reference's stop_flag broadcast, train_cl.py:280-331)."""
    from ..data.pipeline import BioscanLoader
    from ..parallel.mesh import host_id, local_mesh, num_hosts

    h, H = host_id(), num_hosts()
    if H == 1:
        loader = BioscanLoader(path, split, spec, num_workers=num_workers,
                               use_native=use_native)
        out = extract_split(params, cfg, loader, for_key_set=for_key_set,
                            progress=progress)
        loader.close()
        return out

    from jax.experimental import multihost_utils

    loader = BioscanLoader(path, split, spec, host_id=h, num_hosts=H,
                           num_workers=num_workers, use_native=use_native,
                           drop_last=False)
    # encode the local strided shard on this host's devices only
    local = extract_split(params, cfg, loader, for_key_set=False,
                          mesh=local_mesh(), progress=progress)
    n_total = len(loader.split_reader)
    label_list = loader.split_reader.label_dicts()
    ids = loader.split_reader.ids()
    loader.close()

    # shard_indices(shuffle=False, drop_last=False) gives host g the strided
    # rows g::H, wrap-padded to equal per-host length — invert that here
    counts = [len(range(g, n_total, H)) for g in range(H)]
    enc: Dict = {}
    for modality in ("image", "dna", "language"):
        arr = local.get(f"encoded_{modality}_feature")
        if arr is None:
            enc[modality] = None
            continue
        gathered = np.asarray(
            multihost_utils.process_allgather(np.asarray(arr, np.float32)))
        full = np.empty((n_total, arr.shape[1]), np.float32)
        for g in range(H):
            full[g::H] = gathered[g][: counts[g]]
        enc[modality] = full
    return finalize_split_dict(enc, label_list, ids, for_key_set,
                               strict_all_keys=getattr(cfg, "parity_strict", False))


# ---------------------------------------------------------------------------
# Cache IO (reference scripts/inference_and_eval.py:552-667)
# ---------------------------------------------------------------------------


def save_extracted_features(
    path: str, seen_dict: Dict, unseen_dict: Dict, keys_dict: Dict
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        for split_name, split in (("seen", seen_dict), ("unseen", unseen_dict), ("key", keys_dict)):
            group = f.create_group(split_name)
            for embedding_type in ALL_TYPE_OF_FEATURES_OF_KEY:
                if embedding_type in split and split[embedding_type] is not None:
                    group.create_dataset(embedding_type, data=split[embedding_type])


def save_labels_and_ids(
    labels_path: str, processed_id_path: str, seen_dict: Dict, unseen_dict: Dict, keys_dict: Dict
) -> None:
    with open(labels_path, "w") as f:
        json.dump(
            {
                "seen_gt_dict": seen_dict["label_list"],
                "unseen_gt_dict": unseen_dict["label_list"],
                "key_gt_dict": keys_dict["label_list"],
            },
            f,
            indent=4,
        )
    with open(processed_id_path, "w") as f:
        json.dump(
            {
                "seen_id_list": seen_dict["file_name_list"],
                "unseen_id_list": unseen_dict["file_name_list"],
                "key_id_list": keys_dict["file_name_list"],
            },
            f,
            indent=4,
        )


def load_extracted_features(path: str, labels_path: str, processed_id_path: str):
    """Reload cached embeddings (reference load_inference path, :552-585)."""
    seen_dict: Dict = {}
    unseen_dict: Dict = {}
    keys_dict: Dict = {}
    with h5py.File(path, "r") as f:
        for name, d in (("seen", seen_dict), ("unseen", unseen_dict), ("key", keys_dict)):
            for t in ALL_TYPE_OF_FEATURES_OF_KEY:
                if t in f[name]:
                    d[t] = f[name][t][:]
    with open(labels_path) as jf:
        total = json.load(jf)
    seen_dict["label_list"] = total["seen_gt_dict"]
    unseen_dict["label_list"] = total["unseen_gt_dict"]
    keys_dict["label_list"] = total["key_gt_dict"]
    # all_key_features stacks the PRESENT modalities (≥2 — image+DNA models
    # have 2N rows, tri-modal 3N): derive the multiplier from the stored
    # feature shape so reload round-trips extract_split exactly
    n_keys = max(len(total["key_gt_dict"]), 1)
    akf = keys_dict.get("all_key_features")
    reps = (akf.shape[0] // n_keys) if akf is not None else 3
    keys_dict["all_key_features_label"] = total["key_gt_dict"] * reps
    with open(processed_id_path) as jf:
        ids = json.load(jf)
    seen_dict["processed_id_list"] = ids["seen_id_list"]
    unseen_dict["processed_id_list"] = ids["unseen_id_list"]
    keys_dict["processed_id_list"] = ids["key_id_list"]
    keys_dict["all_processed_id_list"] = ids["key_id_list"] * reps
    return seen_dict, unseen_dict, keys_dict


# ---------------------------------------------------------------------------
# Embedding export (reference scripts/save_embedding/extract_embedding.py:
# gzip HDF5 with encoded_*_feature + per-level label lists, Embedding.md:1-30)
# ---------------------------------------------------------------------------


def save_embedding_export(path: str, split_dict: Dict, compress: bool = True) -> None:
    kw = {"compression": "gzip"} if compress else {}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        for t in ("encoded_image_feature", "encoded_dna_feature", "encoded_language_feature"):
            if split_dict.get(t) is not None:
                f.create_dataset(t, data=split_dict[t], **kw)
        labels = split_dict["label_list"]
        for level in ("order", "family", "genus", "species"):
            f.create_dataset(
                f"{level}_list",
                data=np.array([l[level].encode() for l in labels]),
                **kw,
            )
        f.create_dataset(
            "file_name", data=np.array([s.encode() for s in split_dict["file_name_list"]]), **kw
        )


class AppendableEmbeddingWriter:
    """Batch-resizable gzip HDF5 embedding writer (reference
    scripts/save_embedding/extract_embedding_for_backend.py): datasets are
    created with unlimited maxshape and appended per batch, so 5M-scale
    exports stream without holding everything in RAM."""

    def __init__(self, path: str, feature_dim: int, compress: bool = True,
                 resume: bool = False):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        mode = "a" if (resume and os.path.exists(path)) else "w"
        self.file = h5py.File(path, mode)
        kw = {"compression": "gzip"} if compress else {}
        self.kw = kw
        self.feature_dim = feature_dim
        self._datasets: Dict[str, h5py.Dataset] = (
            {name: self.file[name] for name in self.file.keys()} if mode == "a" else {}
        )
        # a kill mid-append can leave datasets at different lengths (they are
        # resized one at a time) — the consistent prefix is the minimum
        self._n = (min(ds.shape[0] for ds in self._datasets.values())
                   if self._datasets else 0)

    @property
    def n_rows(self) -> int:
        """Rows present in EVERY dataset (the consistent prefix)."""
        return self._n

    def truncate(self, n: int) -> None:
        """Trim every dataset to its first `n` rows — used by resume to cut a
        possibly-inconsistent killed-mid-append tail back to a batch boundary."""
        for ds in self._datasets.values():
            if ds.shape[0] > n:
                ds.resize(n, axis=0)
        self._n = min(n, self._n)

    def _ensure(self, name: str, shape_tail, dtype):
        if name not in self._datasets:
            self._datasets[name] = self.file.create_dataset(
                name, shape=(0, *shape_tail), maxshape=(None, *shape_tail),
                dtype=dtype, chunks=True, **self.kw,
            )
        return self._datasets[name]

    def append(self, features: Dict[str, np.ndarray], label_dicts, file_names) -> None:
        n = len(file_names)
        if n == 0:
            return  # ds[-0:] would select ALL rows and shape-mismatch
        for t, arr in features.items():
            if arr is None:
                continue
            ds = self._ensure(t, (arr.shape[1],), np.float32)
            start = ds.shape[0]
            ds.resize(start + n, axis=0)
            ds[start : start + n] = arr
        for level in ("order", "family", "genus", "species"):
            ds = self._ensure(f"{level}_list", (), h5py.string_dtype())
            start = ds.shape[0]
            ds.resize(start + n, axis=0)
            ds[start : start + n] = [l[level] for l in label_dicts]
        ds = self._ensure("file_name", (), h5py.string_dtype())
        start = ds.shape[0]
        ds.resize(start + n, axis=0)
        ds[start : start + n] = list(file_names)
        self._n += n

    def close(self):
        self.file.close()


def stream_extract_split(
    params,
    cfg: ExperimentConfig,
    loader: BioscanLoader,
    out_path: str,
    resume: bool = False,
    compress: bool = True,
    progress: bool = False,
    max_batches: Optional[int] = None,
    compute_dtype=None,
) -> int:
    """Streaming embedding export: encode a split batch-by-batch and APPEND
    each batch to `out_path` (AppendableEmbeddingWriter schema — the
    reference's extract_embedding_for_backend.py resizable layout) instead of
    holding the whole split in RAM like `save_embedding_export`.  This is the
    5M-scale export path.

    resume=True restarts from a partial output: the killed file's consistent
    prefix (datasets can differ by one batch after a mid-append SIGKILL) is
    truncated to a batch boundary and extraction continues from that batch —
    the loader's deterministic shuffle=False order makes the result
    bit-identical to an uninterrupted run (tests/test_extract_eval.py).

    max_batches stops early after N batches (smoke tests / the soak's kill
    leg).  Returns the number of records written in THIS call.
    Single-process only: multi-host pods shard extraction via
    extract_split_multihost and write through process 0 instead.
    """
    import jax

    if jax.process_count() > 1:
        raise RuntimeError("stream_extract_split is single-process; "
                           "use extract_split_multihost on pods")
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    bs = loader.spec.batch_size
    labels = loader.label_dicts()
    ids = loader.ids()

    writer = AppendableEmbeddingWriter(out_path, feature_dim=cfg.output_dim,
                                       compress=compress, resume=resume)
    done = (writer.n_rows // bs) * bs  # consistent prefix → batch boundary
    if resume and writer.n_rows != done:
        writer.truncate(done)
    start_batch = done // bs

    step = make_encode_step(cfg, compute_dtype=compute_dtype)
    t0 = time.time()
    written = 0
    pending = None  # one-step-delayed drain: device encodes batch i+1 while
    # the host gzip-appends batch i

    def drain(item):
        nonlocal done, written
        out, n = item
        feats = {f"encoded_{k}_feature": np.asarray(v[:n], np.float32)
                 for k, v in out.items()}
        writer.append(feats, labels[done:done + n], ids[done:done + n])
        done += n
        written += n
        if progress:
            dt = time.time() - t0
            print(f"\rstreamed {done}/{len(labels)} records "
                  f"({written/max(dt,1e-9):.1f}/s this run)", end="")

    n_batches = 0
    for batch in loader.batches(epoch=0, shuffle=False, start_batch=start_batch):
        model_batch = {k: batch[k] for k in ("image", "dna", "language") if k in batch}
        # pad the ragged final batch to the compiled batch shape (one XLA
        # program for the whole stream), trim on the host
        padded, n = pad_to_multiple(model_batch, bs)
        out = step(params, padded)
        if pending is not None:
            drain(pending)
        pending = (out, n)
        n_batches += 1
        if max_batches is not None and n_batches >= max_batches:
            break
    if pending is not None:
        drain(pending)
    if progress:
        print()
    writer.close()
    return written
