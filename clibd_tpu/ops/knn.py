"""On-device kNN retrieval: L2-normalized inner-product search as
matmul + top-k, replacing the reference's CPU FAISS IndexFlatIP
(bioscanclip/util/util.py:521-553 make_prediction, :759-789
find_closest_match).

Inner-product search over L2-normalized vectors is mathematically identical
to FAISS's IndexFlatIP; scores are computed in fp32 at HIGHEST precision so
tie-breaking on ~40k×40k score matrices matches CPU fp32 (SURVEY.md §7).

The query set is processed in fixed-size chunks under lax.map (bounded HBM,
one compiled program), and can additionally be sharded over the device mesh
('data' axis) for multi-chip eval.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clibd import l2_normalize


def _knn_body(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    k: int,
    query_chunk: int,
    normalize: bool,
    keys_normalized: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if normalize:
        queries = l2_normalize(queries.astype(jnp.float32))
        if not keys_normalized:
            keys = l2_normalize(keys.astype(jnp.float32))
    n = queries.shape[0]
    pad = (-n) % query_chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = qp.reshape(-1, query_chunk, queries.shape[1])

    def search_chunk(q):
        scores = jnp.dot(q, keys.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(scores, k)

    sims, idx = jax.lax.map(search_chunk, chunks)
    sims = sims.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return sims, idx


_knn_jit = functools.partial(jax.jit, static_argnames=(
    "k", "query_chunk", "normalize", "keys_normalized"))(_knn_body)


@functools.lru_cache(maxsize=8)
def _knn_sharded_fn(mesh, k: int, query_chunk: int, normalize: bool,
                    keys_normalized: bool):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(q, keys):
        return _knn_body(q, keys, k, query_chunk, normalize, keys_normalized)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
    ))


def _knn_sharded(queries, keys, k, query_chunk, normalize, keys_normalized, mesh):
    """Query axis sharded over the mesh 'data' axis, keys replicated — each
    chip searches 1/N of the queries (no collectives: top-k over the full
    replicated key set is exact per-shard)."""
    n = queries.shape[0]
    pad = (-n) % (mesh.size * 8)  # keep per-device rows MXU-friendly
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    chunk = int(min(query_chunk, max(qp.shape[0] // mesh.size, 1)))
    fn = _knn_sharded_fn(mesh, k, chunk, normalize, keys_normalized)
    sims, idx = fn(qp, keys)
    return sims[:n], idx[:n]


@functools.lru_cache(maxsize=8)
def _knn_keysharded_fn(mesh, k: int, query_chunk: int, normalize: bool,
                       keys_normalized: bool, n_valid: int):
    """KEY-axis sharding: each device holds 1/D of the gallery and computes
    its local top-k; the k candidates per shard are all-gathered ([N, D·k])
    and re-ranked — exact global top-k with collectives only over
    candidates, never scores.  This is how a gallery that exceeds one
    chip's HBM (5M × 768 fp32 ≈ 15 GB vs 16 GB v5e) is served: weights of
    the score matmul stay fully sharded, memory per chip is 1/D."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(q, keys):
        if normalize:
            q = l2_normalize(q.astype(jnp.float32))
            if not keys_normalized:
                keys = l2_normalize(keys.astype(jnp.float32))
        local_rows = keys.shape[0]
        offset = jax.lax.axis_index(DATA_AXIS) * local_rows
        # rows past n_valid are padding (keys padded to a multiple of D) —
        # exclude them BEFORE the local top-k, or a zero pad row could
        # outrank a genuinely negative similarity
        valid = (offset + jnp.arange(local_rows)) < n_valid
        n = q.shape[0]
        pad = (-n) % query_chunk
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        chunks = qp.reshape(-1, query_chunk, q.shape[1])

        def search_chunk(qc):
            scores = jnp.dot(qc, keys.T, precision=jax.lax.Precision.HIGHEST)
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            return jax.lax.top_k(scores, k)

        sims, idx = jax.lax.map(search_chunk, chunks)
        sims = sims.reshape(-1, k)[:n]
        idx = idx.reshape(-1, k)[:n] + offset
        sims_all = jax.lax.all_gather(sims, DATA_AXIS, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, DATA_AXIS, axis=1, tiled=True)
        top_sims, pos = jax.lax.top_k(sims_all, k)
        return top_sims, jnp.take_along_axis(idx_all, pos, axis=1)

    # check_vma=False: the outputs ARE replicated (every device ranks the
    # same all-gathered candidate set deterministically) but the static
    # replication checker can't infer that through top_k/take_along_axis
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(DATA_AXIS, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    ))


def prepare_keys(keys, mesh=None) -> jnp.ndarray:
    """Upload + L2-normalize a key matrix ONCE for reuse across the eval
    grid (each (query_type × split) search over the same key_type would
    otherwise re-transfer and re-normalize the identical ~40k×768 matrix).

    mesh: shard the key rows over the mesh 'data' axis (padding to a
    multiple of the mesh size) — pass the ORIGINAL row count to
    knn_search(n_valid_keys=...) so pad rows never rank.  This is the
    resident layout for galleries larger than one chip's HBM."""
    if mesh is None or mesh.size <= 1:
        return jax.jit(lambda x: l2_normalize(x.astype(jnp.float32)))(jnp.asarray(keys))
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    keys = np.asarray(keys, np.float32)
    pad = (-keys.shape[0]) % mesh.size
    if pad:
        keys = np.concatenate([keys, np.zeros((pad, keys.shape[1]), np.float32)])
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    dev = jax.device_put(keys, sharding)
    return jax.jit(lambda x: l2_normalize(x), out_shardings=sharding)(dev)


def knn_search(
    queries,
    keys,
    k: int = 5,
    query_chunk: int = 4096,
    normalize: bool = True,
    keys_normalized: bool = False,
    mesh=None,
    shard: str = "queries",
    n_valid_keys: int = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (similarities [N,k] fp32, indices [N,k] int32), sorted descending.

    Exact (non-approximate) search, like the reference's IndexFlatIP.
    keys_normalized=True: keys came from prepare_keys (device-resident,
    already unit-norm) — skip their normalization.
    mesh + shard='queries': shard the QUERY axis over the mesh's 'data'
    axis (keys replicated, no collectives) — multi-chip eval-grid speedup
    for many queries.
    mesh + shard='keys': shard the KEY axis (each chip holds 1/D of the
    gallery, local top-k, all-gather candidates, re-rank) — for galleries
    larger than one chip's HBM and few-query serving.  Pass prepare_keys(
    keys, mesh=...) output plus n_valid_keys=<original row count> (pad rows
    are masked before ranking)."""
    if shard not in ("queries", "keys"):
        raise ValueError(f"shard must be 'queries' or 'keys', got {shard!r}")
    queries = jnp.asarray(queries, jnp.float32)
    keys = jnp.asarray(keys, jnp.float32)
    query_chunk = int(min(query_chunk, max(queries.shape[0], 1)))
    n_valid = int(n_valid_keys if n_valid_keys is not None else keys.shape[0])
    k = int(min(k, n_valid))
    if n_valid_keys is not None and not (
            mesh is not None and mesh.size > 1 and shard == "keys"):
        # padded keys (prepare_keys(mesh=...)) searched on a path without
        # pad masking: slice the pad rows off instead of silently ranking
        # zero rows as real keys
        keys = keys[:n_valid]
    if mesh is not None and mesh.size > 1 and shard == "keys":
        if keys.shape[0] % mesh.size:
            raise ValueError(
                f"key rows ({keys.shape[0]}) must be a multiple of the mesh "
                f"size ({mesh.size}) — use prepare_keys(keys, mesh=mesh)")
        if keys.shape[0] // mesh.size < k:
            # local shard smaller than k: degenerate — replicate instead
            sims, idx = _knn_jit(queries, keys[:n_valid], k, query_chunk,
                                 normalize, keys_normalized)
        else:
            fn = _knn_keysharded_fn(mesh, k, query_chunk, normalize,
                                    keys_normalized, n_valid)
            sims, idx = fn(queries, keys)
    elif mesh is not None and mesh.size > 1:
        sims, idx = _knn_sharded(queries, keys, k, query_chunk, normalize,
                                 keys_normalized, mesh)
    else:
        sims, idx = _knn_jit(queries, keys, k, query_chunk, normalize, keys_normalized)
    return np.asarray(sims), np.asarray(idx)


def find_k_closest_records(
    query_feature: np.ndarray,
    keys_feature: np.ndarray,
    key_file_names,
    k: int = 5,
    query_chunk: int = 4096,
):
    """File-name lookups for retrieval figures (reference util/util.py:224-234
    find_k_closest_records): → (names [N,k] object array, similarities).

    Parity note: unlike make_prediction (which the reference sklearn-
    normalizes first), the reference feeds RAW features to IndexFlatIP here —
    so this searches raw inner product, not cosine."""
    sims, indices = knn_search(query_feature, keys_feature, k=k,
                               query_chunk=query_chunk, normalize=False)
    names = np.asarray(key_file_names, dtype=object)[indices]
    return names, sims


def make_prediction(
    query_feature: np.ndarray,
    keys_feature: np.ndarray,
    keys_label,
    with_similarity: bool = False,
    with_indices: bool = False,
    max_k: int = 5,
    query_chunk: int = 4096,
):
    """Drop-in analogue of the reference make_prediction (util/util.py:521-553):
    returns per-query {level: [k labels]} dicts (keys_label = list of taxon
    dicts), optionally with similarities / indices."""
    sims, indices = knn_search(query_feature, keys_feature, k=max_k, query_chunk=query_chunk)
    levels = ("order", "family", "genus", "species")
    pred_list = []
    for row in indices:
        pred_list.append({level: [keys_label[i][level] for i in row] for level in levels})
    out = [pred_list]
    if with_similarity:
        out.append(sims)
    if with_indices:
        out.append(indices)
    return out[0] if len(out) == 1 else out
