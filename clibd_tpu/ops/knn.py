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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clibd import l2_normalize


class QuantizedKeys(NamedTuple):
    """int8-compressed gallery: per-row symmetric quantization of the
    L2-NORMALIZED key matrix (q = round(row/scale), scale = max|row|/127).

    Why: a 5M × 768 fp32 gallery is ~15 GB — over one v5e's HBM — but
    ~3.8 GB as int8, and XLA fuses the int8→bf16 convert into the score
    matmul's operand read, so HBM traffic per search is the int8 bytes.
    int8 of a unit row is exact in bf16 (integers ≤ 256), so the only
    approximation is the ±scale/2 quantization noise (~0.4% per element);
    tests pin recall vs exact search.  Opt-in (prepare_keys dtype='int8' /
    `clibd serve --keys-dtype int8`): the eval grid stays exact fp32."""

    q: jnp.ndarray       # [N, D] int8
    scale: jnp.ndarray   # [N] fp32 per-row dequant scale
    n_valid: int         # original row count (rows past it are padding)


def quantize_keys(keys: np.ndarray, chunk: int = 262144) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side L2-normalize + per-row int8 quantization (numpy, chunked —
    a 5M-row gallery must never materialize a second fp32 copy).
    → (q int8 [N,D], scale fp32 [N])."""
    keys = np.asarray(keys)
    n = keys.shape[0]
    q = np.empty(keys.shape, np.int8)
    scale = np.empty((n,), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = np.asarray(keys[lo:hi], np.float32)
        block /= np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-12)
        s = np.max(np.abs(block), axis=1) / 127.0
        s = np.maximum(s, 1e-12)
        q[lo:hi] = np.round(block / s[:, None]).astype(np.int8)
        scale[lo:hi] = s
    return q, scale


def _scores_chunk(q, keys, scale):
    """One score chunk: exact fp32-HIGHEST for dense keys; bf16-accumulate-
    fp32 with fused int8 dequant for quantized keys (int8 values are exact
    in bf16; the query's bf16 rounding is below the int8 noise floor)."""
    if scale is None:
        return jnp.dot(q, keys.T, precision=jax.lax.Precision.HIGHEST)
    scores = jnp.dot(q.astype(jnp.bfloat16), keys.T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return scores * scale[None, :]


def _select_top(scores: jnp.ndarray, k: int, selector: str):
    """Row-wise top-k selection primitive.

    'exact': jax.lax.top_k (XLA TopK custom call).  'approx':
    jax.lax.approx_max_k — the TPU-native PartialReduce selection built for
    MIPS retrieval; measured on the chip at 256 q × 5M keys it runs AT the
    score-matmul roofline (129 → 36-45 ms end-to-end, 3.2×) with candidate
    recall 0.9998 at 4× oversample (docs/PERF.md).  On CPU approx_max_k
    falls back to an exact lowering, so tests compare equal."""
    if selector == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


def _knn_body(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    k: int,
    query_chunk: int,
    normalize: bool,
    keys_normalized: bool = False,
    scale: Optional[jnp.ndarray] = None,
    selector: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if normalize:
        queries = l2_normalize(queries.astype(jnp.float32))
        if not keys_normalized and scale is None:
            keys = l2_normalize(keys.astype(jnp.float32))
    n = queries.shape[0]
    pad = (-n) % query_chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = qp.reshape(-1, query_chunk, queries.shape[1])

    def search_chunk(q):
        return _select_top(_scores_chunk(q, keys, scale), k, selector)

    sims, idx = jax.lax.map(search_chunk, chunks)
    sims = sims.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return sims, idx


_knn_jit = functools.partial(jax.jit, static_argnames=(
    "k", "query_chunk", "normalize", "keys_normalized", "selector"))(_knn_body)


@functools.lru_cache(maxsize=8)
def _knn_sharded_fn(mesh, k: int, query_chunk: int, normalize: bool,
                    keys_normalized: bool, has_scale: bool,
                    selector: str = "exact"):
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(q, keys, scale):
        return _knn_body(q, keys, k, query_chunk, normalize, keys_normalized,
                         scale=scale, selector=selector)

    scale_spec = (P(None),) if has_scale else ()

    def wrapped(q, keys, scale=None):
        fn = jax.shard_map(
            local if has_scale else (lambda a, b: local(a, b, None)),
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(None, None)) + scale_spec,
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        )
        return fn(q, keys, scale) if has_scale else fn(q, keys)

    return jax.jit(wrapped)


def _knn_sharded(queries, keys, k, query_chunk, normalize, keys_normalized,
                 mesh, scale=None, selector="exact"):
    """Query axis sharded over the mesh 'data' axis, keys replicated — each
    chip searches 1/N of the queries (no collectives: top-k over the full
    replicated key set is exact per-shard)."""
    n = queries.shape[0]
    pad = (-n) % (mesh.size * 8)  # keep per-device rows MXU-friendly
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    chunk = int(min(query_chunk, max(qp.shape[0] // mesh.size, 1)))
    fn = _knn_sharded_fn(mesh, k, chunk, normalize, keys_normalized,
                         scale is not None, selector)
    if scale is not None:
        sims, idx = fn(qp, keys, scale)
    else:
        sims, idx = fn(qp, keys)
    return sims[:n], idx[:n]


@functools.lru_cache(maxsize=8)
def _knn_keysharded_fn(mesh, k: int, query_chunk: int, normalize: bool,
                       keys_normalized: bool, n_valid: int,
                       has_scale: bool = False, selector: str = "exact"):
    """KEY-axis sharding: each device holds 1/D of the gallery and computes
    its local top-k; the k candidates per shard are all-gathered ([N, D·k])
    and re-ranked — exact global top-k with collectives only over
    candidates, never scores.  This is how a gallery that exceeds one
    chip's HBM (5M × 768 fp32 ≈ 15 GB vs 16 GB v5e) is served: weights of
    the score matmul stay fully sharded, memory per chip is 1/D."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(q, keys, scale):
        if normalize:
            q = l2_normalize(q.astype(jnp.float32))
            if not keys_normalized and scale is None:
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
            scores = _scores_chunk(qc, keys, scale)
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            return _select_top(scores, k, selector)  # local selection only;
            # the cross-shard candidate merge below stays exact top_k

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
    scale_spec = (P(DATA_AXIS),) if has_scale else ()

    def wrapped(q, keys, scale=None):
        fn = jax.shard_map(
            local if has_scale else (lambda a, b: local(a, b, None)),
            mesh=mesh,
            in_specs=(P(None, None), P(DATA_AXIS, None)) + scale_spec,
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return fn(q, keys, scale) if has_scale else fn(q, keys)

    return jax.jit(wrapped)


def prepare_keys(keys, mesh=None, dtype: str = "float32"):
    """Upload + L2-normalize a key matrix ONCE for reuse across the eval
    grid (each (query_type × split) search over the same key_type would
    otherwise re-transfer and re-normalize the identical ~40k×768 matrix).

    mesh: shard the key rows over the mesh 'data' axis (padding to a
    multiple of the mesh size) — pass the ORIGINAL row count to
    knn_search(n_valid_keys=...) so pad rows never rank.  This is the
    resident layout for galleries larger than one chip's HBM.

    dtype='int8': return a QuantizedKeys gallery (4× less HBM, see the
    class docstring) — knn_search accepts it wherever a key matrix goes."""
    if dtype not in ("float32", "int8"):
        raise ValueError(f"dtype must be 'float32' or 'int8', got {dtype!r}")
    if dtype == "int8":
        n = np.asarray(keys).shape[0]
        q, scale = quantize_keys(keys)
        if mesh is None or mesh.size <= 1:
            return QuantizedKeys(jnp.asarray(q), jnp.asarray(scale), n)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        pad = (-n) % mesh.size
        if pad:
            q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.int8)])
            scale = np.concatenate([scale, np.zeros((pad,), np.float32)])
        return QuantizedKeys(
            jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS, None))),
            jax.device_put(scale, NamedSharding(mesh, P(DATA_AXIS))),
            n,
        )
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
    selector: str = "exact",
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (similarities [N,k] fp32, indices [N,k] int32), sorted descending.

    Exact (non-approximate) search, like the reference's IndexFlatIP.
    selector='approx': select with jax.lax.approx_max_k (TPU PartialReduce)
    instead of exact TopK — 3.2× at 5M-key serving shapes, candidate recall
    0.9998 at 4× oversample; pair with rerank_candidates for an exact final
    top-k (the serving default for int8 galleries).  Exact lowering (no
    approximation) on CPU.
    keys_normalized=True: keys came from prepare_keys (device-resident,
    already unit-norm) — skip their normalization.
    mesh + shard='queries': shard the QUERY axis over the mesh's 'data'
    axis (keys replicated, no collectives) — multi-chip eval-grid speedup
    for many queries.
    mesh + shard='keys': shard the KEY axis (each chip holds 1/D of the
    gallery, local top-k, all-gather candidates, re-rank) — for galleries
    larger than one chip's HBM and few-query serving.  Pass prepare_keys(
    keys, mesh=...) output plus n_valid_keys=<original row count> (pad rows
    are masked before ranking).
    keys may also be a QuantizedKeys (prepare_keys dtype='int8'):
    int8-compressed gallery, approximate scores (see QuantizedKeys)."""
    if shard not in ("queries", "keys"):
        raise ValueError(f"shard must be 'queries' or 'keys', got {shard!r}")
    if selector not in ("exact", "approx"):
        raise ValueError(f"selector must be 'exact' or 'approx', got {selector!r}")
    queries = jnp.asarray(queries, jnp.float32)
    scale = None
    if isinstance(keys, QuantizedKeys):
        keys, scale, qk_valid = keys.q, keys.scale, keys.n_valid
        if n_valid_keys is None:
            n_valid_keys = qk_valid
        keys_normalized = True  # quantized AFTER normalization
    else:
        keys = jnp.asarray(keys, jnp.float32)
    query_chunk = int(min(query_chunk, max(queries.shape[0], 1)))
    n_valid = int(n_valid_keys if n_valid_keys is not None else keys.shape[0])
    k = int(min(k, n_valid))
    if n_valid < keys.shape[0] and not (
            mesh is not None and mesh.size > 1 and shard == "keys"):
        # padded keys (prepare_keys(mesh=...)) searched on a path without
        # pad masking: slice the pad rows off instead of silently ranking
        # zero rows as real keys
        keys = keys[:n_valid]
        if scale is not None:
            scale = scale[:n_valid]
    if mesh is not None and mesh.size > 1 and shard == "keys":
        if keys.shape[0] % mesh.size:
            raise ValueError(
                f"key rows ({keys.shape[0]}) must be a multiple of the mesh "
                f"size ({mesh.size}) — use prepare_keys(keys, mesh=mesh)")
        if keys.shape[0] // mesh.size < k:
            # local shard smaller than k: degenerate — replicate instead
            sims, idx = _knn_jit(queries, keys[:n_valid], k, query_chunk,
                                 normalize, keys_normalized,
                                 scale=None if scale is None else scale[:n_valid],
                                 selector=selector)
        else:
            fn = _knn_keysharded_fn(mesh, k, query_chunk, normalize,
                                    keys_normalized, n_valid,
                                    has_scale=scale is not None,
                                    selector=selector)
            sims, idx = (fn(queries, keys, scale) if scale is not None
                         else fn(queries, keys))
    elif mesh is not None and mesh.size > 1:
        sims, idx = _knn_sharded(queries, keys, k, query_chunk, normalize,
                                 keys_normalized, mesh, scale=scale,
                                 selector=selector)
    else:
        sims, idx = _knn_jit(queries, keys, k, query_chunk, normalize,
                             keys_normalized, scale=scale, selector=selector)
    return np.asarray(sims), np.asarray(idx)


def rerank_candidates(queries: np.ndarray, cand_idx: np.ndarray,
                      keys_fp32: np.ndarray, k: int,
                      normalize_queries: bool = True
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact host-side re-rank of an oversampled candidate set.

    int8 gallery searches (QuantizedKeys) rank with ~1e-3 score noise; when
    exactness matters, search the compressed gallery at k·oversample and
    re-rank those candidates against the ORIGINAL fp32 rows here.  Host RAM
    holds fp32 rows a chip's HBM cannot (5M × 768 fp32 ≈ 15 GB), and the
    gather+matmul is tiny (n_queries × M × D).

    queries [N,D]; cand_idx [N,M] from knn_search; keys_fp32: the original
    (unnormalized is fine) key matrix, h5py dataset or ndarray.
    → (sims [N,k], idx [N,k]) exact, sorted descending."""
    queries = np.asarray(queries, np.float32)
    if normalize_queries:
        queries = queries / np.maximum(
            np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    cand_idx = np.asarray(cand_idx)
    uniq, inv = np.unique(cand_idx, return_inverse=True)
    rows = np.asarray(keys_fp32[uniq] if isinstance(keys_fp32, np.ndarray)
                      else keys_fp32[list(uniq)], np.float32)
    rows /= np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
    gathered = rows[inv.reshape(cand_idx.shape)]        # [N, M, D]
    scores = np.einsum("nd,nmd->nm", queries, gathered)  # exact fp32
    k = min(k, cand_idx.shape[1])
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return (np.take_along_axis(scores, order, axis=1),
            np.take_along_axis(cand_idx, order, axis=1))


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
