import pytest
import numpy as np

from clibd_tpu.ops.knn import knn_search, make_prediction


def _numpy_ip_search(queries, keys, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    kn = keys / np.linalg.norm(keys, axis=1, keepdims=True)
    scores = qn @ kn.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    sims = np.take_along_axis(scores, idx, axis=1)
    return sims, idx


def test_knn_matches_numpy(rng):
    q = rng.standard_normal((37, 16)).astype(np.float32)
    keys = rng.standard_normal((101, 16)).astype(np.float32)
    sims, idx = knn_search(q, keys, k=5, query_chunk=8)
    ref_sims, ref_idx = _numpy_ip_search(q, keys, 5)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(sims, ref_sims, atol=1e-5)


def test_knn_k_larger_than_keys(rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    keys = rng.standard_normal((3, 8)).astype(np.float32)
    sims, idx = knn_search(q, keys, k=5)
    assert idx.shape == (4, 3)


def test_make_prediction_labels(rng):
    q = rng.standard_normal((5, 8)).astype(np.float32)
    keys = np.concatenate([q, rng.standard_normal((20, 8)).astype(np.float32)])
    labels = [
        {"order": f"o{i}", "family": f"f{i}", "genus": f"g{i}", "species": f"s{i}"}
        for i in range(len(keys))
    ]
    preds, sims, idx = make_prediction(q, keys, labels, with_similarity=True, with_indices=True, max_k=3)
    # each query's own copy sits in keys -> top-1 must be itself
    for i in range(5):
        assert idx[i, 0] == i
        assert preds[i]["species"][0] == f"s{i}"
        assert sims[i, 0] > 0.999


def test_find_k_closest_records(rng):
    """Reference parity: find_k_closest_records searches RAW inner product
    (util/util.py:224-234 feeds unnormalized features to IndexFlatIP) — so
    self-retrieval is only guaranteed on unit-norm inputs."""
    from clibd_tpu.ops.knn import find_k_closest_records

    q = rng.standard_normal((3, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    extra = rng.standard_normal((10, 8)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    keys = np.concatenate([q, extra])
    names = [f"file{i}.jpg" for i in range(len(keys))]
    got, sims = find_k_closest_records(q, keys, names, k=2)
    assert got.shape == (3, 2)
    for i in range(3):
        assert got[i, 0] == f"file{i}.jpg"
    # raw-IP semantics: a doubled copy of q0 outranks q0 itself (cosine
    # search would tie them at 1.0 — the reference's behavior is IP)
    keys2 = np.concatenate([keys, 2.0 * q[:1]])
    got2, _ = find_k_closest_records(q, keys2, names + ["big.jpg"], k=1)
    assert got2[0, 0] == "big.jpg"


def test_knn_sharded_matches_single(rng):
    """Query-sharded multi-chip search (mesh path) == single-device search,
    including with prepared (pre-normalized, device-resident) keys and a
    query count not divisible by the mesh size."""
    import jax

    from clibd_tpu.ops.knn import knn_search, prepare_keys
    from clibd_tpu.parallel.mesh import create_mesh

    q = rng.standard_normal((101, 16)).astype(np.float32)
    keys = rng.standard_normal((57, 16)).astype(np.float32)
    mesh = create_mesh(jax.devices()[:8])

    s1, i1 = knn_search(q, keys, k=5)
    s2, i2 = knn_search(q, keys, k=5, mesh=mesh)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    prep = prepare_keys(keys)
    s3, i3 = knn_search(q, prep, k=5, keys_normalized=True, mesh=mesh)
    np.testing.assert_array_equal(i1, i3)
    np.testing.assert_allclose(s1, s3, atol=1e-6)


def test_knn_key_sharded_matches_single(rng):
    """KEY-sharded search (gallery split over the mesh, local top-k +
    candidate all-gather + re-rank) == single-device search, including a
    key count NOT divisible by the mesh size (pad rows masked), ties at
    duplicate keys, and the degenerate tiny-gallery fallback."""
    import jax

    from clibd_tpu.ops.knn import knn_search, prepare_keys
    from clibd_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(jax.devices()[:8])
    q = rng.standard_normal((7, 16)).astype(np.float32)
    keys = rng.standard_normal((203, 16)).astype(np.float32)  # 203 % 8 != 0

    s1, i1 = knn_search(q, keys, k=5)
    prep = prepare_keys(keys, mesh=mesh)
    assert prep.shape[0] == 208  # padded to a multiple of 8
    s2, i2 = knn_search(q, prep, k=5, keys_normalized=True, mesh=mesh,
                        shard="keys", n_valid_keys=keys.shape[0])
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    # indices may differ only where scores tie; none expected for gaussians
    np.testing.assert_array_equal(i1, i2)
    assert int(i2.max()) < keys.shape[0]  # pad rows never surface

    # un-prepared sharded call must demand aligned rows
    try:
        knn_search(q, keys, k=5, mesh=mesh, shard="keys")
        assert False, "expected ValueError for misaligned key rows"
    except ValueError:
        pass

    # unknown shard strings are an error, not a silent fall-through to the
    # unmasked query-sharded path
    try:
        knn_search(q, prep, k=5, mesh=mesh, shard="key", n_valid_keys=203)
        assert False, "expected ValueError for bad shard"
    except ValueError:
        pass

    # padded keys searched on the FLAT path with n_valid_keys: pad rows are
    # sliced off, results equal the unpadded search
    s_flat, i_flat = knn_search(q, np.asarray(prep), k=5,
                                keys_normalized=True, n_valid_keys=203)
    np.testing.assert_array_equal(i1, i_flat)
    np.testing.assert_allclose(s1, s_flat, atol=1e-6)

    # degenerate: local shard (2 rows) < k → exact fallback, same results
    tiny = rng.standard_normal((16, 16)).astype(np.float32)
    tp = prepare_keys(tiny, mesh=mesh)
    s3, i3 = knn_search(q, tp, k=5, keys_normalized=True, mesh=mesh,
                        shard="keys", n_valid_keys=16)
    s4, i4 = knn_search(q, tiny, k=5)
    np.testing.assert_allclose(s3, s4, atol=1e-6)
    np.testing.assert_array_equal(i3, i4)


def test_quantized_keys_recall_and_error_bounds(rng):
    """int8-compressed gallery (prepare_keys dtype='int8'): per-element
    dequant error ≤ scale/2, scores within ~1% of exact, and recall@1 == 1.0
    on clustered data where the true neighbor is unambiguous."""
    from clibd_tpu.ops.knn import knn_search, prepare_keys, quantize_keys

    d = 64
    centers = rng.standard_normal((40, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    keys = np.repeat(centers, 10, axis=0) + 0.05 * rng.standard_normal((400, d)).astype(np.float32)
    q, scale = quantize_keys(keys)
    keysn = keys / np.linalg.norm(keys, axis=1, keepdims=True)
    err = np.abs(q.astype(np.float32) * scale[:, None] - keysn)
    assert (err < scale[:, None] * 0.5 + 1e-7).all()

    queries = centers + 0.03 * rng.standard_normal(centers.shape).astype(np.float32)
    s_exact, i_exact = knn_search(queries, keys, k=5)
    qk = prepare_keys(keys, dtype="int8")
    assert qk.q.dtype == np.int8 and qk.n_valid == 400
    s_q, i_q = knn_search(queries, qk, k=5)
    # top-1 must agree where the margin is far above the quantization noise
    np.testing.assert_array_equal(i_q[:, 0], i_exact[:, 0])
    np.testing.assert_allclose(s_q[:, 0], s_exact[:, 0], atol=0.02)


def test_quantized_keys_sharded_paths_match_single(rng):
    """int8 gallery through the query-sharded AND key-sharded mesh paths ==
    the single-device int8 search (key rows not divisible by the mesh —
    pad rows must never rank)."""
    import jax

    from clibd_tpu.ops.knn import knn_search, prepare_keys
    from clibd_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(jax.devices()[:8])
    d = 32
    keys = rng.standard_normal((203, d)).astype(np.float32)
    queries = rng.standard_normal((23, d)).astype(np.float32)

    qk1 = prepare_keys(keys, dtype="int8")
    s1, i1 = knn_search(queries, qk1, k=5)

    qk_sh = prepare_keys(keys, dtype="int8", mesh=mesh)
    assert qk_sh.q.shape[0] % 8 == 0 and qk_sh.n_valid == 203
    s2, i2 = knn_search(queries, qk_sh, k=5, mesh=mesh, shard="keys")
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    s3, i3 = knn_search(queries, qk1, k=5, mesh=mesh, shard="queries")
    np.testing.assert_array_equal(i1, i3)
    np.testing.assert_allclose(s1, s3, atol=1e-5)


def test_int8_with_host_rerank_is_exact(rng):
    """Gallery with margins below the int8 noise floor (~1e-3) so raw int8
    ranks flip, but clusters small enough that the oversampled candidate set
    COVERS the true top-k: the host re-rank against the original fp32 rows
    must then restore the exact top-k.  (Coverage is the guarantee's
    premise: with clusters of near-duplicates larger than the candidate
    set, no re-rank can recover what the int8 pass never surfaced — that
    regime needs a bigger --keys-rerank.)"""
    from clibd_tpu.ops.knn import knn_search, prepare_keys, rerank_candidates

    d = 64
    centers = rng.standard_normal((20, d)).astype(np.float32)
    keys = (centers[np.repeat(np.arange(20), 20)]
            + 0.05 * rng.standard_normal((400, d)).astype(np.float32))
    queries = (centers[rng.integers(0, 20, 50)]
               + 0.02 * rng.standard_normal((50, d)).astype(np.float32))

    s_exact, i_exact = knn_search(queries, keys, k=5)
    qk = prepare_keys(keys, dtype="int8")
    s_raw, i_raw = knn_search(queries, qk, k=40)  # 8x oversample
    # raw int8 order differs somewhere (margins below the noise floor) ...
    assert not np.array_equal(i_raw[:, :5], i_exact)
    # ... but every true top-5 row is inside the 40-candidate set ...
    assert all(set(e) <= set(c) for e, c in zip(i_exact, i_raw))
    # ... so the fp32 re-rank restores the exact result
    s_rr, i_rr = rerank_candidates(queries, i_raw, keys, k=5)
    np.testing.assert_array_equal(i_rr, i_exact)
    np.testing.assert_allclose(s_rr, s_exact, atol=1e-5)

    # re-rank math sanity: with FULL coverage (all keys as candidates) the
    # re-rank IS the exact search
    all_cand = np.tile(np.arange(400), (len(queries), 1))
    s_all, i_all = rerank_candidates(queries, all_cand, keys, k=5)
    np.testing.assert_array_equal(i_all, i_exact)


def test_selector_approx_plumbing(rng):
    """selector='approx' (jax.lax.approx_max_k, the TPU PartialReduce
    retrieval primitive) through all three dispatch paths.  On CPU the op
    lowers exactly, so results must EQUAL the exact selector — this pins the
    plumbing (static args, shard wrappers, int8 scale), while the recall/
    speed numbers live in docs/PERF.md from the real-chip measurement."""
    import jax

    from clibd_tpu.ops.knn import knn_search, prepare_keys

    d = 32
    keys = rng.standard_normal((300, d)).astype(np.float32)
    queries = rng.standard_normal((17, d)).astype(np.float32)
    s0, i0 = knn_search(queries, keys, k=5)
    s1, i1 = knn_search(queries, keys, k=5, selector="approx")
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)

    qk = prepare_keys(keys, dtype="int8")
    s2, i2 = knn_search(queries, qk, k=5)
    s3, i3 = knn_search(queries, qk, k=5, selector="approx")
    np.testing.assert_array_equal(i2, i3)

    if jax.device_count() >= 8:
        from clibd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(jax.devices()[:8])
        qk_sh = prepare_keys(keys, dtype="int8", mesh=mesh)
        s4, i4 = knn_search(queries, qk_sh, k=5, mesh=mesh, shard="keys",
                            selector="approx")
        np.testing.assert_array_equal(i2, i4)
        s5, i5 = knn_search(queries, keys, k=5, mesh=mesh, shard="queries",
                            selector="approx")
        np.testing.assert_array_equal(i0, i5)

    with pytest.raises(ValueError):
        knn_search(queries, keys, k=5, selector="fast")
