"""Eval-grid (kNN retrieval) benchmark at BIOSCAN-1M production shapes.

Synthetic 40k seen + 8k unseen queries vs the documented 21,118-record key
gallery (BASELINE.md:19), 768-dim, across the full inference_and_eval grid
(21 dim-compatible query×key cells × 2 splits = 42 searches, k_list 1/3/5 —
reference util/util.py:601-700 hot loop (e)).

Reports (1) the device-only kNN leg (prepared keys, fp32-HIGHEST matmul +
top-k, wall-clocked with np.asarray forcing — axon block_until_ready is a
no-op) and (2) the full inference_and_eval wall including host-side
micro/macro metric aggregation.

Usage: python tools/bench_knn.py [--seen 40000] [--unseen 8000] [--keys 21118]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_labels(n, rng, n_species=1000):
    sp = rng.integers(0, n_species, n)
    return [{"order": f"o{su % 10}", "family": f"f{su % 100}",
             "genus": f"g{su % 400}", "species": f"s{su}"} for su in sp]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seen", type=int, default=40000)
    ap.add_argument("--unseen", type=int, default=8000)
    ap.add_argument("--keys", type=int, default=21118)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--skip-full", action="store_true",
                    help="only the device leg (host metric agg is slow on 1-core VMs)")
    ap.add_argument("--selector", default="exact",
                    choices=("exact", "approx"),
                    help="int8 mode: candidate-selection primitive "
                         "(approx = jax.lax.approx_max_k)")
    ap.add_argument("--int8", action="store_true",
                    help="instead of the grid: int8-compressed gallery A/B "
                         "(speed, memory, recall, label agreement, re-rank)")
    args = ap.parse_args()
    if args.int8:
        return bench_int8(args.dim, selector=args.selector)

    rng = np.random.default_rng(0)
    d = args.dim

    def mat(n, dim=d):
        return rng.standard_normal((n, dim), dtype=np.float32)

    def trio(n):
        img, dna, lang = mat(n), mat(n), mat(n)
        return {
            "encoded_image_feature": img,
            "encoded_dna_feature": dna,
            "encoded_language_feature": lang,
            "averaged_feature": (img + dna) / 2,
            "concatenated_feature": np.concatenate([img, dna], axis=1),
        }

    seen = trio(args.seen)
    unseen = trio(args.unseen)
    keys = trio(args.keys)
    keys["all_key_features"] = np.concatenate(
        [keys["encoded_image_feature"], keys["encoded_dna_feature"],
         keys["encoded_language_feature"]])
    key_labels = synth_labels(args.keys, rng)
    seen["label_list"] = synth_labels(args.seen, rng)
    unseen["label_list"] = synth_labels(args.unseen, rng)
    keys["label_list"] = key_labels
    keys["all_key_features_label"] = key_labels * 3

    import jax

    from clibd_tpu.ops.knn import knn_search, prepare_keys

    print(f"devices: {jax.devices()}", flush=True)

    q_types = ["encoded_image_feature", "encoded_dna_feature",
               "encoded_language_feature", "averaged_feature",
               "concatenated_feature"]
    k_types = q_types + ["all_key_features"]

    # ---- device-only leg ----
    prep = {}
    t0 = time.time()
    for kt in k_types:
        prep[kt] = prepare_keys(keys[kt])
    for kt in k_types:
        np.asarray(prep[kt][:1])  # force
    t_prep = time.time() - t0
    print(f"key upload+normalize (6 matrices): {t_prep:.3f}s", flush=True)

    # warmup compile on each distinct (chunk shapes) combination
    knn_search(seen["encoded_image_feature"][:args.chunk],
               prep["encoded_image_feature"], k=5, query_chunk=args.chunk,
               keys_normalized=True)

    cells = 0
    t0 = time.time()
    dev_q = {}  # one upload per (split, query type) — mirrors inference_and_eval
    for qt in q_types:
        for kt in k_types:
            if keys[kt].shape[1] != seen[qt].shape[1]:
                continue
            for si, split in enumerate((seen, unseen)):
                if (si, qt) not in dev_q:
                    dev_q[(si, qt)] = jax.device_put(split[qt])
                s, i = knn_search(dev_q[(si, qt)], prep[kt], k=5,
                                  query_chunk=args.chunk, keys_normalized=True)
                cells += 1
    t_dev = time.time() - t0
    n_scores = 0
    for qt in q_types:
        for kt in k_types:
            if keys[kt].shape[1] != seen[qt].shape[1]:
                continue
            n_scores += (args.seen + args.unseen) * keys[kt].shape[0]
    flops = 2 * n_scores * d  # concat cells are 2d-dim but half the count; close enough
    print(f"device kNN grid: {cells} searches in {t_dev:.3f}s "
          f"({n_scores/1e9:.2f}G scores, ~{flops/t_dev/1e12:.2f} TF/s)", flush=True)

    if not args.skip_full:
        from clibd_tpu.engine.evaluate import inference_and_eval

        t0 = time.time()
        acc_dict, per_class, preds = inference_and_eval(
            keys, seen, unseen, k_list=(1, 3, 5), query_chunk=args.chunk)
        t_full = time.time() - t0
        print(f"full inference_and_eval (metrics+preds on host): {t_full:.3f}s "
              f"(device leg was {t_dev:.3f}s → host overhead {t_full - t_dev:.1f}s)",
              flush=True)
        print(f"grid cells: {sum(len(v) for v in acc_dict.values())}")


def bench_int8(d: int = 768, selector: str = "exact"):
    """QuantizedKeys A/B at eval-grid + 1M serving shapes (docs/PERF.md
    'int8-compressed galleries'): clustered synthetic so label agreement is
    measurable — rank flips from the ~1e-3 quantization noise must land
    inside same-cluster near-duplicates.  --selector approx additionally
    benchmarks the TPU approx_max_k candidate stage (the serving default
    for int8+rerank; recall is then reported against the exact fp32 ranks
    the same way)."""
    import jax  # noqa: F401

    from clibd_tpu.ops.knn import knn_search, prepare_keys, rerank_candidates

    def one(nq, nk, label, reps=2):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((2000, d)).astype(np.float32)
        key_cluster = rng.integers(0, 2000, nk)
        keys = centers[key_cluster] + 0.2 * rng.standard_normal((nk, d)).astype(np.float32)
        queries = (centers[rng.integers(0, 2000, nq)]
                   + 0.2 * rng.standard_normal((nq, d)).astype(np.float32))

        prep32 = prepare_keys(keys)
        s32, i32 = knn_search(queries, prep32, k=5, keys_normalized=True)
        t32 = 1e9
        for _ in range(reps):
            t0 = time.time()
            s32, i32 = knn_search(queries, prep32, k=5, keys_normalized=True)
            t32 = min(t32, time.time() - t0)

        qk = prepare_keys(keys, dtype="int8")
        _, cand = knn_search(queries, qk, k=20, selector=selector)
        t8 = 1e9
        for _ in range(reps):
            t0 = time.time()
            _, cand = knn_search(queries, qk, k=20, selector=selector)
            t8 = min(t8, time.time() - t0)
        t0 = time.time()
        s_rr, i_rr = rerank_candidates(queries, cand, keys, k=5)
        t_rr = time.time() - t0

        raw1 = float(np.mean(cand[:, 0] == i32[:, 0]))
        rr1 = float(np.mean(i_rr[:, 0] == i32[:, 0]))
        lab_raw = float(np.mean(key_cluster[cand[:, 0]] == key_cluster[i32[:, 0]]))
        print(f"{label}: fp32 {t32*1e3:.0f} ms | int8 {t8*1e3:.0f} ms | "
              f"host rerank {t_rr*1e3:.0f} ms | idx recall@1 raw {raw1:.4f} "
              f"reranked {rr1:.4f} | raw label agree {lab_raw:.4f} | "
              f"gallery {nk*d*4/1e9:.2f} GB -> {nk*(d+4)/1e9:.2f} GB", flush=True)

    one(40000, 21118, "eval-grid shape (40k q x 21k keys)")
    one(256, 1000000, "serving shape (256 q x 1M keys)")


if __name__ == "__main__":
    main()
