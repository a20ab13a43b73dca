"""Serving throughput/latency under concurrency (engine/serve.py).

Usage: python tools/bench_serve.py [clients] [requests_per_client] [--cpu]

Measures the micro-batching effect directly: the same request load is
replayed against an InferenceService with coalescing ON (window 8 ms) and
effectively OFF (window 0, max_batch 1), reporting requests/s, mean device
batch size, and p50/p95 client latency for each.  On the real chip the
per-dispatch floor makes the ON/OFF gap the headline; on CPU the gap is
smaller but the coalescing accounting still validates.

Run on the real chip (flagship-sized model):
    python tools/bench_serve.py 16 8
Quick CPU sanity (tiny model):
    python tools/bench_serve.py 8 4 --cpu
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")
    TINY = True
else:
    TINY = False

import jax  # noqa: E402

from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig  # noqa: E402
from clibd_tpu.engine.serve import InferenceService  # noqa: E402
from clibd_tpu.models import init_clibd_params  # noqa: E402


def make_jpeg(rng, h=224, w=224) -> bytes:
    import io

    from PIL import Image

    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def run(service, jpegs, barcodes, clients, per_client):
    reqs = [(jpegs[i % len(jpegs)], barcodes[i % len(barcodes)])
            for i in range(clients * per_client)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        list(pool.map(lambda r: service.embed(image_bytes=r[0], dna=r[1],
                                              timeout=600), reqs))
    dt = time.perf_counter() - t0
    s = service.stats.snapshot()
    return {"req_per_s": len(reqs) / dt, "mean_batch": s["mean_batch_size"],
            "p50_ms": s["p50_ms"], "p95_ms": s["p95_ms"]}


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_client = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = ExperimentConfig()
    if TINY:
        cfg.output_dim = 16
        cfg.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                                  num_layers=1, num_heads=4, mlp_dim=64)
        cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                                  num_heads=4, intermediate_size=64,
                                  max_position_embeddings=140, with_mlm_head=True)
    image_size = cfg.image.vit.image_size
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    jpegs = [make_jpeg(rng, image_size, image_size) for _ in range(8)]
    barcodes = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(8)]

    results = {}
    for label, window_ms, max_batch in (("coalesced", 8.0, 32),
                                        ("unbatched", 0.0, 1)):
        svc = InferenceService(params, cfg, window_ms=window_ms,
                               max_batch=max_batch, image_size=image_size,
                               resize_to=round(image_size * 256 / 224))
        svc.pre_warm()
        run(svc, jpegs, barcodes, clients, 1)  # warm client path
        svc.stats = type(svc.stats)()          # reset counters
        results[label] = run(svc, jpegs, barcodes, clients, per_client)
        svc.close()
        print(label, {k: round(v, 2) if v is not None else None
                      for k, v in results[label].items()}, flush=True)

    speedup = results["coalesced"]["req_per_s"] / results["unbatched"]["req_per_s"]
    print(f"micro-batching speedup: {speedup:.2f}x "
          f"(mean device batch {results['coalesced']['mean_batch']:.1f} vs 1)")


if __name__ == "__main__":
    main()
