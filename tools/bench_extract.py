"""END-TO-END extraction benchmark: HDF5 → decode/transform → TPU encode →
embedding HDF5 write — the north-star axis (BASELINE.md: BIOSCAN-5M test-split
extraction ≥10× A100 reference).

Reports three numbers so the host-bound vs device-bound split is explicit:
  host_only    — loader throughput with the model removed
  device_only  — encode throughput on device-resident data (≈ bench.py)
  end_to_end   — the full extract_split path incl. output write

Usage: python tools/bench_extract.py [n_records] [batch] [num_workers]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main() -> None:
    import numpy as np

    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from fixtures import make_tiny_bioscan_hdf5

    import atexit
    import shutil

    tmpdir = tempfile.mkdtemp(prefix="bench_extract_")
    atexit.register(shutil.rmtree, tmpdir, True)  # cleaned up on ANY exit path
    path = os.path.join(tmpdir, "fixture.hdf5")
    t0 = time.perf_counter()
    # 256×256 JPEGs ≈ the BIOSCAN cropped_256 payload
    make_tiny_bioscan_hdf5(path, n_per_split=n_records, splits=("test_seen",),
                           image_hw=(256, 256))
    print(f"fixture: {n_records} records, {os.path.getsize(path)/1e6:.0f} MB, "
          f"built in {time.perf_counter()-t0:.0f}s", flush=True)

    import jax
    import jax.numpy as jnp

    from clibd_tpu.config.schema import ExperimentConfig
    from clibd_tpu.data.native import load_native_decoder
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
    from clibd_tpu.engine.extract import extract_split, save_extracted_features
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.parallel.mesh import create_mesh

    cfg = ExperimentConfig()
    cfg.language.enable = False
    cfg.disable_lora = True  # flagship released-recipe config (see bench.py)
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(jax.devices()[:1])

    decoder = load_native_decoder()
    spec = BatchSpec(batch_size=batch, train=False, with_language=False,
                     transport_uint8=True)

    def new_loader():
        return BioscanLoader(path, "test_seen", spec, num_workers=workers,
                             prefetch=3, decoder=decoder)

    # --- host-only: drain the pipeline, no model ---
    loader = new_loader()
    for _ in loader.batches():  # warm page cache
        pass
    t0 = time.perf_counter()
    n = 0
    for b in loader.batches():
        n += b["image"].shape[0]
    host_dt = time.perf_counter() - t0
    loader.close()

    # --- end-to-end: extract_split incl. write ---
    # warm pass first: the encode-step XLA compile (20-40 s) must not sit
    # inside the measured window (the host_only/device_only legs warm up too)
    loader = new_loader()
    extract_split(params, cfg, loader, for_key_set=False, mesh=mesh)
    loader.close()
    loader = new_loader()
    t0 = time.perf_counter()
    out = extract_split(params, cfg, loader, for_key_set=False, mesh=mesh)
    outp = os.path.join(tmpdir, "out.hdf5")
    save_extracted_features(outp, out, out, out)
    e2e_dt = time.perf_counter() - t0
    loader.close()
    assert out["encoded_image_feature"].shape[0] == n_records

    # --- device-only: same encode on device-resident data ---
    from clibd_tpu.models.clibd import clibd_apply

    @jax.jit
    def enc(p, img, dna):
        o = clibd_apply(p, cfg, image_input=img, dna_input=dna)
        return o["image"], o["dna"]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))
    dna = jnp.asarray(rng.integers(0, 1027, (batch, 133)).astype(np.int32))
    for _ in range(3):
        o = enc(params, img, dna)
    np.asarray(o[0])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        o = enc(params, img, dna)
    np.asarray(o[0]); np.asarray(o[1])
    dev_dt = time.perf_counter() - t0

    result = {
        "host_only_samples_per_s": round(n / host_dt, 1),
        "device_only_samples_per_s": round(batch * iters / dev_dt, 1),
        "end_to_end_samples_per_s": round(n_records / e2e_dt, 1),
        "records": n_records,
        "batch": batch,
        "num_workers": workers,
        "native_decoder": decoder is not None,
        "host_cpus": os.cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
