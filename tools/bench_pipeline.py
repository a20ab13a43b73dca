"""Input-pipeline throughput probe (reference
epoch/special_epoch_for_loading_speed_test.py, the manual dataloader probe):
measures decoded-batch throughput of BioscanLoader with/without the native
C++ decoder against a synthetic HDF5.

Usage: python tools/bench_pipeline.py [hdf5_path] [batch_size]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import numpy as np

    from clibd_tpu.data.native import load_native_decoder
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader

    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
        from fixtures import make_tiny_bioscan_hdf5

        import atexit, shutil
        tmpdir = tempfile.mkdtemp(prefix="bench_pipeline_")
        atexit.register(shutil.rmtree, tmpdir, True)
        path = os.path.join(tmpdir, "fixture.hdf5")
        make_tiny_bioscan_hdf5(path, n_per_split=256, splits=("no_split_and_seen_train",))
        print(f"synthetic fixture: {path}")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    for name, decoder, workers in (
        ("python+PIL, 0 workers", None, 0),
        ("python+PIL, 4 workers", None, 4),
        ("native C++ pool", load_native_decoder(), 0),
        ("native C++ pool, 4 workers", load_native_decoder(), 4),
    ):
        if name.startswith("native") and decoder is None:
            print("native decoder unavailable")
            continue
        spec = BatchSpec(batch_size=batch, train=True)
        loader = BioscanLoader(
            path, "no_split_and_seen_train", spec, num_workers=workers, decoder=decoder
        )
        n = 0
        t0 = time.perf_counter()
        for b in loader.batches(epoch=0):
            n += b["image"].shape[0]
        dt = time.perf_counter() - t0
        loader.close()
        print(f"{name}: {n/dt:.1f} images/s ({n} images in {dt:.2f}s)")


if __name__ == "__main__":
    main()
