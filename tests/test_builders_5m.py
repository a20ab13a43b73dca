"""5M-scale HDF5 builder: parallel ingestion, chunked resizable writes,
resume, and the subset re-slicer (reference generate_hdf5_file_5m.py +
create_hdf5_5M_data_with_1m_split.py)."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

from clibd_tpu.data.builders_5m import (
    build_split_hdf5_parallel,
    create_hdf5_with_subset_split,
)
from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader

from tests.fixtures import random_barcode, random_jpeg_bytes


def _make_image_dir(tmp_path, n, bad=0, seed=0):
    rng = np.random.default_rng(seed)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    files = []
    for i in range(n):
        name = f"img_{i}.jpg"
        with open(d / name, "wb") as f:
            f.write(random_jpeg_bytes(rng, h=32, w=32))
        files.append(name)
    for i in range(bad):  # truncated JPEGs the builder must skip-and-warn
        name = f"bad_{i}.jpg"
        with open(d / name, "wb") as f:
            f.write(b"\xff\xd8\xff\xe0 broken")
        files.append(name)
    return str(d), files


def _metadata(files, seed=1):
    rng = np.random.default_rng(seed)
    n = len(files)
    return pd.DataFrame({
        "split": ["train_seen" if i % 3 else "all_keys" for i in range(n)],
        "image_file": files,
        "barcode": [random_barcode(rng, 60) for _ in range(n)],
        "sampleid": [f"s{i}" for i in range(n)],
        "processid": [f"p{i}" for i in range(n)],
        "order": ["Diptera"] * n,
        "family": ["Sciaridae"] * n,
        "genus": ["Bradysia"] * n,
        "species": [f"species_{i % 5}" for i in range(n)],
    })


def test_parallel_builder_roundtrip(tmp_path):
    image_dir, files = _make_image_dir(tmp_path, 40, bad=3)
    md = _metadata(files)
    out = str(tmp_path / "built.hdf5")
    stats = build_split_hdf5_parallel(
        out, md, image_dir, chunk_size=16, num_processes=2, use_threads=True,
        log_every=0,
    )
    assert stats["records"] == 40  # 3 bad images skipped
    assert stats["skipped"] == 3
    with h5py.File(out) as f:
        assert set(f.keys()) == {"train_seen", "all_keys"}
        n = f["train_seen"]["image"].shape[0]
        assert f["train_seen"].attrs["rows_written"] == n
        assert f["train_seen"]["image_mask"][...].min() > 0

    # the built file must feed the standard loader
    spec = BatchSpec(batch_size=4, train=False, with_language=False)
    loader = BioscanLoader(out, "all_keys", spec, num_workers=0)
    batch = next(loader.batches())
    loader.close()
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["dna"].shape[0] == 4


def test_parallel_builder_resume(tmp_path, monkeypatch, capsys):
    """Interrupt after the first chunk; resume completes without duplicates."""
    image_dir, files = _make_image_dir(tmp_path, 30)
    md = _metadata(files)
    md["split"] = "all_keys"
    out = str(tmp_path / "resumable.hdf5")

    import clibd_tpu.data.builders_5m as mod

    calls = {"n": 0}
    orig = mod.ChunkedSplitWriter.append

    def crashing_append(self, records, jpegs):
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated crash")
        calls["n"] += 1
        return orig(self, records, jpegs)

    monkeypatch.setattr(mod.ChunkedSplitWriter, "append", crashing_append)
    with pytest.raises(KeyboardInterrupt):
        build_split_hdf5_parallel(out, md, image_dir, chunk_size=10,
                                  use_threads=True, log_every=0)
    monkeypatch.setattr(mod.ChunkedSplitWriter, "append", orig)
    stats = build_split_hdf5_parallel(out, md, image_dir, chunk_size=10,
                                      use_threads=True, resume=True, log_every=0)
    with h5py.File(out) as f:
        ids = [s.decode() for s in f["all_keys"]["sampleid"][...]]
    assert len(ids) == 30 and len(set(ids)) == 30  # complete, no duplicates


def test_subset_resplit(tmp_path):
    """create_hdf5_with_subset_split == the 1M-split-on-5M builder."""
    image_dir, files = _make_image_dir(tmp_path, 20)
    md = _metadata(files)
    md["split"] = "no_split_and_seen_train"
    src = str(tmp_path / "src.hdf5")
    build_split_hdf5_parallel(src, md, image_dir, chunk_size=8,
                              use_threads=True, log_every=0)
    out = str(tmp_path / "subset.hdf5")
    counts = create_hdf5_with_subset_split(
        src, out,
        {"train_seen": [f"s{i}" for i in range(0, 10)],
         "val_seen": [f"s{i}" for i in range(10, 14)] + ["missing_id"]},
    )
    assert counts == {"train_seen": 10, "val_seen": 4}
    with h5py.File(out) as f:
        got = sorted(s.decode() for s in f["val_seen"]["sampleid"][...])
        assert got == ["s10", "s11", "s12", "s13"]


@pytest.mark.slow
def test_parallel_builder_50k_throughput(tmp_path):
    """VERDICT r1 item #6 'done' criterion: a 50k-record parallel build with
    throughput logged."""
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    # one tiny JPEG reused on disk 50k times via symlinks (IO-path realistic,
    # CPU budget sane on the 1-core CI host)
    d = tmp_path / "imgs"
    d.mkdir()
    base = d / "base.jpg"
    with open(base, "wb") as f:
        f.write(random_jpeg_bytes(rng, h=32, w=32))
    files = []
    for i in range(50_000):
        name = f"img_{i}.jpg"
        os.symlink(base, d / name)
        files.append(name)
    md = _metadata(files, seed=2)
    out = str(tmp_path / "big.hdf5")
    stats = build_split_hdf5_parallel(out, md, str(d), chunk_size=8192,
                                      use_threads=True, validate_images=False,
                                      log_every=1)
    print(f"50k build: {stats}")
    assert stats["records"] == 50_000
    assert stats["records_per_s"] > 200


def test_parallel_builder_multiprocessing_path(tmp_path):
    """The fork-Pool path (use_threads=False) must work — _read_one and its
    args must be picklable across processes."""
    image_dir, files = _make_image_dir(tmp_path, 12)
    md = _metadata(files)
    md["split"] = "all_keys"
    out = str(tmp_path / "mp.hdf5")
    stats = build_split_hdf5_parallel(out, md, image_dir, chunk_size=6,
                                      num_processes=2, use_threads=False,
                                      log_every=0)
    assert stats["records"] == 12
    with h5py.File(out) as f:
        assert f["all_keys"]["image"].shape[0] == 12
