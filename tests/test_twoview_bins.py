import numpy as np
import pandas as pd


def test_two_view_loader_pairs_same_images(tiny_hdf5):
    from clibd_tpu.engine.simclr import TwoViewLoader

    loader = TwoViewLoader(tiny_hdf5, "all_keys", batch_size=4, num_workers=0, seed=3)
    v1, v2, idx = next(loader.batches(epoch=1))
    assert v1.shape == v2.shape == (4, 224, 224, 3)
    # different augmentations of the SAME images
    assert np.abs(v1 - v2).max() > 0
    loader.close()


def test_bin_labels(tmp_path, tiny_hdf5):
    import h5py

    from clibd_tpu.data.bins import bin_labels_for_split, uris_to_label_ids

    with h5py.File(tiny_hdf5, "r") as f:
        sample_ids = [s.decode() for s in f["all_keys"]["sampleid"][:]]
    tsv = tmp_path / "meta.tsv"
    uris = [f"BOLD:{i%3}" for i in range(len(sample_ids))]
    pd.DataFrame({"sampleid": sample_ids, "uri": uris}).to_csv(tsv, sep="\t", index=False)
    labels = bin_labels_for_split("all_keys", tiny_hdf5, str(tsv))
    assert labels.shape == (len(sample_ids),)
    assert labels[0] == 0 and labels[3] == 0  # same BIN -> same label
    assert len(np.unique(labels)) == 3

    np.testing.assert_array_equal(uris_to_label_ids(["b", "a", "b", "c"]), [0, 1, 0, 2])


def test_two_view_decode_once_matches_twin_pipelines(tiny_hdf5):
    """The decode-once two-crop loader reproduces the former twin-pipeline
    layout bit-for-bit (same sampling permutation; view-2 aug stream =
    seed + 104729) — the loss trajectory of existing SimCLR runs is
    unchanged by the decode-cost optimization."""
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
    from clibd_tpu.engine.simclr import TwoViewLoader

    seed = 7
    loader = TwoViewLoader(tiny_hdf5, "all_keys", batch_size=4, num_workers=0, seed=seed)
    spec = BatchSpec(batch_size=4, train=True, with_dna=False, with_language=False)
    a = BioscanLoader(tiny_hdf5, "all_keys", spec, num_workers=0, seed=seed)
    b = BioscanLoader(tiny_hdf5, "all_keys", spec, num_workers=0, seed=seed,
                      aug_seed=seed + 104729)
    for (v1, v2, idx), ba, bb in zip(loader.batches(epoch=2),
                                     a.batches(epoch=2, shuffle=True),
                                     b.batches(epoch=2, shuffle=True)):
        np.testing.assert_array_equal(idx, ba["index"])
        np.testing.assert_array_equal(v1, ba["image"])
        np.testing.assert_array_equal(v2, bb["image"])
    loader.close()
    a.close()
    b.close()
