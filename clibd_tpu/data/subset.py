"""HDF5 subsetting (reference scripts/data_processing/
create_special_pre_train_for_bioscan_5m[_multi_processing].py): build a
smaller split HDF5 whose pretrain group is a random subset, keeping the
other splits intact — the `train_with_small_subset` input."""

from __future__ import annotations

from typing import Dict

import h5py
import numpy as np


def subset_hdf5(
    src_path: str,
    dst_path: str,
    subset_sizes: Dict[str, int],
    seed: int = 42,
) -> str:
    """Copy src to dst; for splits named in subset_sizes, keep a random
    subset of that many records (all per-record datasets sliced together)."""
    rng = np.random.default_rng(seed)
    with h5py.File(src_path, "r") as src, h5py.File(dst_path, "w") as dst:
        for split in src.keys():
            sg = src[split]
            dg = dst.create_group(split)
            n = None
            for key in sg.keys():
                n = len(sg[key])
                break
            if split in subset_sizes and n is not None and subset_sizes[split] < n:
                keep = np.sort(rng.choice(n, size=subset_sizes[split], replace=False))
            else:
                keep = None
            for key in sg.keys():
                data = sg[key][:]
                if keep is not None and len(data) == n:
                    data = data[keep]
                dg.create_dataset(key, data=data)
    return dst_path
