"""Embedding extraction entry points (save_embedding/, scripts/BZSL/)."""

from __future__ import annotations

import json
import os


from .common import _dataset_hdf5_path, _load_cfg, _resolve_params, _extract_split_auto


def cmd_extract(args, overrides) -> int:
    """Embedding export (reference scripts/save_embedding/extract_embedding.py).

    On a multi-host pod the split is host-sharded (each process decodes and
    encodes 1/H, allgather reassembles) and process 0 writes the file."""
    cfg = _load_cfg(args, overrides)
    from ..data.pipeline import BatchSpec
    from ..engine.extract import save_embedding_export
    from ..parallel.mesh import is_main_process

    mc = cfg.model_config
    params = _resolve_params(cfg)
    hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
    spec = BatchSpec.eval_spec(mc)
    if getattr(args, "stream", False):
        # per-batch append (5M-scale exports; --resume continues a killed
        # run bit-identically — engine/extract.stream_extract_split)
        from ..data.pipeline import BioscanLoader
        from ..engine.extract import stream_extract_split

        loader = BioscanLoader(hdf5, args.split, spec,
                               num_workers=cfg.pipeline.num_workers,
                               use_native=cfg.pipeline.use_native_decoder)
        written = stream_extract_split(params, mc, loader, args.out,
                                       resume=args.resume, progress=True)
        loader.close()
        print(f"Streamed {written} embeddings for split {args.split!r} to {args.out}")
        return 0
    out = _extract_split_auto(params, mc, cfg, hdf5, args.split, spec, progress=True)
    if is_main_process():
        save_embedding_export(args.out, out)
        print(f"Saved embeddings for split {args.split!r} to {args.out}")
    return 0


def cmd_bzsl_extract(args, overrides) -> int:
    """INSECT feature extraction → BZSL CSVs (scripts/BZSL/
    extract_feature_for_insect_dataset.py)."""
    cfg = _load_cfg(args, overrides)
    import scipy.io as sio

    from ..data.insect import INSECTDataset, INSECTLoader, export_bzsl_csvs
    from ..data.pipeline import BatchSpec
    from ..engine.extract import extract_split

    mc = cfg.model_config
    params = _resolve_params(cfg)
    ds = INSECTDataset(
        cfg.insect_data.path_to_att_splits_mat,
        cfg.insect_data.path_to_res_101_mat,
        cfg.insect_data.path_to_image_hdf5,
        cfg.insect_data.species_to_other,
        split="all",
    )
    spec = BatchSpec(batch_size=args.batch_size, train=False, with_language=False)
    loader = INSECTLoader(ds, spec)
    out = extract_split(params, mc, loader, progress=True)
    loader.close()

    res = sio.loadmat(cfg.insect_data.path_to_res_101_mat)
    class_labels = res["labels"].squeeze() - 1
    folder = os.path.join(
        cfg.project_root_path, "extracted_embedding", "INSECT",
        mc.model_output_name, "trained_on_BIOSCAN_1M",
    )
    os.makedirs(folder, exist_ok=True)
    dna_csv = os.path.join(folder, "dna_embedding_from_bioscan_clip_no_fine_tuned_on_INSECT.csv")
    img_csv = os.path.join(folder, "image_embedding_from_bioscan_clip_no_fine_tuned_on_INSECT.csv")
    export_bzsl_csvs(out["encoded_dna_feature"], out["encoded_image_feature"], class_labels, dna_csv, img_csv)
    print(dna_csv)
    print(img_csv)
    return 0


def cmd_extract_single(args, overrides) -> int:
    """Single-record encoder (reference scripts/save_embedding/
    extract_single_image.py / extract_embedding_for_single_image.py):
    embed one image file and/or one DNA barcode string."""
    cfg = _load_cfg(args, overrides)
    import numpy as np

    from ..data.pipeline import preprocess_single_image, tokenize_single_barcode
    from ..models.clibd import clibd_apply

    mc = cfg.model_config
    params = _resolve_params(cfg)
    image_input = dna_input = None
    if args.image:
        with open(args.image, "rb") as f:
            image_input = preprocess_single_image(mc, f.read())[None]
    if args.barcode:
        tok = tokenize_single_barcode(mc, args.barcode)
        dna_input = ({k: v[None] for k, v in tok.items()}
                     if isinstance(tok, dict) else tok[None])
    out = clibd_apply(params, mc, image_input=image_input, dna_input=dna_input)
    result = {}
    if out["image"] is not None:
        result["image_embedding"] = np.asarray(out["image"][0]).tolist()
    if out["dna"] is not None:
        result["dna_embedding"] = np.asarray(out["dna"][0]).tolist()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
        print(f"Wrote {args.out}")
    else:
        print(json.dumps({k: v[:8] for k, v in result.items()}))
    return 0
