"""One-off analysis/data subcommands (VERDICT r2 item 7): generate-split-csv,
paired failure-case figures, and the eval --unimodel path."""

import csv
import os

import numpy as np
import pytest

import jax


def test_generate_split_csv(tiny_hdf5, tmp_path, capsys):
    from clibd_tpu.cli import main

    out = str(tmp_path / "data_with_split.csv")
    rc = main(["generate-split-csv", "--hdf5", tiny_hdf5, "--out", out])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert header == ["image_file", "sampleid", "barcode", "dna_bin",
                      "order", "family", "genus", "species", "split"]
    # 9 fixture splits × 12 records
    assert len(body) == 9 * 12
    splits = {r[-1] for r in body}
    assert "all_keys" in splits and "test_seen" in splits
    # barcode column carries ACGT strings; dna_bin absent in the fixture → empty
    assert set(body[0][2]) <= set("ACGT")
    assert body[0][3] == ""

    # split subsetting
    out2 = str(tmp_path / "subset.csv")
    rc = main(["generate-split-csv", "--hdf5", tiny_hdf5, "--out", out2,
               "--splits-list", "all_keys"])
    assert rc == 0
    with open(out2) as f:
        assert len(list(csv.reader(f))) == 1 + 12


@pytest.fixture()
def cached_features(tiny_hdf5, tmp_path):
    from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
    from clibd_tpu.engine.extract import (
        extract_split, save_extracted_features, save_labels_and_ids)
    from clibd_tpu.models import init_clibd_params

    cfg = ExperimentConfig()
    cfg.image.vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                              num_layers=1, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.enable = False
    cfg.output_dim = 16
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    spec = BatchSpec(batch_size=6, train=False, with_language=False)

    def run(split, for_key=False):
        loader = BioscanLoader(tiny_hdf5, split, spec, num_workers=0)
        out = extract_split(params, cfg, loader, for_key_set=for_key)
        loader.close()
        return out

    keys_d = run("all_keys", True)
    seen_d = run("test_seen")
    unseen_d = run("test_unseen")
    feat = str(tmp_path / "features.hdf5")
    labels = str(tmp_path / "labels_test.json")
    ids = str(tmp_path / "ids_test.json")
    save_extracted_features(feat, seen_d, unseen_d, keys_d)
    save_labels_and_ids(labels, ids, seen_d, unseen_d, keys_d)
    return {"feat": feat, "labels": labels, "ids": ids}


def test_failure_cases_cli(tiny_hdf5, cached_features, tmp_path, capsys):
    from clibd_tpu.cli import main

    out = str(tmp_path / "failures")
    rc = main(["failure-cases",
               "--features", cached_features["feat"],
               "--labels", cached_features["labels"],
               "--ids", cached_features["ids"],
               "--hdf5", tiny_hdf5, "--out", out, "--max-cases", "3"])
    assert rc == 0
    # random features on 8 species → failures exist; figures land under
    # <split>/<query>_to_<key>/ with GT/pred ids in the filename
    pngs = []
    for root, _dirs, files in os.walk(out):
        pngs.extend(os.path.join(root, f) for f in files if f.endswith(".png"))
    assert pngs, "no failure-case figures written"
    assert any("encoded_image_feature_to_encoded_dna_feature" in p for p in pngs)


def test_find_failures_unit(cached_features):
    """find_failures flags exactly the species-level top-1 mismatches."""
    from clibd_tpu.analysis.failure_cases import find_failures
    from clibd_tpu.engine.extract import load_extracted_features

    seen_d, unseen_d, keys_d = load_extracted_features(
        cached_features["feat"], cached_features["labels"], cached_features["ids"])
    cases = find_failures(seen_d, keys_d, "encoded_image_feature",
                          "encoded_image_feature", max_cases=100)
    for c in cases:
        assert c["gt_species"] != c["pred_species"]
        assert 0 <= c["key_row"] < len(keys_d["label_list"])


def test_eval_unimodel(tiny_hdf5, tmp_path, monkeypatch, capsys):
    """`clibd eval --unimodel <simclr_ckpt>`: image-only grid from a
    SimCLR-pretrained backbone (inference_and_eval_with_unimodel.py)."""
    from clibd_tpu.cli import main
    from clibd_tpu.config.schema import ViTConfig
    from clibd_tpu.models.convert import save_params_npz
    from clibd_tpu.models.vit import init_vit_params

    vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                    num_layers=2, num_heads=4, mlp_dim=64)
    pre = init_vit_params(jax.random.PRNGKey(5), vit, output_dim=16)
    ckpt = tmp_path / "simclr" / "model_best"
    os.makedirs(ckpt)
    save_params_npz(pre, str(ckpt / "params.npz"))

    exp = tmp_path / "exp.yaml"
    exp.write_text("""
model_output_name: unimodel_eval
dataset: bioscan_1m
batch_size: 6
output_dim: 16
image:
  vit: {image_size: 224, patch_size: 32, hidden_size: 32, num_layers: 2, num_heads: 4, mlp_dim: 64}
""")
    monkeypatch.chdir(tmp_path)
    rc = main(["eval", "-e", str(exp), "--hdf5", tiny_hdf5,
               "--unimodel", str(ckpt),
               "project_root_path=" + str(tmp_path),
               "pipeline.num_workers=0",
               "inference_and_eval_setting.eval_on=test"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Seen Order" in out
    # image-only: the cached features carry no DNA/text columns
    import h5py

    # --unimodel suffixes the output name so it never shares the named
    # model's embedding cache (load_inference would silently cross-load)
    folder = tmp_path / "extracted_embedding" / "bioscan_1m" / "unimodel_eval_unimodel"
    with h5py.File(folder / "extracted_feature_from_test_split.hdf5") as f:
        assert "encoded_image_feature" in f["seen"]
        assert "encoded_dna_feature" not in f["seen"]


def test_subset_hdf5_stratified_cli(tiny_hdf5, tmp_path, capsys):
    """Per-species stratified pretrain subset via the CLI (the reference's
    'special 1/5 pre-train' builder): >=1 record per species, other splits
    copied verbatim."""
    import h5py

    from clibd_tpu.cli import main

    out = str(tmp_path / "subset.hdf5")
    rc = main(["subset-hdf5", "--hdf5", tiny_hdf5, "--out", out,
               "--ratio", "0.2", "--split", "no_split_and_seen_train"])
    assert rc == 0
    with h5py.File(tiny_hdf5) as src, h5py.File(out) as dst:
        src_sp = [s.decode() for s in src["no_split_and_seen_train"]["species"][:]]
        dst_sp = [s.decode() for s in dst["no_split_and_seen_train"]["species"][:]]
        assert set(dst_sp) == set(src_sp)  # every species survives
        assert len(dst_sp) < len(src_sp)
        # sliced columns stay aligned: barcode count matches species count
        assert len(dst["no_split_and_seen_train"]["barcode"]) == len(dst_sp)
        # untouched split copied verbatim
        assert len(dst["all_keys"]["species"]) == len(src["all_keys"]["species"])
