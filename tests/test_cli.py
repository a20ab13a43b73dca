"""CLI smoke tests: eval and extract paths over the tiny fixture."""

import json
import os

import h5py
import numpy as np
import pytest

from clibd_tpu.cli import main

TINY_EXP = """
model_output_name: tiny_test
dataset: bioscan_1m
batch_size: 6
epochs: 1
output_dim: 16
disable_lora: false
load_ckpt: false
default_seed: 42
image:
  vit:
    image_size: 224
    patch_size: 32
    hidden_size: 32
    num_layers: 2
    num_heads: 4
    mlp_dim: 64
dna:
  bert:
    vocab_size: 1027
    hidden_size: 32
    num_layers: 2
    num_heads: 4
    intermediate_size: 64
    max_position_embeddings: 140
    with_mlm_head: true
language:
  bert:
    vocab_size: 2000
    hidden_size: 16
    num_layers: 2
    num_heads: 2
    intermediate_size: 32
    max_position_embeddings: 24
"""


@pytest.fixture()
def tiny_exp_yaml(tmp_path):
    p = tmp_path / "tiny.yaml"
    p.write_text(TINY_EXP)
    return str(p)


def test_cli_configs_lists(capsys):
    assert main(["configs"]) == 0
    out = capsys.readouterr().out
    assert "for_bioscan_1m/image_dna_text_seed_42.yaml" in out


def test_cli_eval(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "eval", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "project_root_path=" + str(tmp_path),
        "pipeline.num_workers=0",
        "inference_and_eval_setting.eval_on=test",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Seen Order" in out
    folder = tmp_path / "extracted_embedding" / "bioscan_1m" / "tiny_test"
    assert (folder / "extracted_feature_from_test_split.hdf5").exists()
    assert (folder / "labels_test.json").exists()
    assert (folder / "processed_id_test.json").exists()
    assert (folder / "acc_dict_test.json").exists()
    assert (tmp_path / "logs" / "results.csv").exists()
    with h5py.File(folder / "extracted_feature_from_test_split.hdf5") as f:
        assert set(f.keys()) == {"seen", "unseen", "key"}

    # second run reloads from cache (load_inference)
    rc = main([
        "eval", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "project_root_path=" + str(tmp_path),
        "load_inference=true",
        "pipeline.num_workers=0",
    ])
    assert rc == 0


def test_cli_extract(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out_path = str(tmp_path / "emb.hdf5")
    rc = main([
        "extract", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "--split", "all_keys", "--out", out_path,
        "pipeline.num_workers=0",
    ])
    assert rc == 0
    with h5py.File(out_path) as f:
        assert f["encoded_image_feature"].shape == (12, 16)
        assert f["species_list"].shape == (12,)
