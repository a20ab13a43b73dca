import gzip
import json

import h5py
import numpy as np


def test_subset_hdf5(tiny_hdf5, tmp_path):
    from clibd_tpu.data.subset import subset_hdf5

    dst = str(tmp_path / "small.hdf5")
    subset_hdf5(tiny_hdf5, dst, {"no_split_and_seen_train": 5})
    with h5py.File(dst) as f:
        assert len(f["no_split_and_seen_train"]["image"]) == 5
        assert len(f["no_split_and_seen_train"]["barcode"]) == 5
        assert len(f["all_keys"]["image"]) == 12  # untouched


def test_summarize_per_class_acc():
    from clibd_tpu.analysis.tables import summarize_per_class_acc

    per_class = {
        "encoded_image_feature": {
            "encoded_dna_feature": {
                "seen": {1: {"species": {"a": 1.0, "b": 0.0, "c": 0.5}}},
                "unseen": {1: {"species": {"d": 0.25}}},
            }
        }
    }
    out = summarize_per_class_acc(per_class)
    key = "encoded_image_feature||encoded_dna_feature||seen"
    assert out[key]["num_classes"] == 3
    assert out[key]["perfect_classes"] == 1
    assert out[key]["zero_classes"] == 1
    assert out[key]["worst"][0] == ("b", 0.0)


def test_cli_zeroshot(tiny_hdf5, tmp_path, monkeypatch, capsys):
    """End-to-end zero-shot CLI with a tiny random CLIP checkpoint."""
    import torch

    import sys
    sys.path.insert(0, "tests")
    from test_clip import build_torch_clip

    from clibd_tpu.cli import main
    from clibd_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig

    vcfg = CLIPVisionConfig(image_size=224, patch_size=32, hidden_size=24,
                            num_layers=1, num_heads=3, mlp_dim=48, embed_dim=16)
    tcfg = CLIPTextConfig(vocab_size=49408, context_length=16, hidden_size=16,
                          num_layers=1, num_heads=2, mlp_dim=32, embed_dim=16)
    sd = build_torch_clip(vcfg, tcfg)
    ckpt = tmp_path / "clip.pt"
    torch.save(sd, str(ckpt))

    merges = ["#version: 0.2", "d i", "di p", "dip t"]
    bpe = tmp_path / "bpe.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))

    exp = tmp_path / "exp.yaml"
    exp.write_text(f"""
backbone: open_clip
dataset: bioscan_1m
batch_size: 6
load_ckpt: false
clip:
  image_size: 224
  patch_size: 32
  vision_hidden: 24
  vision_layers: 1
  vision_heads: 3
  vision_mlp: 48
  context_length: 16
  text_hidden: 16
  text_layers: 1
  text_heads: 2
  text_mlp: 32
  embed_dim: 16
  checkpoint: {ckpt}
  bpe_path: {bpe}
""")
    monkeypatch.chdir(tmp_path)
    rc = main(["zeroshot", "-e", str(exp), "--hdf5", tiny_hdf5,
               "--split", "test_seen", "--level", "order",
               "pipeline.num_workers=0"])
    assert rc == 0

    # image→image retrieval mode (reference ..._with_image_to_image.py)
    rc = main(["zeroshot", "-e", str(exp), "--hdf5", tiny_hdf5,
               "--split", "test_seen", "--image-to-image",
               "--keys-split", "all_keys", "pipeline.num_workers=0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"mode": "image_to_image"' in out and '"macro_acc"' in out

    # four-level taxonomy prompt mode (reference ..._with_four_level_text_input.py)
    rc = main(["zeroshot", "-e", str(exp), "--hdf5", tiny_hdf5,
               "--split", "test_seen", "--four-level",
               "--keys-split", "all_keys", "pipeline.num_workers=0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"mode": "four_level_text"' in out


def test_cli_finetune_insect(tmp_path, rng, monkeypatch):
    import scipy.io as sio

    from clibd_tpu.cli import main
    from tests.fixtures import random_jpeg_bytes

    n = 16
    sio.savemat(str(tmp_path / "res101.mat"), {
        "ids": np.array([[f"im{i}"] for i in range(n)], dtype=object),
        "nucleotides": np.array([["ACGT" * 40] for _ in range(n)], dtype=object),
        "species": np.array([[f"sp{i % 4}"] for i in range(n)], dtype=object),
        "labels": (np.arange(n) % 4 + 1).reshape(-1, 1),
    })
    sio.savemat(str(tmp_path / "att_splits.mat"), {
        "trainval_loc": np.arange(1, 13).reshape(1, -1),
        "test_seen_loc": np.arange(13, 17).reshape(1, -1),
    })
    with h5py.File(str(tmp_path / "images.hdf5"), "w") as f:
        g = f.create_group("images")
        for i in range(n):
            g.create_dataset(f"im{i}", data=np.frombuffer(random_jpeg_bytes(rng), dtype=np.uint8))
    with open(tmp_path / "s2o.json", "w") as f:
        json.dump({f"sp{i}": {"order": "o", "family": "f", "genus": "g"} for i in range(4)}, f)

    exp = tmp_path / "exp.yaml"
    exp.write_text("""
dataset: INSECT
batch_size: 4
output_dim: 8
load_ckpt: false
language: {enable: false}
dna:
  bert: {vocab_size: 1027, hidden_size: 32, num_layers: 1, num_heads: 4, intermediate_size: 64, max_position_embeddings: 140, with_mlm_head: true}
image:
  vit: {image_size: 224, patch_size: 56, hidden_size: 32, num_layers: 1, num_heads: 4, mlp_dim: 64}
""")
    monkeypatch.chdir(tmp_path)
    rc = main([
        "finetune", "-e", str(exp), "--modality", "dna", "--epochs", "1", "--lr", "1e-3",
        f"insect_data.path_to_att_splits_mat={tmp_path}/att_splits.mat",
        f"insect_data.path_to_res_101_mat={tmp_path}/res101.mat",
        f"insect_data.path_to_image_hdf5={tmp_path}/images.hdf5",
        f"insect_data.species_to_other={tmp_path}/s2o.json",
    ])
    assert rc == 0
