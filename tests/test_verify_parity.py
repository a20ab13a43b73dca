"""Released-artifact parity harness, exercised offline end-to-end: a
synthetic "released" artifact pair (reference README.md:29-44 formats) is
generated from known params, then `clibd verify-parity` must pass against the
same params and fail against perturbed ones."""

import json
import os

import numpy as np
import pytest

import jax

from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
from clibd_tpu.engine.extract import (
    extract_split,
    save_extracted_features,
    save_labels_and_ids,
)
from clibd_tpu.engine.verify_parity import (
    compare_embeddings,
    compare_top1,
    format_report,
    load_released,
    tokenizer_report,
    verify_parity,
)
from clibd_tpu.models import init_clibd_params
from clibd_tpu.models.convert import save_params_npz
from clibd_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = ExperimentConfig()
    cfg.image.vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                              num_layers=2, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.bert = BertConfig(vocab_size=2000, hidden_size=16, num_layers=2,
                                   num_heads=2, intermediate_size=32,
                                   max_position_embeddings=24)
    cfg.output_dim = 16
    cfg.batch_size = 6
    # fp32: the released fixture and the re-extraction run on different mesh
    # shapes — bf16 rounding differences flip near-tie top-1 on 12 random
    # samples (real artifacts have fp32 features and real margins)
    cfg.amp = False
    return cfg


@pytest.fixture(scope="module")
def tiny_hdf5(tmp_path_factory):
    from tests.fixtures import make_tiny_bioscan_hdf5

    path = tmp_path_factory.mktemp("vp") / "tiny.hdf5"
    make_tiny_bioscan_hdf5(str(path))
    return str(path)


@pytest.fixture(scope="module")
def released(tmp_path_factory, tiny_hdf5, tiny_cfg):
    """Synthesize the released artifact set: best-ckpt (npz), the cached
    feature HDF5 in the reference's seen/unseen/key schema, and sidecars."""
    folder = str(tmp_path_factory.mktemp("released"))
    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    ckpt = os.path.join(folder, "best.npz")
    save_params_npz(params, ckpt)

    mesh = create_mesh(jax.devices()[:2])
    spec = BatchSpec(batch_size=6, train=False)

    def run(split, for_key=False):
        loader = BioscanLoader(tiny_hdf5, split, spec, num_workers=0)
        out = extract_split(params, tiny_cfg, loader, for_key_set=for_key, mesh=mesh)
        loader.close()
        return out

    keys_dict = run("all_keys", for_key=True)
    seen_dict = run("test_seen")
    unseen_dict = run("test_unseen")

    feat = os.path.join(folder, "extracted_feature_from_test_split.hdf5")
    labels = os.path.join(folder, "labels_test.json")
    ids = os.path.join(folder, "processed_id_test.json")
    save_extracted_features(feat, seen_dict, unseen_dict, keys_dict)
    save_labels_and_ids(labels, ids, seen_dict, unseen_dict, keys_dict)
    return {"folder": folder, "ckpt": ckpt, "feat": feat, "labels": labels,
            "ids": ids, "params": params}


def test_full_pass(released, tiny_hdf5, tiny_cfg):
    report = verify_parity(
        tiny_cfg,
        ckpt=released["ckpt"],
        released_embeddings=released["feat"],
        hdf5=tiny_hdf5,
        n=None,
        progress=False,
    )
    text = format_report(report)
    assert report["ok"], text
    legs = report["legs"]
    assert set(legs) == {"convert", "reextract", "embedding_cosine", "species_top1"}
    cos = legs["embedding_cosine"]["splits"]["seen"]["modalities"]
    assert cos["encoded_image_feature"]["mean"] > 0.999
    assert legs["embedding_cosine"]["splits"]["seen"]["alignment"] == "by_id"
    assert legs["species_top1"]["max_abs_delta"] == 0.0
    assert "PASS" in text and "OVERALL: PASS" in text


def test_perturbed_embeddings_fail(released, tiny_hdf5, tiny_cfg, tmp_path):
    """A corrupted released artifact must fail the cosine leg."""
    import h5py
    import shutil

    bad = str(tmp_path / "bad.hdf5")
    shutil.copy(released["feat"], bad)
    with h5py.File(bad, "r+") as f:
        d = f["seen"]["encoded_image_feature"]
        rng = np.random.default_rng(0)
        d[...] = rng.normal(size=d.shape).astype(np.float32)
    report = verify_parity(
        tiny_cfg, ckpt=released["ckpt"], released_embeddings=bad,
        released_labels=released["labels"], released_ids=released["ids"],
        hdf5=tiny_hdf5, n=None, progress=False)
    assert not report["ok"]
    assert not report["legs"]["embedding_cosine"]["ok"]


def test_eval_only_leg(released, tiny_cfg):
    report = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                           progress=False)
    assert "released_eval" in report["legs"]
    rep = report["legs"]["released_eval"]
    assert rep["ok"] and rep["species_top1"]
    # expected-value deltas: exact self-comparison passes, shifted fails
    expected = dict(list(rep["species_top1"].items())[:3])
    report2 = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                            expected=expected, progress=False)
    assert report2["legs"]["released_eval"]["max_abs_delta"] == 0.0
    shifted = {k: min(1.0, v + 0.5) for k, v in expected.items()}
    report3 = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                            expected=shifted, progress=False)
    assert not report3["legs"]["released_eval"]["ok"]


def test_positional_alignment_without_sidecars(released, tiny_hdf5, tiny_cfg, tmp_path):
    """A bare released HDF5 (no sidecar JSONs, as linked from the README
    table) still compares, positionally."""
    import shutil

    bare_dir = tmp_path / "bare"
    bare_dir.mkdir()
    bare = str(bare_dir / "extracted_feature_from_test_split.hdf5")
    shutil.copy(released["feat"], bare)
    report = verify_parity(tiny_cfg, ckpt=released["ckpt"],
                           released_embeddings=bare, hdf5=tiny_hdf5,
                           n=None, progress=False)
    assert report["ok"], format_report(report)
    assert report["legs"]["embedding_cosine"]["splits"]["seen"]["alignment"] == "positional"


def test_n_limit_slices_head(released, tiny_hdf5, tiny_cfg):
    report = verify_parity(tiny_cfg, ckpt=released["ckpt"],
                           released_embeddings=released["feat"],
                           released_labels=released["labels"],
                           released_ids=released["ids"],
                           hdf5=tiny_hdf5, n=7, progress=False)
    assert report["legs"]["reextract"]["n_seen"] == 7
    # id-based alignment matches the slice against the full released set
    assert report["legs"]["embedding_cosine"]["splits"]["seen"]["aligned_rows"] == 7
    assert report["legs"]["embedding_cosine"]["ok"]
    # the top-1 leg must score BOTH sides over the same aligned population —
    # scoring our 7-row slice against released's full gallery would differ
    # by population mismatch alone (code-review finding).  Identical
    # embeddings on aligned rows → exactly equal accuracies.
    top1 = report["legs"]["species_top1"]
    assert top1["max_abs_delta"] == 0.0, top1
    assert all(v == 1.0 for v in top1["label_agreement"].values())
    assert top1["ok"]


def _build_fixture_tokenizer_json(path: str, k: int = 5):
    """A WordLevel tokenizer.json over our exact k-mer vocab: an independent
    (HF tokenizers) implementation of the same id assignment, standing in for
    the vendored BarcodeBERT tokenizer until network exists."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    from clibd_tpu.data.tokenizers import kmer_vocab

    vocab = {tok: i for i, tok in enumerate(kmer_vocab(k))}
    tok = Tokenizer(WordLevel(vocab, unk_token="<UNK>"))
    tok.pre_tokenizer = Whitespace()
    # the reference pipeline prepends literal id 0 (<MASK>) — reproduce via
    # post-processor so the HF widths line up with ours
    tok.post_processor = TemplateProcessing(
        single="<MASK> $A", special_tokens=[("<MASK>", 0)])
    tok.enable_padding(pad_id=vocab["<UNK>"], pad_token="<UNK>")
    tok.save(path)
    return path


def test_tokenizer_leg(tmp_path):
    tok_json = _build_fixture_tokenizer_json(str(tmp_path / "tokenizer.json"))
    rng = np.random.default_rng(0)
    barcodes = ["".join(rng.choice(list("ACGT"), 660)) for _ in range(8)]
    rep = tokenizer_report(tok_json, barcodes, k=5, stride=5, max_bp=660)
    assert rep["ok"], rep
    assert rep["id_match_frac"] == 1.0


def test_tokenizer_leg_catches_mismatch(tmp_path):
    """A tokenizer with a different vocab order must fail the leg."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    from clibd_tpu.data.tokenizers import kmer_vocab

    vocab_list = kmer_vocab(5)
    # swap the k-mer block order (reverse) — ids shift for every k-mer
    scrambled = vocab_list[:3] + vocab_list[3:][::-1]
    vocab = {tok: i for i, tok in enumerate(scrambled)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<UNK>"))
    tok.pre_tokenizer = Whitespace()
    tok.enable_padding(pad_id=vocab["<UNK>"], pad_token="<UNK>")
    path = str(tmp_path / "bad_tokenizer.json")
    tok.save(path)
    rng = np.random.default_rng(1)
    barcodes = ["".join(rng.choice(list("ACGT"), 660)) for _ in range(4)]
    rep = tokenizer_report(path, barcodes, k=5, stride=5, max_bp=660)
    assert not rep["ok"]


TINY_EXP = """
model_output_name: tiny_vp
dataset: bioscan_1m
amp: false
batch_size: 6
epochs: 1
output_dim: 16
load_ckpt: false
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


def test_cli_verify_parity(released, tiny_hdf5, tmp_path, monkeypatch):
    """The push-button command end-to-end (exit code + JSON report)."""
    from clibd_tpu.cli import main

    exp = tmp_path / "tiny.yaml"
    exp.write_text(TINY_EXP)
    out = str(tmp_path / "report.json")
    rc = main([
        "verify-parity", "-e", str(exp),
        "--ckpt", released["ckpt"],
        "--released-embeddings", released["feat"],
        "--hdf5", tiny_hdf5,
        "--n", "0",
        "--out", out,
        "pipeline.num_workers=0",
    ])
    assert rc == 0
    with open(out) as f:
        report = json.load(f)
    assert report["ok"]


def test_compare_top1_threshold():
    """Unit: the 0.5% criterion trips on a discrepant grid cell."""
    rng = np.random.default_rng(0)
    n, d = 40, 8
    feats = rng.normal(size=(n, d)).astype(np.float32)
    labels = [{"order": "o", "family": "f", "genus": "g",
               "species": f"s{i % 4}"} for i in range(n)]
    ids = [f"id{i}" for i in range(n)]
    base = {"encoded_image_feature": feats, "label_list": labels,
            "processed_id_list": ids}
    ours = (dict(base), dict(base), dict(base))
    # released queries disagree → top-1 shifts far beyond 0.5%
    shuffled = dict(base)
    shuffled["encoded_image_feature"] = feats[::-1].copy()
    theirs = (shuffled, dict(base), dict(base))
    rep = compare_top1(ours, theirs, top1_threshold=0.005)
    assert not rep["ok"] and rep["max_abs_delta"] > 0.005
    rep_same = compare_top1(ours, ours, top1_threshold=0.005)
    assert rep_same["ok"] and rep_same["max_abs_delta"] == 0.0


def test_positional_alignment_with_n_slice(released, tiny_hdf5, tiny_cfg, tmp_path):
    """Bare released HDF5 (no sidecars) + --n slice: the released matrices
    are truncated to the borrowed label count and the stacked all_key
    gallery is rebuilt block-wise, so the top-1 compare still runs."""
    import shutil

    bare_dir = tmp_path / "bare_n"
    bare_dir.mkdir()
    bare = str(bare_dir / "extracted_feature_from_test_split.hdf5")
    shutil.copy(released["feat"], bare)
    report = verify_parity(tiny_cfg, ckpt=released["ckpt"],
                           released_embeddings=bare, hdf5=tiny_hdf5,
                           n=7, progress=False)
    assert report["legs"]["reextract"]["n_seen"] == 7
    cos = report["legs"]["embedding_cosine"]
    assert cos["splits"]["seen"]["alignment"] == "positional"
    assert cos["splits"]["seen"]["aligned_rows"] == 7
    assert cos["ok"], format_report(report)
    top1 = report["legs"]["species_top1"]
    assert top1["rows"], "grid cells must still be comparable"


def test_labels_only_sidecar(released, tiny_cfg, tmp_path):
    """Leg D must use a labels sidecar even when processed_id is absent."""
    import shutil

    d = tmp_path / "labels_only"
    d.mkdir()
    shutil.copy(released["feat"], d / "extracted_feature_from_test_split.hdf5")
    shutil.copy(released["labels"], d / "labels_test.json")  # NO ids file
    report = verify_parity(
        tiny_cfg,
        released_embeddings=str(d / "extracted_feature_from_test_split.hdf5"),
        progress=False)
    rep = report["legs"]["released_eval"]
    assert rep["ok"] and rep["species_top1"], rep


def test_released_smaller_than_ours(released, tiny_hdf5, tiny_cfg, tmp_path):
    """Bare released HDF5 with FEWER rows than the re-extraction: both sides
    truncate to the common head instead of crashing the metric shapes."""
    import h5py
    import shutil

    d = tmp_path / "small_rel"
    d.mkdir()
    small = str(d / "extracted_feature_from_test_split.hdf5")
    shutil.copy(released["feat"], small)
    with h5py.File(small, "r+") as f:
        for grp in ("seen", "unseen", "key"):
            for t in list(f[grp]):
                data = f[grp][t][:8] if f[grp][t].ndim == 2 else f[grp][t][:]
                del f[grp][t]
                f[grp].create_dataset(t, data=data)
    report = verify_parity(tiny_cfg, ckpt=released["ckpt"],
                           released_embeddings=small, hdf5=tiny_hdf5,
                           n=None, progress=False)
    top1 = report["legs"]["species_top1"]
    assert top1["rows"], format_report(report)
    assert report["legs"]["embedding_cosine"]["splits"]["seen"]["aligned_rows"] == 8


def test_eval_released_threshold_passthrough(released, tiny_cfg):
    """--top1-threshold must reach the released-eval leg."""
    base = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                         progress=False)
    expected = {k: min(1.0, v + 0.008)
                for k, v in list(base["legs"]["released_eval"]["species_top1"].items())[:2]}
    tight = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                          expected=expected, top1_threshold=0.005, progress=False)
    loose = verify_parity(tiny_cfg, released_embeddings=released["feat"],
                          expected=expected, top1_threshold=0.02, progress=False)
    assert not tight["legs"]["released_eval"]["ok"]
    assert loose["legs"]["released_eval"]["ok"]


def test_tokenizer_report_accepts_bytes(tmp_path):
    """HDF5 barcodes are numpy bytes — the tokenizer leg must decode them."""
    tok_json = _build_fixture_tokenizer_json(str(tmp_path / "tok.json"))
    rng = np.random.default_rng(2)
    barcodes = [np.bytes_("".join(rng.choice(list("ACGT"), 660)).encode())
                for _ in range(4)]
    rep = tokenizer_report(tok_json, barcodes, k=5, stride=5, max_bp=660)
    assert rep["ok"] and rep["id_match_frac"] == 1.0
