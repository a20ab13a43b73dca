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
    assert "for_bioscan_1m/final_experiments/image_dna_text_seed_42.yaml" in out


@pytest.mark.parametrize("cmd", [
    "train", "eval", "extract", "simclr", "create-splits", "build-hdf5",
    "bzsl-extract", "extract-single", "serve", "doctor", "finetune",
    "method-nn", "zeroshot", "flatten-csv", "plot-embeddings",
    "fetch-taxonomy", "stats-summary", "compare-experiments",
    "confusion-matrices", "attention-maps", "subset-hdf5",
    "generate-split-csv", "failure-cases", "verify-parity", "configs",
    "bench"])
def test_cli_every_subcommand_parses_help(cmd):
    """Wiring smoke over EVERY registered subcommand: `clibd <cmd> --help`
    must parse and exit 0.  Catches dispatcher/parser drift of the kind the
    round-4 cli/ package split introduced (cmd_bench's stale relative
    path) at the argparse layer for all 26 commands."""
    with pytest.raises(SystemExit) as e:
        main([cmd, "--help"])
    assert e.value.code == 0


def test_cli_stats_summary_body(tiny_hdf5, tmp_path, capsys):
    """Drive cmd_stats_summary through the dispatcher (the engine function
    is covered in test_analysis_tail; this pins the parser→body wiring)."""
    assert main(["stats-summary", "--hdf5", tiny_hdf5,
                 "--out", str(tmp_path / "stats")]) == 0
    out = capsys.readouterr().out
    assert "csv" in out


def test_cli_confusion_matrices_body(tmp_path, capsys):
    """Drive cmd_confusion_matrices end-to-end from a pred_dict JSON."""
    n = 30
    gt = [{lv: f"{lv}{i % 3}" for lv in ("order", "family", "genus", "species")}
          for i in range(n)]
    preds = [{lv: [f"{lv}{(i + (1 if i % 4 == 0 else 0)) % 3}"]
              for lv in ("order", "family", "genus", "species")} for i in range(n)]
    pred_json = tmp_path / "pred_dict_test.json"
    pred_json.write_text(json.dumps({
        "seen_gt_label": gt,
        "unseen_gt_label": [],
        "encoded_image_feature": {"encoded_image_feature": {
            "curr_seen_pred_list": preds, "curr_unseen_pred_list": []}},
    }))
    assert main(["confusion-matrices", "--pred-json", str(pred_json),
                 "--out", str(tmp_path / "cmx"), "--top-n", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(os.path.getsize(p) > 0 for p in out)


def test_cli_compare_experiments_body(tmp_path, capsys):
    """Drive cmd_compare_experiments from accuracy.json files on disk (the
    engine functions are covered in test_analysis_builders; this pins the
    parser→body wiring and the JSON-stringified k-key path)."""
    acc = {
        "encoded_image_feature": {
            "encoded_image_feature": {
                "seen": {"micro_acc": {1: {"order": 0.9, "family": 0.8,
                                           "genus": 0.7, "species": 0.6}},
                         "macro_acc": {1: {"order": 0.85, "family": 0.75,
                                           "genus": 0.65, "species": 0.55}}},
                "unseen": {"micro_acc": {1: {"order": 0.5, "family": 0.4,
                                             "genus": 0.3, "species": 0.2}},
                           "macro_acc": {1: {"order": 0.45, "family": 0.35,
                                             "genus": 0.25, "species": 0.15}}},
            }
        }
    }
    pa = tmp_path / "a.json"
    pb = tmp_path / "b.json"
    pa.write_text(json.dumps(acc))
    pb.write_text(json.dumps(acc))
    assert main(["compare-experiments", f"expA={pa}", f"expB={pb}",
                 "--out", str(tmp_path / "cmp"), "--poster"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(os.path.getsize(p) > 0 for p in out)


def test_cli_plot_embeddings_body(tiny_exp_yaml, tmp_path, capsys):
    """Drive cmd_plot_embeddings from a cached-extraction-shaped HDF5 +
    labels JSON (reference inference_and_eval.py:98-220 cache layout)."""
    rng = np.random.default_rng(0)
    n = 60
    feats = tmp_path / "extracted_feature_from_test_split.hdf5"
    with h5py.File(feats, "w") as f:
        g = f.create_group("key")
        emb = rng.standard_normal((n, 16)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        g.create_dataset("encoded_image_feature", data=emb)
        g.create_dataset("encoded_dna_feature", data=emb)
    labels = tmp_path / "labels_test.json"
    labels.write_text(json.dumps({"key_gt_dict": [
        {"order": f"o{i % 3}", "family": f"f{i % 4}", "genus": f"g{i % 5}",
         "species": f"s{i % 6}"} for i in range(n)]}))
    assert main(["plot-embeddings", "-e", tiny_exp_yaml,
                 "--features", str(feats), "--labels", str(labels),
                 "--group", "key", "--out", str(tmp_path / "plots")]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(os.path.getsize(p) > 0 for p in out)


def test_cli_bzsl_extract_body(tiny_exp_yaml, tmp_path, capsys, rng):
    """Drive cmd_bzsl_extract end-to-end over a tiny INSECT fixture:
    .mat metadata + JPEG HDF5 → extraction → the two BZSL CSVs at the
    reference's folder layout (scripts/BZSL/extract_feature_for_insect_
    dataset.py)."""
    import scipy.io as sio

    from tests.fixtures import random_jpeg_bytes

    n = 12
    ids = np.array([[f"im{i}"] for i in range(n)], dtype=object)
    barcodes = np.array([[("ACGT" * 30)[: 100 + i]] for i in range(n)], dtype=object)
    species = np.array([[f"sp{i % 3}"] for i in range(n)], dtype=object)
    labels = (np.arange(n) % 3 + 1).reshape(-1, 1)
    sio.savemat(str(tmp_path / "res101.mat"), {
        "ids": ids, "nucleotides": barcodes, "species": species, "labels": labels,
    })
    sio.savemat(str(tmp_path / "att_splits.mat"), {
        "trainval_loc": np.arange(1, 9).reshape(1, -1),
        "test_seen_loc": np.arange(9, 11).reshape(1, -1),
        "test_unseen_loc": np.arange(11, n + 1).reshape(1, -1),
    })
    with h5py.File(str(tmp_path / "images.hdf5"), "w") as f:
        g = f.create_group("images")
        for i in range(n):
            g.create_dataset(
                f"im{i}", data=np.frombuffer(random_jpeg_bytes(rng), dtype=np.uint8))
    s2o = {f"sp{i}": {"order": f"o{i % 2}", "family": f"f{i}", "genus": f"g{i}"}
           for i in range(3)}
    (tmp_path / "s2o.json").write_text(json.dumps(s2o))

    assert main([
        "bzsl-extract", "-e", tiny_exp_yaml, "--batch-size", "6",
        f"project_root_path={tmp_path}",
        f"insect_data.path_to_att_splits_mat={tmp_path / 'att_splits.mat'}",
        f"insect_data.path_to_res_101_mat={tmp_path / 'res101.mat'}",
        f"insect_data.path_to_image_hdf5={tmp_path / 'images.hdf5'}",
        f"insect_data.species_to_other={tmp_path / 's2o.json'}",
    ]) == 0
    out = capsys.readouterr().out
    csvs = [ln for ln in out.strip().splitlines() if ln.endswith(".csv")]
    assert len(csvs) == 2
    # reference layout: dna CSV = per-class mean embeddings [dim, n_classes],
    # image CSV = per-sample embeddings [dim, n] (both transposed)
    dna = np.loadtxt(csvs[0], delimiter=",")
    img = np.loadtxt(csvs[1], delimiter=",")
    assert dna.shape == (16, 3)
    assert img.shape == (16, n)
    assert np.isfinite(dna).all() and np.isfinite(img).all()


def test_cli_fetch_taxonomy_requires_species_source(tmp_path, capsys):
    """cmd_fetch_taxonomy without --species/--res101-mat must return 2 with
    a usage hint (the NCBI fetch itself is network-gated in this env)."""
    assert main(["fetch-taxonomy", "--out", str(tmp_path / "t.json"),
                 "--email", "a@b.c"]) == 2
    assert "--species" in capsys.readouterr().err


def test_cli_bench_resolves_repo_root_bench_py():
    """Regression (round-4 cli/ package split): cmd_bench's relative path
    must reach the repo-root bench.py, not clibd_tpu/bench.py — the wrong
    path made `clibd bench` refuse with 'requires a repository checkout'
    even inside one.  Pin the resolution without running the bench."""
    import clibd_tpu.cli.ops_cmds as ops

    path = os.path.normpath(os.path.join(
        os.path.dirname(ops.__file__), "..", "..", "bench.py"))
    assert os.path.exists(path), path
    src = open(ops.__file__).read()
    assert '"..", "..", "bench.py"' in src


def test_resolve_params_finds_train_output(tmp_path):
    """eval-after-train: _resolve_params must search the directory cmd_train
    saves to (model_output_dir/<name>) before the canonical published tree
    (regression: it used to skip it and silently fall through to fresh init)."""
    import jax

    from clibd_tpu.cli import _resolve_params
    from clibd_tpu.config.schema import BertConfig, GlobalConfig, ViTConfig
    from clibd_tpu.engine.checkpoint import save_train_state
    from clibd_tpu.models import init_clibd_params

    cfg = GlobalConfig()
    cfg.model_output_dir = str(tmp_path / "out")
    cfg.project_root_path = str(tmp_path / "nowhere")
    mc = cfg.model_config
    mc.model_output_name = "myrun"
    mc.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                             num_layers=1, num_heads=4, mlp_dim=64)
    mc.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                             num_heads=4, intermediate_size=64,
                             max_position_embeddings=140, with_mlm_head=True)
    mc.language.enable = False
    mc.output_dim = 8

    trained = init_clibd_params(jax.random.PRNGKey(42), mc)
    save_train_state(os.path.join(cfg.model_output_dir, "myrun", "best"),
                     jax.tree.map(np.asarray, trained))
    loaded = _resolve_params(cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded["image_encoder"]["blocks"]["qkv_w"]),
        np.asarray(trained["image_encoder"]["blocks"]["qkv_w"]))


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


def test_cli_create_splits_and_build(tmp_path, rng, monkeypatch):
    import pandas as pd

    from tests.fixtures import random_jpeg_bytes

    # metadata with images on disk
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(40):
        name = f"i{i}.jpg"
        (img_dir / name).write_bytes(random_jpeg_bytes(rng))
        rows.append({
            "sampleid": f"s{i}", "uri": f"u{i%5}", "image_file": name,
            "barcode": "ACGT" * 30, "order": "Diptera", "family": "F",
            "genus": "G", "species": f"sp{i%3}",
        })
    md_path = tmp_path / "meta.tsv"
    pd.DataFrame(rows).to_csv(md_path, sep="\t", index=False)

    splits_path = tmp_path / "splits.tsv"
    rc = main(["create-splits", "--metadata", str(md_path), "--out", str(splits_path),
               "--min-species-size", "5", "--seed", "0"])
    assert rc == 0
    out = tmp_path / "built.hdf5"
    rc = main(["build-hdf5", "--metadata", str(md_path), "--splits", str(splits_path),
               "--image-dir", str(img_dir), "--out", str(out)])
    assert rc == 0
    with h5py.File(out) as f:
        assert "train_seen" in f


def test_cli_flatten_csv(tmp_path):
    import csv as _csv

    rows = [
        ["learning_strategy", "Alignment", "DNA_encoder", "Image_encoder", "Language_encoder",
         "Epoch", "Latent_space_dim", "Query", "Key", "Metric",
         "Seen_Order", "Seen_Family", "Seen_Genus", "Seen_Species",
         "Unseen_Order", "Unseen_Family", "Unseen_Genus", "Unseen_Species"],
        ["LoRA", "I,D", "bb", "vit", "bert", "50", "768", "Image", "DNA",
         "Micro_Top-1_acc", "0.9", "0.8", "0.7", "0.6", "0.5", "0.4", "0.3", "0.2"],
    ]
    src = tmp_path / "results.csv"
    with open(src, "w", newline="") as f:
        _csv.writer(f).writerows(rows)
    rc = main(["flatten-csv", "--input", str(src), "--out", str(tmp_path / "flat.csv")])
    assert rc == 0
    assert (tmp_path / "flat.csv").exists()


def test_cli_extract_single(tiny_hdf5, tiny_exp_yaml, tmp_path, rng, monkeypatch, capsys):
    from tests.fixtures import random_jpeg_bytes

    monkeypatch.chdir(tmp_path)
    img_path = tmp_path / "one.jpg"
    img_path.write_bytes(random_jpeg_bytes(rng))
    out_path = tmp_path / "single.json"
    rc = main([
        "extract-single", "-e", tiny_exp_yaml,
        "--image", str(img_path), "--barcode", "ACGT" * 50,
        "--out", str(out_path),
    ])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    assert len(result["image_embedding"]) == 16
    assert len(result["dna_embedding"]) == 16


def test_cli_eval_with_plots_and_retrieval(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "eval", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "project_root_path=" + str(tmp_path),
        "pipeline.num_workers=0",
        "inference_and_eval_setting.plot_embeddings=true",
        "inference_and_eval_setting.retrieve_images=true",
        "inference_and_eval_setting.retrieve_settings.num_queries=2",
        "inference_and_eval_setting.embeddings_filters={}",
    ])
    assert rc == 0
    folder = tmp_path / "extracted_embedding" / "bioscan_1m" / "tiny_test"
    import glob as _glob

    pngs = _glob.glob(str(folder / "retrieval" / "retrieved_images_*.png"))
    assert pngs, "no retrieval grid figures written"
    assert (folder / "retrieval" / "retrieved_images.json").exists()
    assert (folder / "plots" / "embedding_order.png").exists()


def test_cli_method_nn(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "method-nn", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "pipeline.num_workers=0",
        "inference_and_eval_setting.eval_on=test",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert 0.0 <= result["best_threshold"] <= 1.0
    assert 0.0 <= result["seen_species_top1"] <= 1.0


def test_cli_method_linear(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "method-nn", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "--linear", "--probe-steps", "20",
        "pipeline.num_workers=0",
        "inference_and_eval_setting.eval_on=test",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert 0.0 <= result["best_threshold"] <= 1.0
    assert 0.0 <= result["seen_species_top1"] <= 1.0
    assert 0.0 <= result["unseen_species_top1"] <= 1.0


def test_cli_method_linear_full_probe(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch, capsys):
    """--probe full: side A is the fully fine-tuned image classifier
    (reference method_linear.py:458-516)."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "method-nn", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
        "--linear", "--probe", "full", "--probe-epochs", "1",
        "pipeline.num_workers=0",
        "inference_and_eval_setting.eval_on=val",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= result["best_threshold"] <= 1.0
    assert 0.0 <= result["seen_routing_top1"] <= 1.0


def test_cli_doctor(tiny_hdf5, tiny_exp_yaml, tmp_path, monkeypatch, capsys):
    """doctor: device probe ok on the CPU test backend, native-decoder leg
    present, experiment leg reports config/hdf5/checkpoint resolution.
    (The unreachable branch was driven for real against a live tunnel
    outage — it prints status=unreachable and rc=1 without hanging.)"""
    monkeypatch.chdir(tmp_path)
    rc = main(["doctor", "-e", tiny_exp_yaml, "--hdf5", tiny_hdf5,
               "--timeout", "120",
               f"model_output_dir={tmp_path}/out",
               f"project_root_path={tmp_path}"])
    out = capsys.readouterr().out
    report = json.loads(out[out.index("{"):])
    assert report["device"]["status"] == "ok"
    assert report["device"]["device_count"] >= 1
    assert report["native_decoder"]["status"] in ("ok", "unavailable")
    assert report["experiment"]["config"] == "ok"
    assert report["experiment"]["hdf5"]["exists"] is True
    # tiny yaml has load_ckpt: false → fresh init expected, not a failure
    assert report["experiment"]["checkpoint"]["would_fresh_init"] is True
    assert report["status"] == "ok" and rc == 0

    # a missing dataset path must flip hdf5.exists (still rc 0: existence
    # is reported, not judged — load_ckpt/fresh-init policy is the model's)
    rc2 = main(["doctor", "-e", tiny_exp_yaml, "--hdf5", "/nope/missing.h5",
                "--timeout", "120",
                f"model_output_dir={tmp_path}/out",
                f"project_root_path={tmp_path}"])
    out2 = capsys.readouterr().out
    report2 = json.loads(out2[out2.index("{"):])
    assert report2["experiment"]["hdf5"]["exists"] is False


def test_package_import_initializes_no_jax_backend():
    """Importing clibd_tpu (engine + cli) must not initialize a JAX backend:
    a module-level jnp constant would make every CLI start pay device init —
    and hang outright during a tunnel outage (ops/color.py regression).
    Subprocess so other tests' backend state can't mask it."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import clibd_tpu.engine, clibd_tpu.cli\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
    ) % (str(__import__('pathlib').Path(__file__).resolve().parents[1]),)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr


def test_compile_cache_opt_in(tmp_path, monkeypatch):
    """maybe_enable_compile_cache: no-op without configuration; env var and
    explicit path (`serve --compile-cache`) both set the persistent-cache
    config and create the directory.  Pure process-local config — restored
    after the test so later compiles don't write to the tmpdir."""
    import jax

    from clibd_tpu.utils.compile_cache import maybe_enable_compile_cache

    orig_dir = jax.config.jax_compilation_cache_dir
    orig_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.delenv("CLIBD_COMPILE_CACHE", raising=False)
        assert maybe_enable_compile_cache() is None
        assert jax.config.jax_compilation_cache_dir == orig_dir

        env_dir = tmp_path / "envcache"
        monkeypatch.setenv("CLIBD_COMPILE_CACHE", str(env_dir))
        assert maybe_enable_compile_cache() == str(env_dir)
        assert env_dir.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(env_dir)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5

        # explicit path wins over the env var
        flag_dir = tmp_path / "flagcache"
        assert maybe_enable_compile_cache(str(flag_dir)) == str(flag_dir)
        assert jax.config.jax_compilation_cache_dir == str(flag_dir)
    finally:
        jax.config.update("jax_compilation_cache_dir", orig_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", orig_min)
