"""End-to-end slice: HDF5 fixture → tri-encoder forward (8-device CPU mesh)
→ embedding extraction → cache HDF5 schema → retrieval eval grid → reports."""

import json
import os

import h5py
import numpy as np
import pytest

import jax

from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
from clibd_tpu.engine.evaluate import (
    compute_overall_acc,
    format_results,
    inference_and_eval,
    save_results,
)
from clibd_tpu.engine.extract import (
    extract_split,
    load_extracted_features,
    save_embedding_export,
    save_extracted_features,
    save_labels_and_ids,
)
from clibd_tpu.models import init_clibd_params
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
    return cfg


@pytest.fixture(scope="module")
def extracted(tiny_hdf5_module, tiny_cfg):
    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    mesh = create_mesh(jax.devices()[:4])
    spec = BatchSpec(batch_size=6, train=False)

    def run(split, for_key=False):
        loader = BioscanLoader(tiny_hdf5_module, split, spec, num_workers=0)
        out = extract_split(params, tiny_cfg, loader, for_key_set=for_key, mesh=mesh)
        loader.close()
        return out

    keys_dict = run("all_keys", for_key=True)
    seen_dict = run("test_seen")
    unseen_dict = run("test_unseen")
    return keys_dict, seen_dict, unseen_dict


@pytest.fixture(scope="module")
def tiny_hdf5_module(tmp_path_factory):
    from tests.fixtures import make_tiny_bioscan_hdf5

    path = tmp_path_factory.mktemp("e2e") / "tiny.hdf5"
    make_tiny_bioscan_hdf5(str(path))
    return str(path)


def test_extract_shapes_and_norms(extracted):
    keys_dict, seen_dict, unseen_dict = extracted
    for d in (keys_dict, seen_dict, unseen_dict):
        assert d["encoded_image_feature"].shape == (12, 16)
        assert d["encoded_dna_feature"].shape == (12, 16)
        assert d["encoded_language_feature"].shape == (12, 16)
        np.testing.assert_allclose(
            np.linalg.norm(d["encoded_image_feature"], axis=1), 1.0, atol=1e-4
        )
        assert d["averaged_feature"].shape == (12, 16)
        assert d["concatenated_feature"].shape == (12, 32)
        assert len(d["label_list"]) == 12
        assert len(d["processed_id_list"]) == 12
    assert keys_dict["all_key_features"].shape == (36, 16)
    assert len(keys_dict["all_key_features_label"]) == 36
    assert seen_dict["all_key_features"] is None


def test_extract_matches_unsharded(extracted, tiny_hdf5_module, tiny_cfg):
    """Mesh-sharded extraction == single-device extraction (same params)."""
    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    mesh1 = create_mesh(jax.devices()[:1])
    spec = BatchSpec(batch_size=5, train=False)  # ragged: tests padding path
    loader = BioscanLoader(tiny_hdf5_module, "test_seen", spec, num_workers=0)
    single = extract_split(params, tiny_cfg, loader, mesh=mesh1)
    loader.close()
    np.testing.assert_allclose(
        extracted[1]["encoded_image_feature"], single["encoded_image_feature"], atol=2e-3
    )
    np.testing.assert_allclose(
        extracted[1]["encoded_dna_feature"], single["encoded_dna_feature"], atol=2e-3
    )


def test_cache_roundtrip(tmp_path, extracted):
    keys_dict, seen_dict, unseen_dict = extracted
    h5 = str(tmp_path / "extracted_feature_from_test_split.hdf5")
    labels = str(tmp_path / "labels_test.json")
    ids = str(tmp_path / "processed_id_test.json")
    save_extracted_features(h5, seen_dict, unseen_dict, keys_dict)
    save_labels_and_ids(labels, ids, seen_dict, unseen_dict, keys_dict)

    # schema check (reference inference_and_eval.py:637-650)
    with h5py.File(h5, "r") as f:
        assert set(f.keys()) == {"seen", "unseen", "key"}
        assert "encoded_image_feature" in f["seen"]
        assert "all_key_features" in f["key"]
        assert "all_key_features" not in f["seen"]
        assert f["key"]["encoded_dna_feature"].shape == (12, 16)

    s2, u2, k2 = load_extracted_features(h5, labels, ids)
    np.testing.assert_allclose(s2["encoded_image_feature"], seen_dict["encoded_image_feature"])
    assert s2["label_list"] == seen_dict["label_list"]
    assert len(k2["all_key_features_label"]) == 36
    assert k2["processed_id_list"] == keys_dict["processed_id_list"]


def test_eval_grid_and_reports(tmp_path, extracted):
    keys_dict, seen_dict, unseen_dict = extracted
    acc_dict, per_class_acc, pred_dict = inference_and_eval(
        keys_dict, seen_dict, unseen_dict, k_list=[1, 3, 5]
    )
    # all 5 query types x 6 key types present
    assert set(acc_dict.keys()) == {
        "encoded_image_feature", "encoded_dna_feature", "encoded_language_feature",
        "averaged_feature", "concatenated_feature",
    }
    # 16-d image queries match every key type except the 32-d concatenated one
    assert set(acc_dict["encoded_image_feature"].keys()) == {
        "encoded_image_feature", "encoded_dna_feature", "encoded_language_feature",
        "averaged_feature", "all_key_features",
    }
    # concatenated (32-d) only matches concatenated keys
    assert list(acc_dict["concatenated_feature"].keys()) == ["concatenated_feature"]
    e = acc_dict["encoded_image_feature"]["encoded_image_feature"]
    for split in ("seen", "unseen"):
        for t in ("micro_acc", "macro_acc"):
            for k in (1, 3, 5):
                for level in ("order", "family", "genus", "species"):
                    assert 0.0 <= e[split][t][k][level] <= 1.0
    # top-k monotonicity
    assert e["seen"]["micro_acc"][1]["order"] <= e["seen"]["micro_acc"][5]["order"]

    overall = compute_overall_acc(acc_dict)
    assert 0.0 <= overall <= 1.0

    table_str, csv_rows, raw_rows, copy_rows = format_results(acc_dict, [1, 3, 5], alignment="I,D,T")
    assert "Seen Order" in table_str
    assert len(csv_rows) == 1 + len(raw_rows)
    assert csv_rows[0][7] == "Query"
    assert all(len(r) == 8 for r in raw_rows)

    save_results(str(tmp_path / "logs"), acc_dict, csv_rows, raw_rows, config_snapshot={"a": 1})
    assert os.path.exists(tmp_path / "logs" / "accuracy.json")
    assert os.path.exists(tmp_path / "logs" / "results.csv")
    assert os.path.exists(tmp_path / "logs" / "raw.csv")
    with open(tmp_path / "logs" / "accuracy.json") as f:
        loaded = json.load(f)
    assert "encoded_image_feature" in loaded

    # pred_dict payload
    p = pred_dict["encoded_image_feature"]["encoded_dna_feature"]
    assert len(p["curr_seen_pred_list"]) == 12
    assert len(p["curr_seen_pred_list"][0]["species"]) == 5


def test_embedding_export_schema(tmp_path, extracted):
    keys_dict, _, _ = extracted
    path = str(tmp_path / "extracted_features_of_all_keys.hdf5")
    save_embedding_export(path, keys_dict)
    with h5py.File(path, "r") as f:
        assert f["encoded_dna_feature"].shape == (12, 16)
        assert f["order_list"].shape == (12,)
        assert f["file_name"].shape == (12,)


def test_self_retrieval_sanity(tiny_hdf5_module, tiny_cfg):
    """Querying the key set with itself must give ~100% top-1 (self-match)."""
    params = init_clibd_params(jax.random.PRNGKey(1), tiny_cfg)
    mesh = create_mesh(jax.devices()[:2])
    spec = BatchSpec(batch_size=6, train=False)
    loader = BioscanLoader(tiny_hdf5_module, "all_keys", spec, num_workers=0)
    d = extract_split(params, tiny_cfg, loader, for_key_set=False, mesh=mesh)
    loader.close()
    acc_dict, _, _ = inference_and_eval(d, d, d, k_list=[1])
    assert acc_dict["encoded_image_feature"]["encoded_image_feature"]["seen"]["micro_acc"][1]["species"] == 1.0


def test_appendable_embedding_writer(tmp_path, rng):
    import h5py

    from clibd_tpu.engine.extract import AppendableEmbeddingWriter

    path = str(tmp_path / "stream.hdf5")
    w = AppendableEmbeddingWriter(path, feature_dim=8)
    for i in range(3):
        feats = {"encoded_image_feature": rng.standard_normal((4, 8)).astype(np.float32)}
        labels = [{"order": "o", "family": "f", "genus": "g", "species": f"s{i}"}] * 4
        w.append(feats, labels, [f"id{i}_{j}" for j in range(4)])
    w.close()
    with h5py.File(path) as f:
        assert f["encoded_image_feature"].shape == (12, 8)
        assert f["species_list"].shape == (12,)
        assert f["file_name"][0].decode() == "id0_0"


def test_stream_extract_kill_resume_bit_identical(tmp_path, tiny_hdf5_module, tiny_cfg):
    """Streaming export (engine/extract.stream_extract_split — the 5M-scale
    per-batch-append path, reference extract_embedding_for_backend.py) must
    survive a mid-append kill: resume trims the torn tail to a batch boundary
    and continues, producing a file bit-identical to an uninterrupted run
    (VERDICT r4 #7)."""
    from clibd_tpu.engine.extract import stream_extract_split

    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    spec = BatchSpec(batch_size=5, train=False)  # 12 records → 5,5,2 (ragged tail)

    def run(path, **kw):
        loader = BioscanLoader(tiny_hdf5_module, "all_keys", spec, num_workers=0)
        n = stream_extract_split(params, tiny_cfg, loader, path, **kw)
        loader.close()
        return n

    a_path = str(tmp_path / "oneshot.hdf5")
    assert run(a_path) == 12

    # partial run (2 of 3 batches), then a torn append: a SIGKILL between the
    # per-dataset resizes leaves datasets at different lengths
    b_path = str(tmp_path / "killed.hdf5")
    assert run(b_path, max_batches=2) == 10
    with h5py.File(b_path, "r+") as f:
        f["species_list"].resize((7,))
    # resume: consistent prefix 7 → batch boundary 5 → batches 1..2 re-run
    assert run(b_path, resume=True) == 7
    with h5py.File(a_path) as fa, h5py.File(b_path) as fb:
        assert set(fa.keys()) == set(fb.keys())
        for k in fa.keys():
            np.testing.assert_array_equal(fa[k][:], fb[k][:])


def test_simclr_backbone_loading(tmp_path, tiny_cfg):
    from clibd_tpu.engine.checkpoint import save_train_state
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.vit import init_vit_params

    # save a "pretrained" ViT as an npz train state
    pre = init_vit_params(jax.random.PRNGKey(9), tiny_cfg.image.vit, output_dim=tiny_cfg.output_dim)
    d = str(tmp_path / "simclr_best")
    save_train_state(d, jax.tree.map(np.asarray, pre))

    # copy the module-scoped cfg rather than mutating it (a raise between
    # set and reset would leak the ckpt path into sibling tests)
    import dataclasses as _dc

    cfg_simclr = _dc.replace(tiny_cfg, image=_dc.replace(tiny_cfg.image, simclr_ckpt_path=d))
    params = init_clibd_params(jax.random.PRNGKey(0), cfg_simclr)
    fresh = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    # backbone weights come from the pretrained ckpt...
    np.testing.assert_array_equal(
        np.asarray(params["image_encoder"]["blocks"]["qkv_w"]),
        np.asarray(pre["blocks"]["qkv_w"]),
    )
    # ...but differ from the fresh init, while LoRA stays freshly initialized
    assert np.abs(
        np.asarray(params["image_encoder"]["blocks"]["qkv_w"])
        - np.asarray(fresh["image_encoder"]["blocks"]["qkv_w"])
    ).max() > 0
    np.testing.assert_array_equal(
        np.asarray(params["image_encoder"]["lora"]["a_q"]),
        np.asarray(fresh["image_encoder"]["lora"]["a_q"]),
    )


def test_all_key_features_image_dna_only(tiny_hdf5_module, tiny_cfg):
    """An image+DNA model (no language tower) must still get the All-keys
    gallery: concatenation of the PRESENT modalities (VERDICT r1 missing #4;
    superset of the reference's all-three guard, util/util.py:725-731)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg)
    cfg.language = dataclasses.replace(cfg.language, enable=False)
    params = init_clibd_params(jax.random.PRNGKey(1), cfg)
    spec = BatchSpec(batch_size=6, train=False)
    loader = BioscanLoader(tiny_hdf5_module, "all_keys", spec, num_workers=0)
    out = extract_split(params, cfg, loader, for_key_set=True,
                        mesh=create_mesh(jax.devices()[:1]))
    loader.close()
    assert out["encoded_language_feature"] is None
    assert out["all_key_features"].shape == (24, 16)  # image + dna stacked
    assert len(out["all_key_features_label"]) == 24
    np.testing.assert_allclose(
        out["all_key_features"][:12], out["encoded_image_feature"], atol=1e-6)
    np.testing.assert_allclose(
        out["all_key_features"][12:], out["encoded_dna_feature"], atol=1e-6)


def test_shard_map_encode_matches_jit_global(tiny_hdf5_module, tiny_cfg):
    """Multi-device extraction now runs the encoders under shard_map (local
    shapes per device, flash-kernel compatible) — must equal the global-math
    jit path bit-for-bit-ish."""
    from clibd_tpu.engine.extract import make_encode_step
    from clibd_tpu.parallel.mesh import replicate, shard_batch

    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    mesh = create_mesh(jax.devices()[:4])
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((8, 224, 224, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (8, 133)).astype(np.int32),
    }
    p = replicate(mesh, params)
    b = shard_batch(mesh, batch)
    out_sm = make_encode_step(tiny_cfg, mesh=mesh, use_shard_map=True)(p, b)
    out_gl = make_encode_step(tiny_cfg, mesh=mesh, use_shard_map=False)(p, b)
    for k in out_gl:
        np.testing.assert_allclose(np.asarray(out_sm[k]), np.asarray(out_gl[k]),
                                   atol=2e-2, rtol=2e-2)


def test_shard_map_encode_with_flash_kernel(tiny_hdf5_module, tiny_cfg, monkeypatch):
    """The flash Pallas kernel must run inside shard_map on the CPU mesh
    (interpret mode) and agree with the XLA path — the v5e-8 extraction
    configuration."""
    from clibd_tpu.engine.extract import make_encode_step
    from clibd_tpu.models import layers
    from clibd_tpu.parallel.mesh import replicate, shard_batch

    params = init_clibd_params(jax.random.PRNGKey(0), tiny_cfg)
    mesh = create_mesh(jax.devices()[:2])
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.random((4, 224, 224, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (4, 133)).astype(np.int32),
    }
    p = replicate(mesh, params)
    b = shard_batch(mesh, batch)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "xla")
    ref = make_encode_step(tiny_cfg, mesh=mesh, use_shard_map=True)(p, b)
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    out = make_encode_step(tiny_cfg, mesh=mesh, use_shard_map=True)(p, b)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=3e-2, rtol=3e-2)


def test_parity_strict_all_key_features(tiny_hdf5_module, tiny_cfg):
    """cfg.parity_strict restores the reference's all-3-modality guard for
    the stacked All-keys gallery (util/util.py:726-731): an image+DNA model
    emits all_key_features by default (>=2 relaxation) but NOT in strict
    mode."""
    import copy

    cfg2 = copy.deepcopy(tiny_cfg)
    cfg2.language.enable = False
    params = init_clibd_params(jax.random.PRNGKey(2), cfg2)
    mesh = create_mesh(jax.devices()[:2])
    spec = BatchSpec(batch_size=6, train=False, with_language=False)

    def run(strict):
        cfg2.parity_strict = strict
        loader = BioscanLoader(tiny_hdf5_module, "all_keys", spec, num_workers=0)
        out = extract_split(params, cfg2, loader, for_key_set=True, mesh=mesh)
        loader.close()
        return out

    relaxed = run(False)
    assert relaxed["all_key_features"] is not None
    assert relaxed["all_key_features"].shape[0] == 2 * len(relaxed["label_list"])
    strict = run(True)
    assert strict["all_key_features"] is None
