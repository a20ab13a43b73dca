"""DNACNN, wrappers, and INSECT-trainer integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dnacnn(rng):
    from clibd_tpu.models.cnn import dnacnn_apply, init_dnacnn_params, one_hot_dna

    L = 150
    tokens = jnp.asarray(rng.integers(0, 4, (2, L)))
    x = one_hot_dna(tokens)
    assert x.shape == (2, L, 4, 1)
    # dim after 3 conv+pool stages: H: 150-2=148 ->49; 49-2=47->15; 15-2=13->4
    # W stays 4; channels 16 -> flat = 4*4*16 = 256
    params = init_dnacnn_params(jax.random.PRNGKey(0), in_feature=1, dim=256)
    out = dnacnn_apply(params, x)
    assert out.shape == (2, 512)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_encoder_with_extra_layer(rng):
    from clibd_tpu.models.wrappers import encoder_with_extra_layer, init_extra_layer

    def encode(params, x):
        return x @ params["w"]

    apply = encoder_with_extra_layer(encode)
    params = {
        "encoder": {"w": jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))},
        "head": init_extra_layer(jax.random.PRNGKey(0), 16, 5),
    }
    x = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
    logits = apply(params, x, compute_dtype=jnp.float32)
    assert logits.shape == (3, 5)
    feats = apply(params, x, return_features=True)
    assert feats.shape == (3, 16)


@pytest.mark.slow
def test_trainer_with_insect_loaders(tmp_path, rng):
    """Contrastive fine-tune on INSECT via the generic Trainer (reference
    train_cl.py:166-169 INSECT branch)."""
    import json

    import h5py
    import scipy.io as sio

    from clibd_tpu.config.schema import BertConfig, GlobalConfig, ViTConfig
    from clibd_tpu.data.insect import INSECTDataset, INSECTLoader
    from clibd_tpu.data.pipeline import BatchSpec
    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import create_mesh
    from tests.fixtures import random_jpeg_bytes

    # --- INSECT fixture
    n = 16
    ids = np.array([[f"im{i}"] for i in range(n)], dtype=object)
    barcodes = np.array([[("ACGT" * 40)] for i in range(n)], dtype=object)
    species = np.array([[f"sp{i % 4}"] for i in range(n)], dtype=object)
    sio.savemat(str(tmp_path / "res101.mat"), {
        "ids": ids, "nucleotides": barcodes, "species": species,
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
    s2o = {f"sp{i}": {"order": f"o{i%2}", "family": f"f{i}", "genus": f"g{i}"} for i in range(4)}
    with open(tmp_path / "s2o.json", "w") as f:
        json.dump(s2o, f)

    g = GlobalConfig()
    g.save_ckpt = False
    cfg = g.model_config
    cfg.dataset = "INSECT"
    cfg.batch_size = 4
    cfg.epochs = 1
    cfg.evaluation_period = 1
    cfg.output_dim = 8
    cfg.language.enable = False
    cfg.image.vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                              num_layers=1, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)

    def make_ds(split):
        return INSECTDataset(
            str(tmp_path / "att_splits.mat"), str(tmp_path / "res101.mat"),
            str(tmp_path / "images.hdf5"), str(tmp_path / "s2o.json"), split=split,
        )

    train_spec = BatchSpec(batch_size=4, train=True, with_language=False)
    eval_spec = BatchSpec(batch_size=4, train=False, with_language=False)
    train_loader = INSECTLoader(make_ds("trainval_loc"), train_spec)

    split_map = {"keys": "trainval_loc", "seen": "test_seen_loc", "unseen": "test_seen_loc"}

    def eval_factory(split, train):
        return INSECTLoader(make_ds(split), eval_spec)

    trainer = Trainer(
        g, hdf5_path="", output_dir=str(tmp_path / "out"),
        eval_splits={"keys": "trainval_loc", "seen": "test_seen_loc", "unseen": "test_seen_loc"},
        mesh=create_mesh(jax.devices()[:2]),
        train_loader=train_loader,
        eval_loader_factory=eval_factory,
    )
    hist = trainer.fit()
    trainer.close()
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])
    assert len(hist["overall_acc"]) == 1
