import os

import pytest
import yaml

from clibd_tpu.config import GlobalConfig, load_config, save_config, set_by_path


def test_defaults():
    cfg = GlobalConfig()
    assert cfg.model_config.output_dim == 768
    assert cfg.model_config.dna.seq_len == 133
    assert cfg.model_config.enabled_modalities == ("image", "dna", "language")
    assert abs(cfg.model_config.init_logit_scale - 2.65926) < 1e-4


def test_yaml_roundtrip(tmp_path):
    cfg = GlobalConfig()
    cfg.model_config.batch_size = 123
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)
    with open(path) as f:
        data = yaml.safe_load(f)
    assert data["model_config"]["batch_size"] == 123


def test_overrides(tmp_path):
    exp = tmp_path / "exp.yaml"
    exp.write_text("batch_size: 64\nepochs: 2\ndisable_lora: true\n")
    cfg = load_config(experiment=str(exp), overrides=["model_config.output_dim=512", "debug_flag=true"])
    assert cfg.model_config.batch_size == 64
    assert cfg.model_config.disable_lora is True
    assert cfg.model_config.output_dim == 512
    assert cfg.debug_flag is True


def test_unknown_key_rejected(tmp_path):
    exp = tmp_path / "exp.yaml"
    exp.write_text("batch_sizee: 64\n")
    with pytest.raises(KeyError):
        load_config(experiment=str(exp))
    with pytest.raises(KeyError):
        set_by_path(GlobalConfig(), "model_config.nope", 1)


def test_interpolation(tmp_path):
    gy = tmp_path / "global.yaml"
    gy.write_text("project_root_path: /x\ndata_dir: ${project_root_path}/data\n")
    cfg = load_config(global_yaml=str(gy))
    assert cfg.data_dir == "/x/data"


def test_bundled_configs_load():
    from clibd_tpu.config import available_configs

    for name in available_configs():
        cfg = load_config(experiment=name)
        assert cfg.model_config.output_dim > 0
