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


def test_interpolation_guards_and_coercion(tmp_path):
    """Self-referential ${...} must error (not hang); unterminated ${ gives a
    clear error; int fields accept integral floats (`epochs=20.0`) and reject
    fractional ones; experiment YAMLs may reference their own keys."""
    exp = tmp_path / "exp.yaml"
    exp.write_text("model_output_name: m\nckpt_path: out/${model_output_name}\n")
    cfg = load_config(experiment=str(exp))
    assert cfg.model_config.ckpt_path == "out/m"

    bad = tmp_path / "bad.yaml"
    bad.write_text("ckpt_path: ${ckpt_path}/x\n")
    with pytest.raises(ValueError):
        load_config(experiment=str(bad))

    cfg = load_config(overrides=["model_config.epochs=20.0"])
    assert cfg.model_config.epochs == 20 and isinstance(cfg.model_config.epochs, int)
    with pytest.raises(ValueError):
        set_by_path(GlobalConfig(), "model_config.epochs", "3.5")


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


def test_every_preset_builds_a_model():
    """Every bundled experiment YAML must load AND build a model through the
    factory (towers shrunk to 1 layer so 40+ presets stay fast; the preset's
    flags — modalities, backbone, LoRA, loss setup — are exercised as-is)."""
    import jax

    from clibd_tpu.config import available_configs
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import trainable_mask

    names = available_configs()
    # 56 reference model_config YAMLs mirrored 1:1 + 2 deliberate extras
    # (bin_positive_pairs, the eval-only no_alignment_baseline)
    assert len(names) >= 58, f"preset matrix shrank: {len(names)}"
    executed_one = False
    for name in names:
        cfg = load_config(experiment=name).model_config
        cfg.image.vit.num_layers = 1
        cfg.image.vit.hidden_size = 32
        cfg.image.vit.num_heads = 4
        cfg.image.vit.mlp_dim = 64
        cfg.dna.bert.num_layers = 1
        cfg.dna.bert.hidden_size = 32
        cfg.dna.bert.num_heads = 4
        cfg.dna.bert.intermediate_size = 64
        cfg.language.bert.num_layers = 1
        cfg.language.bert.hidden_size = 32
        cfg.language.bert.num_heads = 4
        cfg.language.bert.intermediate_size = 64
        cfg.clip.vision_layers = 1
        cfg.clip.text_layers = 1
        cfg.image.simclr_ckpt_path = ""  # no ckpt files in CI
        # eval_shape traces the full factory (every flag path, every shape
        # contract) without compiling/executing 40+ tiny models — the preset
        # sweep drops from ~59 s to a few seconds on this 1-CPU host.  One
        # representative preset keeps the real execution path covered
        # (init-time NaNs / value-dependent failures don't surface in traces).
        if not executed_one:
            params = init_clibd_params(jax.random.PRNGKey(0), cfg)
            executed_one = True
        else:
            params = jax.eval_shape(
                lambda key: init_clibd_params(key, cfg), jax.random.PRNGKey(0))
        assert "logit_scale" in params, name
        mask = trainable_mask(params, cfg)
        assert isinstance(mask, dict), name
        assert cfg.dna.seq_len > 0, name
