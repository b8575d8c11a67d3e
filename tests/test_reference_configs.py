"""The reference's OWN YAML config files load unchanged.

A migrating user should be able to point the CLI at the exact files the
reference ships (`/root/reference/config/*.yaml`) — every key either maps
into the tree (legacy-flat names, `utils/config.py:_LEGACY_MAP`) or is an
accepted-and-noted torch-runtime key (`_IGNORED_KEYS`). Unknown keys
still KeyError (typo protection)."""

import os

import pytest

from itsd_tpu.utils import load_config
from itsd_tpu.utils.config import apply_overrides

REF = "/root/reference/config"


def _have(name):
    return os.path.isfile(os.path.join(REF, name))


@pytest.mark.skipif(not _have("config.yaml"), reason="reference absent")
def test_reference_train_config_loads():
    cfg = load_config(os.path.join(REF, "config.yaml"))
    assert cfg.state == "train"
    assert cfg.model.channel == 128
    assert cfg.model.channel_mult == (1, 2, 3, 4)
    assert cfg.model.attn == (2,)
    assert cfg.diffusion.T == 1000
    assert cfg.diffusion.inference_T is None
    assert cfg.data.img_size == 256
    assert cfg.train.batch_size == 1024
    assert cfg.train.eval_metric_interval == 20
    assert cfg.train.use_val_for_eval is True
    assert cfg.train.fid_num_real_samples == 5000
    assert cfg.data.root.endswith("imagenet")  # imagenet_root mapped
    assert cfg.data.train_subset_ratio == 0.1
    assert cfg.sampled_noisy_img_name == "NoisyNoGuidenceImgs.png"
    assert cfg.sampled_img_name == "SampledNoGuidenceImgs.png"
    assert cfg.test_load_weight == "ckpt_199_.pt"


@pytest.mark.skipif(not _have("fine_tune_config.yaml"),
                    reason="reference absent")
def test_reference_fine_tune_config_loads():
    cfg = load_config(os.path.join(REF, "fine_tune_config.yaml"))
    assert cfg.diffusion.T == 2000
    # fine_tune_epochs overrides epoch (same file, later key)
    assert cfg.train.epoch == 5
    assert cfg.train.fine_tune_lr == 1e-5
    assert cfg.train.freeze_except_time_embedding is True


@pytest.mark.skipif(not _have("inference_config.yaml"),
                    reason="reference absent")
def test_reference_inference_config_loads():
    cfg = load_config(os.path.join(REF, "inference_config.yaml"))
    assert cfg.diffusion.T == 3000
    assert cfg.test_load_weight.endswith("ckpt_0_.pt")  # checkpoint_path
    assert cfg.train.time_embedding_strategy == "interpolate"
    assert cfg.train.freeze_except_time_embedding is False
    assert cfg.train.metric_interval == 30
    assert cfg.sampled_dir.endswith("inference_results")
    assert cfg.nrow == 8


def test_ignored_keys_noted_not_fatal(capsys):
    cfg = load_config(overrides=["use_multi_gpu=true", "num_workers=4",
                                 "T=50"])
    assert cfg.diffusion.T == 50
    err = capsys.readouterr().err
    assert "use_multi_gpu" in err and "num_workers" in err


def test_unknown_key_still_raises():
    with pytest.raises(KeyError, match="no_such_key"):
        apply_overrides(load_config(), ["no_such_key=1"])
