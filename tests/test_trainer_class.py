"""Class-based Trainer facade (the reference's unfinished Trainer intent)."""

import pytest
import numpy as np

from itsd_tpu.train.trainer import Trainer
from itsd_tpu.utils import Config, apply_overrides


def _cfg(tmp_path):
    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0",
        "diffusion.T=8", "train.epoch=1", "train.batch_size=8",
        "train.eval_freq=100", "train.eval_batch_size=4",
    ])
    cfg.save_weight_dir = str(tmp_path / "ckpt")
    cfg.sampled_dir = str(tmp_path / "s")
    cfg.metrics_save_dir = str(tmp_path / "m")
    return cfg


@pytest.mark.slow
def test_trainer_fit_sample_save_load(tmp_path):
    tr = Trainer(_cfg(tmp_path))
    out = tr.fit(max_steps=2)
    assert np.isfinite(out["final_loss"])
    imgs = tr.sample(4)
    assert imgs.shape == (4, 8, 8, 3)
    path = tr.save("ckpt_trainer")
    tr2 = Trainer(_cfg(tmp_path))
    tr2.load("ckpt_trainer")
    imgs2 = tr2.sample(4)
    np.testing.assert_allclose(imgs, imgs2, rtol=1e-5, atol=1e-6)


def test_trainer_search(tmp_path):
    cfg = _cfg(tmp_path)
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=2",
                          "search.verifier=aesthetic"])
    tr = Trainer(cfg)
    tr.fit(max_steps=1)
    res = tr.search()
    assert np.isfinite(res["best_score"])
