"""diffusion.launch_segments: bounded-launch sampling (eval + random search).

A chunk*batch x T=1000 launch of the ch=128 256x256 flagship runs minutes
of device time and the TPU-worker watchdog kills the worker mid-flight
(observed live: experiments/flagship256_search.py, 2026-08-19). The fix
splits the ancestral chain into host-chained launches; these tests pin the
contract that the split is BIT-IDENTICAL to the single-launch program —
the scan's carried PRNG key crosses launch boundaries
(core.sampling.denoise_segment(return_key=True)). The knob moved from
search.launch_segments to diffusion.launch_segments when `eval` grew the
same bounded-launch path; the old dotted key stays a config alias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.cli.runner import build_model, evaluate, run_search
from itsd_tpu.core import denoise_segment, linear_schedule, sample
from itsd_tpu.utils.config import load_config

BASE = [
    "data.dataset=synthetic", "data.img_size=8",
    "model.channel=8", "model.channel_mult=[1]", "model.attn=[]",
    "model.num_res_blocks=1", "diffusion.T=6",
    "search.algorithm=random", "search.n_candidates=4",
    "search.candidate_chunk=2", "search.verifier=self_supervised",
    "train.eval_batch_size=2",
]


def _cfg(extra=()):
    return load_config(None, BASE + list(extra))


def _params(cfg):
    model, _ = build_model(cfg)
    x = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    return model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))


def test_chained_segments_bit_identical_to_sample():
    """Core contract: threading the returned key across denoise_segment
    launches reproduces one `sample` call exactly."""
    sched = linear_schedule(1e-4, 0.02, 10)
    eps_fn = lambda x, t: 0.1 * x
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    key = jax.random.PRNGKey(4)
    ref = sample(sched, eps_fn, x0, key)
    x, k = x0, key
    for hi, lo in [(10, 7), (7, 3), (3, 0)]:
        x, k = denoise_segment(sched, eps_fn, x, k, hi, lo, return_key=True)
    np.testing.assert_array_equal(np.asarray(ref),
                                  np.asarray(jnp.clip(x, -1.0, 1.0)))


def test_run_search_launch_segments_matches_single_launch(tmp_path):
    sd = [f"sampled_dir={tmp_path}"]
    cfg1 = _cfg(sd)
    params = _params(cfg1)
    out1 = run_search(cfg1, params=params)
    out3 = run_search(_cfg(["diffusion.launch_segments=3"] + sd),
                      params=params)
    s1 = np.asarray(out1["result"].history["scores"])
    s3 = np.asarray(out3["result"].history["scores"])
    np.testing.assert_allclose(s1, s3, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out1["best_score"], out3["best_score"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(out1["result"].best_noise),
        np.asarray(out3["result"].best_noise), rtol=1e-6, atol=1e-7)


def test_launch_segments_guard_baseline_rides_segments(tmp_path):
    cfg = _cfg(["diffusion.launch_segments=3", "search.guard_proxy=true",
                "search.guard_num_real=8", "search.guard_baseline_draws=2",
                f"sampled_dir={tmp_path}"])
    out = run_search(cfg, params=_params(cfg))
    g = out["guard"]
    assert g is not None and np.isfinite(g["baseline_fid_proxy"])


def test_launch_segments_rejects_fast_samplers_and_other_algorithms():
    params = _params(_cfg())
    with pytest.raises(ValueError, match="launch_segments"):
        run_search(_cfg(["diffusion.launch_segments=3",
                         "diffusion.sampler=ddim"]), params=params)
    with pytest.raises(ValueError, match="launch_segments"):
        run_search(_cfg(["diffusion.launch_segments=3",
                         "search.algorithm=zero_order"]), params=params)


def test_legacy_search_key_is_an_alias():
    """Committed round-4 provenance/scripts use search.launch_segments;
    both the dotted-override and nested-YAML spellings must keep landing
    on diffusion.launch_segments."""
    cfg = _cfg(["search.launch_segments=5"])
    assert cfg.diffusion.launch_segments == 5
    import yaml

    from itsd_tpu.utils.config import Config, _update_dataclass
    cfg2 = Config()
    _update_dataclass(cfg2, yaml.safe_load("search:\n  launch_segments: 7\n"))
    assert cfg2.diffusion.launch_segments == 7


def test_eval_launch_segments_matches_single_launch(tmp_path):
    """`eval` rides the same bounded-launch chain: same seed, same chain
    (the PRNG key crosses launch boundaries — exact-identity pinned by
    test_chained_segments_bit_identical_to_sample); jit-fusion boundaries
    differ between the one-launch and segmented programs, so the images
    agree to float32 ulp only."""
    sd1 = [f"sampled_dir={tmp_path}/a"]
    sd3 = [f"sampled_dir={tmp_path}/b", "diffusion.launch_segments=3"]
    cfg1 = _cfg(sd1)
    params = _params(cfg1)
    out1 = evaluate(cfg1, params=params)
    out3 = evaluate(_cfg(sd3), params=params)
    np.testing.assert_allclose(out1["images"], out3["images"],
                               rtol=0, atol=1e-5)


def test_eval_launch_segments_rejects_fast_samplers(tmp_path):
    cfg = _cfg(["diffusion.launch_segments=3", "diffusion.sampler=dpm",
                f"sampled_dir={tmp_path}"])
    with pytest.raises(ValueError, match="launch_segments"):
        evaluate(cfg, params=_params(cfg))
