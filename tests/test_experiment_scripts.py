"""CPU smoke tests for the TPU-window measurement scripts.

The chip window is a scarce resource (the relay flaps for hours —
BENCH_r03 died to one outage), so every script `experiments/tpu_window.py`
queues must have its WIRING proven on CPU before it ever runs on-chip: a
typo discovered mid-window wastes real chip time. These tests drive the
actual code paths with tiny shapes:

  * train_artifacts.train_diffusion end-to-end (train -> bf16 artifact +
    meta + sample grid), including a real crash->resume cycle through the
    segment-checkpoint path the flagship run depends on,
  * the shapes256_flagship arch spec builds the reference's exact width
    (~108M params — config/config.yaml:17-31) without touching a device,
  * perf_imagenet256's window invocation (--skip-sampler --remat-ab
    --mem-batches --merge) flows every flag to the right measurement and
    merges into an existing result file,
  * the compile-only abstract-lowering memory probe works against XLA's
    buffer assignment on this backend.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import experiments.perf_imagenet256 as pi  # noqa: E402
import experiments.train_artifacts as ta  # noqa: E402


@pytest.fixture()
def tiny_env(tmp_path, monkeypatch):
    """Redirect every artifact/result path into tmp and register a
    CPU-sized arch that exercises the same code path as the flagship."""
    monkeypatch.setattr(ta, "ARTIFACTS", str(tmp_path / "artifacts"))
    monkeypatch.setattr(ta, "REPO", str(tmp_path))
    (tmp_path / "docs" / "results").mkdir(parents=True)
    monkeypatch.setattr(ta, "TRAIN_T", 10)
    monkeypatch.setattr(ta, "RESUME_EVERY", 2)
    monkeypatch.setitem(
        ta.ARCHS, "tiny_smoke",
        dict(img=16, ch=8, ch_mult=(1, 2), attn=(), num_res_blocks=1,
             dropout=0.1, num_labels=None, chunk=2))
    return tmp_path


@pytest.mark.slow
def test_train_artifacts_end_to_end_with_crash_resume(tiny_env, monkeypatch):
    notes = []
    monkeypatch.setattr(ta, "note", notes.append)

    # crash AFTER the train loop but BEFORE the artifact lands — exactly
    # what a relay flap at the end of a segment does
    real_save = ta.save_bf16

    def exploding_save(path, params):
        raise RuntimeError("injected relay flap")

    monkeypatch.setattr(ta, "save_bf16", exploding_save)
    with pytest.raises(RuntimeError, match="injected relay flap"):
        ta.train_diffusion("tiny_smoke", steps=5, batch=4)
    resume = os.path.join(ta.ARTIFACTS, "tiny_smoke.resume")
    assert os.path.isdir(resume), \
        "segment checkpoint must survive a crash (saved at step 4)"

    # second invocation must RESUME (not restart) and finish cleanly
    monkeypatch.setattr(ta, "save_bf16", real_save)
    ta.train_diffusion("tiny_smoke", steps=5, batch=4)
    assert any("resuming from step 4" in n for n in notes), notes

    meta = json.load(open(os.path.join(ta.ARTIFACTS, "tiny_smoke.json")))
    assert np.isfinite(meta["loss_final"]) and meta["steps"] == 5
    assert meta["dtype_saved"] == "bfloat16"
    assert os.path.isdir(os.path.join(ta.ARTIFACTS, "tiny_smoke"))
    assert not os.path.isdir(resume), "resume dir must be cleaned up"
    grid = os.path.join(str(tiny_env), "docs", "results",
                        "artifact_tiny_smoke_sampled.png")
    assert os.path.isfile(grid)

    # the saved artifact must round-trip through the product loader
    from itsd_tpu.train.checkpoint import restore_params
    model, _ = ta.build_unet("tiny_smoke")
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), x,
                              jnp.zeros((1,), jnp.int32))
    params = restore_params(os.path.join(ta.ARTIFACTS, "tiny_smoke"),
                            template)
    f32 = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), params)
    out = model.apply(f32, x, jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_flagship_arch_is_the_reference_exact_width():
    """shapes256_flagship must be the reference flagship
    (/root/reference/config/config.yaml:17-31: ch=128, (1,2,3,4),
    attn@stage2, dropout 0.15) — ~108M params. eval_shape only: no
    device work, so this guards the window step even relay-down."""
    model, conditional = ta.build_unet("shapes256_flagship")
    assert not conditional
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 80e6 < n < 140e6, f"flagship width changed: {n/1e6:.1f}M params"
    a = ta.ARCHS["shapes256_flagship"]
    assert a["ch"] == 128 and tuple(a["ch_mult"]) == (1, 2, 3, 4)
    assert tuple(a["attn"]) == (2,) and a["dropout"] == 0.15


def test_perf256_window_invocation_flows_and_merges(tmp_path, monkeypatch):
    """The exact argv tpu_window.py uses for the mem256 step, with the
    measurements stubbed: every flag must reach the right function and
    --merge must keep fields from a previous partial run."""
    out = tmp_path / "imagenet256.json"
    out.write_text(json.dumps({
        "sampler": {"flash": {"ms_per_model_eval": 62.47}},
        "train_step": {"stale": True},
    }))
    calls = []
    monkeypatch.setattr(
        pi, "measure_sampler",
        lambda *a, **k: pytest.fail("--skip-sampler must skip the sampler"))
    monkeypatch.setattr(
        pi, "measure_train_step",
        lambda batch, remat=False: (calls.append(("train", batch, remat))
                                    or {"batch": batch, "remat": remat}))
    monkeypatch.setattr(
        pi, "probe_train_batches",
        lambda batches, remat: (calls.append(("probe", tuple(batches),
                                              remat))
                                or [{"batch": b, "remat": remat,
                                     "fits_16gb": True} for b in batches]))
    monkeypatch.setattr(sys, "argv", [
        "perf_imagenet256.py", "--skip-sampler", "--remat-ab",
        "--mem-batches", "8,16,24,32,48,64", "--merge",
        "--out", str(out)])
    pi.main()

    rep = json.loads(out.read_text())
    # merged: the committed sampler numbers survive a train-only rerun
    assert rep["sampler"]["flash"]["ms_per_model_eval"] == 62.47
    assert rep["train_step"] == {"batch": 8, "remat": False}
    assert rep["train_step_remat"] == {"batch": 8, "remat": True}
    sweep = rep["train_memory_sweep"]
    assert {r["remat"] for r in sweep} == {False, True}
    assert ("probe", (8, 16, 24, 32, 48, 64), False) in calls
    assert ("probe", (8, 16, 24, 32, 48, 64), True) in calls


def test_abstract_memory_probe_reads_buffer_assignment():
    """probe_train_batches leans on lowering a jitted step over
    ShapeDtypeStructs and reading Compiled.memory_analysis(); prove that
    contract on this backend with a toy function."""
    f = jax.jit(lambda x: (x @ x).sum())
    ma = pi.mem_analysis(f, jax.ShapeDtypeStruct((64, 64), jnp.float32))
    assert "error" not in ma, ma
    assert ma["resident_total_bytes"] > 0
    assert ma["argument_size_in_bytes"] >= 64 * 64 * 4


def test_flash_tune_wiring_interpret_mode(tmp_path, monkeypatch):
    """flash_tune's sweep loop, resumable cells, and best-vs-default
    report must work before it ever touches the chip — run it in Pallas
    interpret mode at a tiny shape with results redirected to tmp."""
    import experiments.flash_tune as ft

    monkeypatch.setattr(ft, "RESULTS", str(tmp_path))
    monkeypatch.setenv("ITSD_FLASH_TUNE_INTERPRET", "1")
    monkeypatch.setattr(sys, "argv", [
        "flash_tune.py", "--batch", "1", "--tokens", "256",
        "--channels", "8", "--reps", "1"])
    ft.main()

    rep = json.load(open(tmp_path / "flash_tune.json"))
    assert rep["shape"] == {"B": 1, "N": 256, "C": 8, "dtype": "bfloat16"}
    fwd = {t: c for t, c in rep["cells"].items()
           if t.startswith("fwd_q") and "ms" in c}
    # 256 tokens admit block sizes {128, 256} on both axes -> 4 cells
    assert len(fwd) == 4, rep["cells"]
    assert "best_fwd" in rep
    assert "fwd_bwd_default" in rep["cells"]

    # resumability: a second invocation re-measures nothing (cells kept)
    before = json.dumps(rep["cells"], sort_keys=True)
    ft.main()
    rep2 = json.load(open(tmp_path / "flash_tune.json"))
    assert json.dumps(rep2["cells"], sort_keys=True) == before


def test_restart_budget_wiring(tmp_path, monkeypatch):
    """restart_budget.py is tpu_window-queued: prove its wiring (arm
    programs, NFE stamps, per-cell resume, summary format) on CPU with a
    tiny stand-in artifact before it ever spends chip time."""
    import bench as _bench
    import experiments.restart_budget as rb
    import itsd_tpu.models.classifier as clf
    from itsd_tpu.models import UNet, uncond_unet_config

    cfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(),
                             num_res_blocks=1, dropout=0.0, T=8,
                             time_embed="functional", dtype="float32")
    tiny = UNet(cfg)
    params = tiny.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)),
                       jnp.zeros((1,), jnp.int32))
    monkeypatch.setattr(_bench, "load_artifact_params",
                        lambda name: params)
    monkeypatch.setattr(ta, "build_unet",
                        lambda name, **kw: (tiny, False))
    monkeypatch.setattr(ta, "TRAIN_T", 8)
    monkeypatch.setattr(
        clf, "load_classifier",
        lambda p: (lambda x: jnp.zeros((x.shape[0], 10)), None, None))
    monkeypatch.setattr(rb, "RESULTS", str(tmp_path))
    monkeypatch.setattr(rb, "ARMS",
                        {"plain": (), "bounce": ((6, 2, 1),)})
    monkeypatch.setattr(sys, "argv",
                        ["restart_budget.py", "--seeds", "2",
                         "--batch", "2"])
    rb.main()

    out = tmp_path / "restart_budget_cpu.json"
    rep = json.load(open(out))
    assert {c["arm"] for c in rep["cells"]} == {"plain", "bounce"}
    assert len(rep["cells"]) == 4
    assert rep["summary"]["plain"]["nfe_per_image"] == 8
    assert rep["summary"]["bounce"]["nfe_per_image"] == 8 + 4
    assert all(np.isfinite(c["fid_proxy"]) for c in rep["cells"])

    # per-cell resume: a second invocation re-measures nothing
    before = json.dumps(rep["cells"], sort_keys=True)
    rb.main()
    rep2 = json.load(open(out))
    assert json.dumps(rep2["cells"], sort_keys=True) == before


@pytest.mark.slow
def test_flagship_inference_metrics_wiring(tiny_env, monkeypatch):
    """flagship_inference_metrics.py is tpu_window-queued: prove on CPU
    that the overrides flow into inference_metrics (extended inference_T,
    clip_denoised, bf16 artifact load) and the tracked history comes back
    finite and monotone in t before it spends chip time."""
    import experiments.flagship_inference_metrics as fim

    model, _ = ta.build_unet("tiny_smoke")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,), jnp.int32))
    os.makedirs(ta.ARTIFACTS, exist_ok=True)
    ta.save_bf16(os.path.join(ta.ARTIFACTS, "tiny_smoke"), params)
    monkeypatch.setattr(fim, "REPO", str(tiny_env))
    out = tiny_env / "docs" / "results" / "fim.json"
    monkeypatch.setattr(sys, "argv", [
        "fim.py", "--arch", "tiny_smoke", "--inference-t", "14",
        "--interval", "5", "--batch", "2", "--num-real", "16",
        "--out", str(out)])
    fim.main()

    rec = json.load(open(out))
    assert rec["inference_T"] == 14
    ts = [r["t"] for r in rec["history"]]
    assert ts[-1] == 0 and ts == sorted(ts, reverse=True)
    # extended-T chain with clip_denoised: every tracked metric finite
    assert rec["all_tracked_is_finite"]


def test_restart_search_wiring(tmp_path, monkeypatch):
    """restart_search.py (VERDICT r5 task: measure the restart x search
    composition) — wiring proven on CPU with a tiny stand-in before chip
    time: arm programs, equal-NFE accounting, per-cell resume, and both
    score columns (selection verifier + independent FID-proxy)."""
    import bench as _bench
    import experiments.restart_search as rs
    import itsd_tpu.models.classifier as clf
    from itsd_tpu.models import UNet, uncond_unet_config

    cfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(),
                             num_res_blocks=1, dropout=0.0, T=8,
                             time_embed="functional", dtype="float32")
    tiny = UNet(cfg)
    params = tiny.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)),
                       jnp.zeros((1,), jnp.int32))
    monkeypatch.setattr(_bench, "load_artifact_params",
                        lambda name: params)
    monkeypatch.setattr(ta, "build_unet",
                        lambda name, **kw: (tiny, False))
    monkeypatch.setattr(ta, "TRAIN_T", 8)
    # logits vary with the input so the verifier argmax is non-degenerate
    monkeypatch.setattr(
        clf, "load_classifier",
        lambda p: (lambda x: x.mean(axis=(1, 2)) @ jnp.ones((3, 10))
                   + jnp.arange(10.0) * x.var(axis=(1, 2, 3))[:, None],
                   None, None))
    monkeypatch.setattr(rs, "RESULTS", str(tmp_path))
    monkeypatch.setattr(rs, "RESTART", ((6, 2, 1),))
    monkeypatch.setattr(rs, "ARMS", {"plain_bo1": ("plain", 1),
                                     "restart_bo2": ("restart", 2)})
    monkeypatch.setattr(sys, "argv",
                        ["restart_search.py", "--seeds", "2",
                         "--batch", "2"])
    rs.main()

    out = tmp_path / "restart_search_cpu.json"
    rep = json.load(open(out))
    assert {c["arm"] for c in rep["cells"]} == {"plain_bo1", "restart_bo2"}
    assert len(rep["cells"]) == 4
    # NFE accounting: plain chain = T = 8; restart (6,2,1) adds 4; x2 cands
    assert rep["summary"]["plain_bo1"]["nfe_per_image"] == 8
    assert rep["summary"]["restart_bo2"]["nfe_per_image"] == 2 * (8 + 4)
    for c in rep["cells"]:
        assert np.isfinite(c["verifier_best"])
        assert np.isfinite(c["fid_proxy_of_winner"])
        assert c["verifier_best"] >= c["verifier_median"] - 1e-6

    # per-cell resume: a second invocation re-measures nothing
    before = json.dumps(rep["cells"], sort_keys=True)
    rs.main()
    rep2 = json.load(open(out))
    assert json.dumps(rep2["cells"], sort_keys=True) == before

    # the non-saturating target-class verifier regime writes its own file
    monkeypatch.setattr(sys, "argv",
                        ["restart_search.py", "--seeds", "1",
                         "--batch", "2", "--verifier", "target"])
    rs.main()
    rep_t = json.load(open(tmp_path / "restart_search_target_cpu.json"))
    assert rep_t["verifier"] == "target"
    assert all(np.isfinite(c["verifier_best"]) for c in rep_t["cells"])


@pytest.mark.slow
def test_spatial_memory_probe_wiring(tmp_path, monkeypatch):
    """spatial_memory.py (VERDICT r5: quantify the spatial/ring memory
    claim) — the compile-only memory_analysis pipeline runs on this
    backend, reports per-device temp/argument bytes, and merges."""
    import experiments.spatial_memory as sm

    out = tmp_path / "spatial_memory.json"
    monkeypatch.setattr(sys, "argv",
                        ["spatial_memory.py", "--smoke", "--shards", "1,4",
                         "--out", str(out)])
    sm.main()
    rep = json.load(open(tmp_path / "spatial_memory_smoke.json"))
    assert {(r["attention"], r["spatial_shard"]) for r in rep["rows"]} == \
        {("xla", 1), ("xla", 4)}
    for r in rep["rows"]:
        assert r["temp_size_in_bytes"] > 0
        assert r["argument_size_in_bytes"] > 0
    assert "xla_K4" in rep["temp_scaling_vs_xla_K1"]
    assert rep["rows"][0]["rows_per_device"] == 16  # K=1: full image rows

    # merge: re-run adds nothing, existing rows are reused
    n = len(rep["rows"])
    monkeypatch.setattr(sys, "argv",
                        ["spatial_memory.py", "--smoke", "--shards", "1,4",
                         "--out", str(out), "--merge"])
    sm.main()
    rep2 = json.load(open(tmp_path / "spatial_memory_smoke.json"))
    assert len(rep2["rows"]) == n


def test_smc_placement_wiring(tmp_path, monkeypatch):
    """smc_placement.py (VERDICT r5: placement sweep at the lambda knee) —
    arms, equal-NFE accounting, per-(arm,seed) resume, summary schema,
    proven on CPU with a tiny stand-in before chip time."""
    import bench as _bench
    import experiments.smc_placement as sp
    import itsd_tpu.models.classifier as clf
    from itsd_tpu.models import UNet, uncond_unet_config

    cfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(),
                             num_res_blocks=1, dropout=0.0, T=8,
                             time_embed="functional", dtype="float32")
    tiny = UNet(cfg)
    params = tiny.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)),
                       jnp.zeros((1,), jnp.int32))
    monkeypatch.setattr(_bench, "load_artifact_params",
                        lambda name: params)
    monkeypatch.setattr(ta, "build_unet", lambda name, **kw: (tiny, False))
    monkeypatch.setattr(ta, "TRAIN_T", 8)
    monkeypatch.setattr(
        clf, "load_classifier",
        lambda p: (lambda x: x.mean(axis=(1, 2)) @ jnp.ones((3, 10)),
                   None, None))
    monkeypatch.setattr(sp, "RESULTS", str(tmp_path))
    monkeypatch.setattr(sp, "N_PARTICLES", 4)
    monkeypatch.setattr(sp, "PLACEMENTS",
                        {"early": (6, 4, 2), "late": (3, 2, 1)})
    monkeypatch.setattr(sys, "argv",
                        ["smc_placement.py", "--seeds", "2", "--batch", "2"])
    sp.main()

    rep = json.load(open(tmp_path / "smc_placement_cpu.json"))
    assert rep["complete"] is True
    assert set(rep["arms"]) == {"early", "late"}
    for v in rep["arms"].values():
        assert v["n_seeds"] == 2
        assert np.isfinite(v["E_best"])
        assert len(v["resample_steps"]) == 3
    # identical NFE across arms (3 checkpoints each)
    assert rep["nfe"]["smc"] > rep["nfe"]["bestof16"]

    # resume: nothing re-measured
    before = json.dumps(rep["per_seed"], sort_keys=True)
    sp.main()
    rep2 = json.load(open(tmp_path / "smc_placement_cpu.json"))
    assert json.dumps(rep2["per_seed"], sort_keys=True) == before


@pytest.mark.slow
def test_autoguidance_search_wiring(tmp_path, monkeypatch):
    """autoguidance_search.py — guided-candidate best-of-N over segment
    launches: arm set, NFE accounting, resume, both guidance flavors.
    (slow: ~14 min on the 1-core CPU mesh — 64x64 segment programs x2
    guidance flavors x2 batch shapes all compile)"""
    import experiments.autoguidance_search as ags
    import experiments.train_artifacts as ta_mod
    import itsd_tpu.models.classifier as clf
    from itsd_tpu.models import UNet, cond_unet_config

    cfg = cond_unet_config(num_labels=10, ch=8, ch_mult=(1,),
                           num_res_blocks=1, dropout=0.0, T=8,
                           dtype="float32")
    import dataclasses as _dc
    cfg = _dc.replace(cfg, time_embed="functional")
    tiny = UNet(cfg)
    monkeypatch.setattr(ta_mod, "build_unet",
                        lambda name, **kw: (tiny, True))
    monkeypatch.setattr(ta_mod, "TRAIN_T", 8)
    monkeypatch.setattr(
        clf, "load_classifier",
        lambda p: (lambda x: x.mean(axis=(1, 2)) @ jnp.ones((3, 10)),
                   None, None))
    monkeypatch.setattr(ags, "RESULTS", str(tmp_path))
    monkeypatch.setattr(sys, "argv",
                        ["autoguidance_search.py", "--seeds", "1",
                         "--per-class", "1", "--T", "6"])
    # --T smoke uses random init for strong/weak; 64x64 shapes stay
    ags.main()
    rep = json.load(open(tmp_path / "autoguidance_search_smoke.json"))
    arms = set(rep["summary"])
    assert arms == {"cfg_w1.8_bo1", "cfg_w1.8_bo4",
                    "auto_mid_w0.5_bo1", "auto_mid_w0.5_bo4"}
    assert rep["summary"]["cfg_w1.8_bo4"]["nfe_per_image"] == \
        4 * rep["summary"]["cfg_w1.8_bo1"]["nfe_per_image"]
    for v in rep["summary"].values():
        assert np.isfinite(v["verifier_best_mean"])
