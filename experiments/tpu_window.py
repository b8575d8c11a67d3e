"""TPU-window orchestrator: run every queued on-chip measurement, in
value-per-minute order, the moment the relay comes back — resumably.

The TPU relay flaps for hours at a time (BENCH_r03 was lost to one
outage), so chip windows are a scarce resource. This runs each queued
round-4 measurement as a bounded subprocess, stamps completions under
`experiments/.tpu_window/`, and skips stamped steps on re-run; a flap
mid-window loses at most one step (and the internally-resumable steps —
guard_sweep, flagship training — lose even less). Between steps it
re-probes the device with a tiny timed matmul and exits 3 if the relay
died, so an outer retry loop can re-invoke cheaply.

Steps (VERDICT r3 "next round" items 1/2/4/5/6/8):
  probe            tiny matmul sanity + relay latency measurement
  bench_smoke      BENCH_T=50 bench.py end-to-end (relay-proofing in anger)
  pruned_budget    equal-NFE pruned-vs-best-of-N, 20 seeds
  mem256           256x256 train memory quantification + remat A/B
  flash_tune       flash-attention block-size sweep at the flagship shape
  vit_large        DiT-scale ViT remat/rbg MFU matrix
  guard_sweep      verifier-hacking budget-sweep curves
  restart_budget   restart-sampling quality-vs-NFE on the trained artifact
  min_snr_ab       min-SNR loss-weighting A/B (quality per train step)
  flagship_train   ch=128 256x256 flagship training (segmented/resumable)
  flagship_search  best-of-N on the full-width flagship through the CLI
  flagship_im      inference-metrics (C31) on the flagship at the
                   reference's extended-T operating point (T=3000 tracked)
  flagship_search_dpm  best-of-16 over DPM-Solver++(2M)-20 candidates at
                   full width (Axis 3 at the flagship operating point)

Usage: python experiments/tpu_window.py [--skip step,step] [--only step]
Exit: 0 all done/attempted, 3 relay down (retry later).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "docs", "results")
ARTIFACTS = os.path.join(REPO, "artifacts")
STAMPS = os.path.join(REPO, "experiments", ".tpu_window")
PY = sys.executable


def note(m):
    print(f"[window] {time.strftime('%H:%M:%S')} {m}", file=sys.stderr,
          flush=True)


def probe_device(timeout_s: int = 240) -> float | None:
    """Relay-latency probe in a subprocess (a hung axon init can't be
    interrupted in-process). Returns per-op ms, or None if down.

    Deliberately stricter than bench.py's _probe_relay (devices>0 only):
    the window schedules multi-hour steps, so it also asserts the platform
    really is TPU and measures dispatch latency to log relay health."""
    code = (
        "import jax, jax.numpy as jnp, time\n"
        "d = jax.devices()[0]\n"
        "assert d.platform == 'tpu', d\n"
        "x = jnp.zeros((256, 256))\n"
        "f = jax.jit(lambda a: a @ a)\n"
        "f(x).block_until_ready()\n"
        "t0 = time.time()\n"
        "for _ in range(5): f(x).block_until_ready()\n"
        "print('MS_PER_OP', (time.time() - t0) / 5 * 1e3)\n"
    )
    try:
        out = subprocess.run([PY, "-c", code], capture_output=True,
                             text=True, timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("MS_PER_OP"):
            return float(line.split()[1])
    return None


def run_step(name: str, argv: list[str], timeout_s: int,
             env_extra: dict | None = None) -> bool:
    os.makedirs(STAMPS, exist_ok=True)
    log = os.path.join(STAMPS, f"{name}.log")
    env = dict(os.environ)
    env.update(env_extra or {})
    note(f"{name}: {' '.join(argv)} (timeout {timeout_s}s, log {log})")
    t0 = time.time()
    with open(log, "a") as fh:
        fh.write(f"\n===== {time.strftime('%F %T')} {' '.join(argv)}\n")
        fh.flush()
        try:
            rc = subprocess.run(argv, stdout=fh, stderr=fh, env=env,
                                timeout=timeout_s, cwd=REPO).returncode
        except subprocess.TimeoutExpired:
            fh.write(f"===== TIMEOUT after {timeout_s}s\n")
            rc = -1
    dt = time.time() - t0
    if rc == 0:
        open(os.path.join(STAMPS, name + ".done"), "w").write(
            f"{time.strftime('%F %T')} {dt:.0f}s\n")
        note(f"{name}: DONE in {dt:.0f}s")
        return True
    note(f"{name}: FAILED rc={rc} after {dt:.0f}s (see {log})")
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--flagship-steps", type=int, default=6000)
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    only = set(filter(None, args.only.split(",")))

    def stamped(name):
        return os.path.isfile(os.path.join(STAMPS, name + ".done"))

    ms = probe_device()
    if ms is None:
        note("relay DOWN (probe timed out)")
        sys.exit(3)
    note(f"relay UP: {ms:.1f} ms/small-op dispatch")

    exp = os.path.join(REPO, "experiments")
    steps = [
        ("bench_smoke", [PY, os.path.join(REPO, "bench.py")], 1800,
         {"BENCH_T": "50", "BENCH_REPS": "2", "BENCH_DEADLINE_S": "1500",
          "BENCH_PROGRESS_FILE":
              os.path.join(STAMPS, "bench_smoke_progress.json")}),
        ("pruned_budget",
         [PY, os.path.join(exp, "pruned_budget.py"), "--seeds", "20"],
         3600, None),
        ("mem256",
         [PY, os.path.join(exp, "perf_imagenet256.py"), "--skip-sampler",
          "--remat-ab", "--mem-batches", "8,16,24,32,48,64", "--merge"],
         3600, None),
        ("flash_tune",
         [PY, os.path.join(exp, "flash_tune.py")], 2700, None),
        ("vit_large",
         [PY, os.path.join(exp, "vit_mfu_probe.py"), "--matrix"],
         4800, None),
        ("guard_sweep",
         [PY, os.path.join(exp, "guard_sweep.py"), "--seeds", "3"],
         7200, None),
        ("restart_budget",
         [PY, os.path.join(exp, "restart_budget.py"), "--seeds", "10"],
         2700, None),
        ("min_snr_ab",
         [PY, os.path.join(exp, "min_snr_ab.py")], 2700, None),
        # re-run after the VMEM-budget-aware flash block chooser landed:
        # the first sweep hit scoped-vmem compile OOM at batch>=24
        ("mem256_budgeted",
         [PY, os.path.join(exp, "perf_imagenet256.py"), "--skip-sampler",
          "--remat-ab", "--mem-batches", "8,16,24,32,48,64", "--merge"],
         4800, None),
        # time the batch the VMEM fix unlocked (was a compile failure)
        ("train256_b24",
         [PY, os.path.join(exp, "perf_imagenet256.py"), "--skip-sampler",
          "--train-batch", "24",
          "--out", os.path.join(RESULTS, "imagenet256_b24.json")],
         2400, None),
        ("flagship_train",
         [PY, os.path.join(exp, "train_artifacts.py"), "--only",
          "shapes256_flagship", "--steps256", str(args.flagship_steps),
          # batch 8 is the MEASURED ch=128 operating point (293 ms/step,
          # docs/results/imagenet256.json); batch 16 is asserted
          # memory-limited and must not be discovered mid-window
          "--batch256", "8"],
         10800, None),
        ("flagship_search",
         [PY, os.path.join(exp, "flagship256_search.py"), "--arch",
          "shapes256_flagship", "--candidates", "16", "--chunk", "2"],
         5400, None),
        ("flagship_im",
         [PY, os.path.join(exp, "flagship_inference_metrics.py")],
         3600, None),
        # Axis 3 at full width: best-of-16 over DPM-Solver++(2M)-20
        # candidates on the ch=128 flagship — 640 model evals vs the
        # ancestral run's 32,000
        ("flagship_search_dpm",
         [PY, os.path.join(exp, "flagship256_search.py"), "--arch",
          "shapes256_flagship", "--candidates", "16", "--chunk", "2",
          "--sampler", "dpm"],
         2400, None),
        # last: a FULL bench pass so every T=1000 program (incl. the
        # budgeted-block backward) is in the persistent XLA cache before
        # the driver's official BENCH_r04 capture — and we get a builder
        # record of the same numbers
        ("bench_full", [PY, os.path.join(REPO, "bench.py")], 5400,
         {"BENCH_DEADLINE_S": "5100",
          "BENCH_PROGRESS_FILE":
              os.path.join(STAMPS, "bench_full_progress.json")}),
    ]

    # Absolute wall-clock deadline (epoch seconds): no step may RUN past
    # it — the driver needs the single chip for its own bench capture.
    deadline = float(os.environ.get("WINDOW_DEADLINE_EPOCH", "0")) or None

    results = {}
    for name, argv, timeout_s, env_extra in steps:
        if only and name not in only:
            continue
        if name in skip or stamped(name):
            results[name] = "skipped/done"
            continue
        if deadline is not None:
            timeout_s = int(min(timeout_s, deadline - time.time()))
            if timeout_s < 120:
                results[name] = "deadline"
                note(f"{name}: skipped (window deadline)")
                continue
        if (name in ("flagship_search", "flagship_im",
                     "flagship_search_dpm")
                and not stamped("flagship_train")):
            results[name] = "blocked (flagship_train not done)"
            continue
        ms = probe_device()
        if ms is None:
            note("relay dropped mid-window; exiting for retry")
            results[name] = "relay down"
            print(json.dumps(results, indent=1))
            sys.exit(3)
        results[name] = "ok" if run_step(name, argv, timeout_s,
                                         env_extra) else "failed"

    print(json.dumps(results, indent=1))
    failed = [k for k, v in results.items() if v == "failed"]
    if failed:
        # Unstamped failures (e.g. flagship_train hitting its subprocess
        # timeout mid-run) are resumable — exit nonzero so the outer watch
        # loop retries them until the window deadline instead of stopping.
        note(f"window attempted; failed steps will retry: {failed}")
        sys.exit(4)
    note("window complete")


if __name__ == "__main__":
    main()
