"""Unified CLI — the replacement for `Main.py` (Hydra, unconditional),
`MainCondition.py` (hard-coded dict, CFG), the inference-metrics CLI
(`abstract_metrics_from_pretrained_ddpm.py`), the fine-tune CLI
(`fine_tune_extended_T.py`) and the (never-wired) search library.

Usage:
    python -m itsd_tpu.cli.main train  [--config c.yaml] [key=value ...]
    python -m itsd_tpu.cli.main eval   [--config c.yaml] [key=value ...]
    python -m itsd_tpu.cli.main search [--config c.yaml] [key=value ...]
    python -m itsd_tpu.cli.main finetune-t [--config c.yaml] [key=value ...]
    python -m itsd_tpu.cli.main inference-metrics [--config c.yaml] [...]

Overrides accept both dotted keys (`diffusion.T=2000`) and the reference's
flat keys (`T=2000`, `channel_mult=[1,4,8,8,4,2]`, `inference_T=none`).
"""

from __future__ import annotations

import argparse
import sys

from ..utils import load_config, to_dict


def _parse(argv):
    p = argparse.ArgumentParser(prog="itsd_tpu")
    p.add_argument("command",
                   choices=["train", "eval", "search", "finetune-t",
                            "inference-metrics"])
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("overrides", nargs="*", help="key=value overrides")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])
    # Persistent XLA compilation cache: a fresh process pays minutes of
    # compile for the T=1000 sampler otherwise; with the cache, warm starts
    # deserialise in seconds (docs/PERF.md "Compilation cache").
    from ..utils import enable_compilation_cache
    enable_compilation_cache()
    # Multi-host entry hook (no-op unless ITSD_MULTIHOST=1): after this,
    # jax.devices() spans all hosts and the same mesh/sharding code scales
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    print(f"[itsd_tpu] {args.command} with config:")
    print(to_dict(cfg))

    from . import runner
    if args.command == "train":
        out = runner.train(cfg)
        print(f"final loss: {out['final_loss']}")
    elif args.command == "eval":
        out = runner.evaluate(cfg)
        print(f"sampled grid: {out['path']}")
    elif args.command == "search":
        out = runner.run_search(cfg)
        print(f"best score: {out['best_score']} (NFE={out['nfes']})")
    elif args.command == "finetune-t":
        out = runner.finetune_extended_T(cfg)
        print(f"final loss: {out['final_loss']} "
              f"(ckpt T detected: {out['ckpt_T_detected']})")
    elif args.command == "inference-metrics":
        # full-checkpoint loading (EMA-preferring + cross-T surgery via
        # load_eval_params), best-available Inception extractors, CLIP
        # tracking when $ITSD_CLIP_WEIGHTS is set — matching
        # `abstract_metrics_from_pretrained_ddpm.py:126-277,498-646`
        out = runner.inference_metrics(cfg)
        print(f"tracked {len(out['history'])} metric points")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
