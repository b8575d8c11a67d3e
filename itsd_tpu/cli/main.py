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
        from ..train.checkpoint import restore_params
        from .runner import build_model, compute_real_features, init_params
        import os
        model, conditional = build_model(cfg)
        assert cfg.test_load_weight, "needs test_load_weight"
        params = restore_params(
            os.path.join(cfg.save_weight_dir, cfg.test_load_weight),
            template=init_params(cfg, model, conditional))
        # best-available extractors + real features from the configured
        # dataset (C25/C31): pretrained Inception if ITSD_INCEPTION_WEIGHTS
        # is set, documented proxy otherwise
        from ..metrics import default_extractors
        feature_fn, logit_fn, provenance = default_extractors()
        print(f"feature extractor: {provenance}")
        real_features = None
        try:
            images, _ = runner.load_dataset(cfg)
            real_features = compute_real_features(
                (images + 1.0) / 2.0, feature_fn,
                num_samples=cfg.train.fid_num_real_samples)
        except Exception as e:
            print(f"no real dataset available ({e}); FID will be NaN")
        out = runner.sample_with_metrics(cfg, params,
                                         feature_fn=feature_fn,
                                         logit_fn=logit_fn,
                                         real_features=real_features)
        print(f"tracked {len(out['history'])} metric points")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
