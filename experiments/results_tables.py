"""Render the docs/RESULTS.md tables from docs/results/nfe_scaling.jsonl —
keeps the prose doc mechanically in sync with the measured data.

Usage: python experiments/results_tables.py [path/to/nfe_scaling.jsonl]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "docs/results/nfe_scaling.jsonl"
    recs = [json.loads(l) for l in open(path)]
    by = lambda ph: [r for r in recs if r["phase"] == ph]

    def first(ph):
        rs = by(ph)
        return rs[0] if rs else None

    cls, tr = first("classifier"), first("train")
    if cls:
        print(f"classifier: holdout_acc={cls['holdout_acc']:.3f}")
    if tr:
        print(f"train: steps={tr['steps']} "
              f"loss_first20={tr.get('loss_first20')} "
              f"loss_last20={tr['loss_last20']} seconds={tr['seconds']}")
    else:
        print("(run incomplete — no train phase yet)")
        return

    print("\n## step scaling\n")
    print("| DDIM steps (NFE) | verifier score | FID-proxy |")
    print("|---|---|---|")
    for r in by("step_scaling"):
        print(f"| {r['ddim_steps']} | {r['score']:.3f} "
              f"| {r['fid_proxy']:.2f} |")

    print("\n## random search\n")
    print("| N | NFE (evals) | E[best score] |")
    print("|---|---|---|")
    for r in by("search_random"):
        print(f"| {r['n_candidates']} | {r['nfe_evals']:,} "
              f"| {r['score_mean_of_max']:.4f} |")
    pool = first("search_random_pool")
    if pool:
        print(f"pool: best={pool['pool_best']} mean={pool['pool_mean']} "
              f"fid_proxy_best={pool['fid_proxy_best']} "
              f"wall={pool['wall_seconds']}s")

    print("\n## zero-order (best so far per iteration)\n")
    zo = by("search_zero_order")
    for r in zo:
        print(f"iter {r['iteration']}: nfe={r['nfe_evals']:,} "
              f"score={r['score_best_so_far']:.4f}")
    done = first("search_zero_order_done")
    if done:
        print(f"wall={done['wall_seconds']}s")

    print("\n## path search\n")
    print("| paths | NFE (evals) | best score | FID-proxy |")
    print("|---|---|---|---|")
    for r in by("search_path"):
        print(f"| {r['n_paths']} | {r['nfe_evals']:,} "
              f"| {r['score_best']:.4f} | {r['fid_proxy_best']:.2f} |")


if __name__ == "__main__":
    main()
