"""Summarize a train_log.jsonl into the capacity/alive/psnr trajectory
table (BASELINE.md documentation of the 30k reference-default protocol).

Usage: python script/summarize_train_log.py output/demo/eval_30k/record/train_log.jsonl
"""

import json
import sys


def main(path):
    rows = [json.loads(l) for l in open(path)]
    scalars = [r for r in rows if "loss" in r]
    densify = [r for r in rows if any(k.startswith("densify/") for k in r)]
    events = [r for r in rows if r.get("event")]

    print(f"# {path}: {len(scalars)} scalar records, "
          f"{len(densify)} densify rounds, {len(events)} events")
    marks = [100] + list(range(2500, 30001, 2500))
    print("| iter | psnr | loss | alive | overflow(i/t) |")
    print("|---|---|---|---|---|")
    for m in marks:
        best = min(scalars, key=lambda r: abs(r["iteration"] - m))
        if abs(best["iteration"] - m) > 200:
            continue
        print(
            f"| {best['iteration']} | {best['psnr']:.2f} | "
            f"{best['loss']:.4f} | {int(best['num_alive'])} | "
            f"{int(best.get('overflow_instance', 0))}/"
            f"{int(best.get('overflow_tile', 0))} |"
        )
    if densify:
        alive = [int(r.get("densify/points_total", 0)) for r in densify]
        pruned = sum(int(r.get("densify/points_pruned", 0)) for r in densify)
        print(f"# densify rounds: {len(densify)}; alive span "
              f"{min(alive)}..{max(alive)}; total pruned {pruned}")
        last = densify[-1]
        print(f"# last densify record: { {k: int(v) for k, v in last.items()} }")
    for e in events:
        print(f"# EVENT: {e}")


if __name__ == "__main__":
    main(sys.argv[1])
