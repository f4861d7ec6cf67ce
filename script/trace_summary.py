"""Aggregate a jax.profiler trace into per-op device-time totals.

Usage: python script/trace_summary.py TRACE_DIR [--iters N] [--top K]

Loads the newest `*.trace.json.gz` under TRACE_DIR, sums device-side
event durations by op name, and prints the top K as ms (total and /N
when --iters is given). The `args` metadata (long_name / source line)
is surfaced when present — the decisive attribution tool of the round-4
perf wave (docs/perf_journal.md)."""

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--contains", default=None,
        help="only show ops whose name contains this substring",
    )
    args = ap.parse_args()

    files = sorted(
        glob.glob(
            os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
            recursive=True,
        ),
        key=os.path.getmtime,
    )
    assert files, f"no trace.json.gz under {args.trace_dir}"
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)

    # device lanes: pid names containing 'TPU'/'XLA Op' hierarchies; the
    # robust filter is complete events (ph=X) that carry a 'dur' and sit
    # on a thread whose events are op-shaped (have args.long_name or
    # look like fusion/kernel names)
    agg = collections.Counter()
    meta = {}
    count = collections.Counter()
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        agg[name] += ev["dur"]
        count[name] += 1
        a = ev.get("args")
        if a and name not in meta:
            ln = a.get("long_name") or a.get("tf_op") or ""
            src = a.get("source") or ""
            if ln or src:
                meta[name] = (ln[:140], src[:100])

    total = sum(agg.values())
    print(f"# device total: {total/1e3:.1f} ms over {len(agg)} op names")
    shown = 0
    for name, us in agg.most_common():
        if args.contains and args.contains not in name:
            continue
        ms = us / 1e3
        per = f"  {ms/args.iters:7.2f} ms/iter" if args.iters else ""
        ln, src = meta.get(name, ("", ""))
        print(f"{ms:9.1f} ms  x{count[name]:<6}{per}  {name}")
        if ln:
            print(f"           | {ln}")
        if src:
            print(f"           | {src}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
