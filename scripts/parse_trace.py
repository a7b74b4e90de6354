"""Aggregate a jax.profiler Chrome trace: top device ops by total time.

Usage:
    python scripts/parse_trace.py DIR_OR_FILE [--top 30] [--steps N]

DIR_OR_FILE is either the directory passed to ``-trace`` (the newest
``*.trace.json.gz`` under it is used) or a trace.json[.gz] path.  With
``--steps`` the per-step cost of each op group is printed (total / N),
which is the number to compare against the attack steps/s reciprocal.

Ops are grouped by fusion name with the trailing kernel-instance digits
stripped (``fusion.123`` -> ``fusion``) so XLA's numbered clones
aggregate; the full name of the single largest instance in each group is
shown for cross-referencing with the HLO dump.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path!r}")
    return hits[-1]


def load_events(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        doc = json.load(f)
    return doc["traceEvents"] if isinstance(doc, dict) else doc


_NUM = re.compile(r"[.\-_]?\d+$")


def group_name(name: str) -> str:
    return _NUM.sub("", name)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=0,
                    help="scan length; prints per-step us for each group")
    ap.add_argument("--pid-filter", default="",
                    help="substring of the process name to keep (e.g. TPU)")
    args = ap.parse_args()

    path = find_trace(args.path)
    events = load_events(path)

    # map pid -> process name from metadata events
    pnames = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pnames[ev["pid"]] = ev.get("args", {}).get("name", "")

    # keep complete events on device planes (skip python/host threads unless
    # nothing matches); durations are in microseconds
    def is_device(pid):
        name = pnames.get(pid, "")
        if args.pid_filter:
            return args.pid_filter.lower() in name.lower()
        return any(k in name for k in ("TPU", "Device", "/device:"))

    total = collections.Counter()
    count = collections.Counter()
    biggest = {}  # group -> (dur, full name)
    span_lo, span_hi = float("inf"), 0.0
    n_kept = 0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if not is_device(ev.get("pid")):
            continue
        g = group_name(ev["name"])
        dur = ev["dur"]
        total[g] += dur
        count[g] += 1
        if dur > biggest.get(g, (0, ""))[0]:
            biggest[g] = (dur, ev["name"])
        ts = ev.get("ts", 0)
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)
        n_kept += 1

    if not n_kept:
        names = sorted(set(pnames.values()))
        sys.exit(f"no device events matched; process names: {names}")

    grand = sum(total.values())
    span = span_hi - span_lo
    print(f"trace: {path}")
    print(f"device events: {n_kept}; busy {grand/1e3:.1f} ms over a "
          f"{span/1e3:.1f} ms span ({100*grand/max(span,1):.0f}% occupancy)")
    if args.steps:
        print(f"per-step budget at --steps {args.steps}: "
              f"{span/args.steps:.1f} us span, {grand/args.steps:.1f} us busy")
    hdr = f"{'total ms':>9} {'%':>5} {'n':>6} {'us/step':>8}  group  [largest instance]"
    print(hdr)
    for g, t in total.most_common(args.top):
        per = f"{t/args.steps:8.1f}" if args.steps else " " * 8
        print(f"{t/1e3:9.2f} {100*t/grand:5.1f} {count[g]:6d} {per}  "
              f"{g}  [{biggest[g][1]}]")


if __name__ == "__main__":
    main()
