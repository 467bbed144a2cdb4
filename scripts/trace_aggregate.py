"""Aggregate a jax.profiler trace (scripts/trace_kde.py output) into
per-named-scope and per-source-line device-time tables.

This is the attribution tool behind the round-3 optimisation work (PERF.md
"Design rules" #7): chained isolated-stage timings under-report ops that XLA
fuses differently in the composed program; the trace is ground truth.

Usage:
    python scripts/trace_kde.py --out /tmp/kde_trace   # capture (3 runs)
    python scripts/trace_aggregate.py /tmp/kde_trace [--runs 3] [--top 30]
"""

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}/plugins/profile/")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"]


def device_durations(events):
    """X-phase events on TPU/device lanes, minus the whole-module envelope."""
    names = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = str(names.get(e["pid"], ""))
        if "TPU" not in pname and "/device" not in pname:
            continue
        if e["name"].startswith("jit_"):  # module envelope, double-counts
            continue
        yield e


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kde_trace"
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 30

    by_scope: collections.Counter = collections.Counter()
    by_src: collections.Counter = collections.Counter()
    total = 0.0
    for e in device_durations(load_events(trace_dir)):
        a = e.get("args", {})
        total += e["dur"]
        parts = a.get("tf_op", "").split("/")
        by_scope[parts[1] if len(parts) > 1 else "(unscoped)"] += e["dur"]
        by_src[a.get("source", "(no source)")] += e["dur"]

    print(f"total device op time: {total / (1000 * runs):.2f} ms/run\n")
    print("== by named scope (ms/run) ==")
    for s, us in by_scope.most_common(top):
        print(f"{us / (1000 * runs):8.3f}  {s}")
    print("\n== by source line (ms/run) ==")
    for s, us in by_src.most_common(top):
        print(f"{us / (1000 * runs):8.3f}  {s}")


if __name__ == "__main__":
    main()
