"""Aggregate per-op device time from a jax.profiler trace.

Usage: python scripts/parse_trace.py /tmp/flux_trace [top_n]

Reads the newest *.trace.json.gz under the trace dir, keeps events on the
device lanes (pid whose name contains "TPU" / "device"), groups durations
by a normalized op name, and prints a sorted table. This is the only
reliable per-op breakdown over the axon relay (block_until_ready does not
track completion; wall-clock timings are host-side noise).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(trace_dir: str) -> dict:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f)


def normalize(name: str) -> str:
    """Strip uniquifying suffixes so fusion variants aggregate."""
    name = re.sub(r"\.\d+", "", name)
    name = re.sub(r"_\d+$", "", name)
    return name


def main() -> int:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flux_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data = load_trace(trace_dir)
    events = data.get("traceEvents", [])

    # find device pids
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if "TPU" in name or "device" in name.lower()
    }

    by_op = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = normalize(e.get("name", "?"))
        by_op[name] += dur
        calls[name] += 1
        total += dur

    print(f"device pids: {sorted(device_pids)}  total device time: {total:.3f}s")
    print(f"{'op':60s} {'time_s':>9s} {'%':>6s} {'calls':>7s}")
    for name, t in by_op.most_common(top_n):
        print(f"{name[:60]:60s} {t:9.3f} {100*t/max(total,1e-9):6.1f} {calls[name]:7d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
