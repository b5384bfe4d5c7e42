"""Summarize a jax.profiler trace: top device ops by total time.

Usage: python benchmarks/profile_summary.py /tmp/trace_dir [--steps N]

Reads the Chrome-trace export (vm.trace.json.gz) the profiler writes next to
the xplane file, keeps events on the TPU "XLA Ops" lanes, groups by op name
(stripping fusion-instance suffixes), and prints total-ms / count / avg-us,
normalized per train step when the trace spans N identical steps.
"""

from __future__ import annotations

import argparse
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--like", type=str, default=None,
                    help="only show ops whose name matches this regex")
    ap.add_argument("--exact", action="store_true",
                    help="keep per-instance op names (fusion.123) instead of "
                         "grouping by family — match them in an HLO dump")
    args = ap.parse_args(argv)

    gzs = sorted(Path(args.trace_dir).rglob("*.trace.json.gz"))
    assert gzs, f"no .trace.json.gz under {args.trace_dir}"
    with gzip.open(gzs[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # map (pid, tid) -> lane name; find TPU device pids and their XLA Ops lanes
    tid_names: dict[tuple, str] = {}
    pid_names: dict[int, str] = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = ev["args"]["name"]
            elif ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"]["name"]
    op_lanes = {
        k for k, v in tid_names.items()
        if v.startswith("XLA Ops") and "TPU" in pid_names.get(k[0], "")
    }

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    device_total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or (ev["pid"], ev["tid"]) not in op_lanes:
            continue
        name = ev["name"] if args.exact else re.sub(r"\.\d+$", "", ev["name"])
        ms = ev.get("dur", 0) / 1e3
        totals[name] += ms
        counts[name] += 1
        device_total += ms

    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    if args.like:
        rx = re.compile(args.like)
        rows = [r for r in rows if rx.search(r[0])]
    print(f"device op time total: {device_total:.2f} ms "
          f"({device_total / args.steps:.2f} ms/step over {args.steps} steps)")
    print(f"{'ms/step':>9}  {'count':>6}  {'avg us':>8}  op")
    for name, ms in rows[: args.top]:
        n = counts[name]
        print(f"{ms / args.steps:9.3f}  {n:6d}  {ms / n * 1e3:8.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
