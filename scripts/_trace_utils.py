"""Shared jax.profiler trace parsing for the scripts/trace_*.py probes."""

from __future__ import annotations

import glob
import gzip
import json
from collections import defaultdict


def load_device_ops(trace_dir: str) -> tuple[dict[str, float], dict[str, int], float]:
    """Aggregate device-op durations from a ``jax.profiler.trace`` capture.

    Returns (ms_by_op_name, count_by_op_name, total_ms). Raises RuntimeError
    with a actionable message when no trace file or no device events exist
    (e.g. profiler plugin unavailable, or the run landed on a non-TPU
    backend whose pids aren't labeled "TPU").
    """
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise RuntimeError(
            f"no trace file under {trace_dir}/plugins/profile — profiler "
            "produced no capture on this backend"
        )
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pid_names.items() if n and "TPU" in n}
    if not device_pids:
        raise RuntimeError(
            "no TPU device pids in the trace (backend was "
            f"{sorted(set(filter(None, pid_names.values())))[:5]}) — run on "
            "the TPU backend"
        )

    by_name: dict[str, float] = defaultdict(float)
    count: dict[str, int] = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            if e["name"].startswith("jit_"):
                continue
            by_name[e["name"]] += e["dur"] / 1000.0
            count[e["name"]] += 1
            total += e["dur"] / 1000.0
    return dict(by_name), dict(count), total


def print_top_ops(
    by_name: dict[str, float], count: dict[str, int], top: int = 35
) -> None:
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:9.3f} ms  x{count[name]:4d}  {name[:90]}")
