"""Trace-parsing helpers for per-op device-time attribution.

``jax.profiler.trace`` writes a Perfetto/chrome-trace export alongside the
XPlane protobuf; :func:`report_device_ops` aggregates the device timeline's
events by op name and prints the top entries. Shared by
``tools/bench_train_step.py --profile`` and ``tools/profile_inference.py``
(the TPU-side counterpart of the reference's ``torch.profiler`` trace handler,
/root/reference/allophant/estimator.py:405-418).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Dict


def report_device_ops(trace_dir: str, steps: int, top: int = 40) -> None:
    """Prints per-op device time from the newest trace.json.gz under ``trace_dir``.

    The device timeline lives in the trace-event pid whose process_name metadata
    mentions the TPU device; events are aggregated by name across occurrences and
    normalized by ``steps``.
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace written (profiler unsupported on this backend?)")
        return
    with gzip.open(paths[-1], "rt", encoding="utf-8") as handle:
        trace = json.load(handle)
    events = trace.get("traceEvents", [])
    device_pids = set()
    for event in events:
        if event.get("ph") == "M" and event.get("name") == "process_name":
            name = event.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                device_pids.add(event["pid"])
    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    for event in events:
        if event.get("ph") == "X" and event.get("pid") in device_pids:
            totals[event["name"]] += event.get("dur", 0.0)
            counts[event["name"]] += 1
    grand = sum(totals.values())
    if not grand:
        print("no device events found in trace")
        return
    print(f"device total: {grand / 1e3 / steps:.1f} ms/step over {steps} steps")
    for name, micros in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(
            f"{micros / 1e3 / steps:9.2f} ms/step {100 * micros / grand:5.1f}%"
            f" x{counts[name] // steps:<4d} {name[:110]}"
        )
