"""Summarize a jax.profiler Chrome trace (vm.trace.json.gz) op-by-op.

Self-contained replacement for the tensorboard hlo_stats converter (whose
generated protobufs don't load under this environment's protobuf): reads
the trace events' hlo_category / model_flops / bytes_accessed args
directly and prints per-category and per-op tables with achieved TF/s and
HBM GB/s.

Usage: python benchmarks/trace_summary.py <trace.json.gz> [n_steps]
"""

import collections
import gzip
import json
import re
import sys


def load_device_events(path):
    tr = json.load(gzip.open(path))
    events = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in str(pids.get(e["pid"], "")):
            continue
        args = e.get("args", {})
        if "hlo_category" not in args:
            continue  # step markers / modules
        dev.append(e)
    return dev


def summarize(path, n_steps=None):
    dev = load_device_events(path)
    if n_steps is None:
        # infer from the most common op count
        counts = collections.Counter(e["name"] for e in dev)
        n_steps = collections.Counter(counts.values()).most_common(1)[0][0]
    per_op = {}
    for e in dev:
        a = e["args"]
        o = per_op.setdefault(e["name"], dict(
            us=0.0, n=0, flops=float(a.get("model_flops", 0) or 0),
            bytes=float(a.get("bytes_accessed", 0) or 0),
            cat=a.get("hlo_category", "?"),
            long=a.get("long_name", "")))
        o["us"] += e["dur"]
        o["n"] += 1
    cats = collections.defaultdict(lambda: [0.0, 0.0])
    for o in per_op.values():
        cats[o["cat"]][0] += o["us"]
        cats[o["cat"]][1] += o["flops"] * o["n"]
    total_us = sum(o["us"] for o in per_op.values())
    print(f"device-busy {total_us / n_steps / 1e3:.2f} ms/step over "
          f"{n_steps} steps, {len(per_op)} distinct ops")
    print(f"\n{'category':<28}{'ms/step':>9}{'%':>6}{'TF/s':>8}")
    for cat, (us, fl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        tfs = fl / (us * 1e-6) / 1e12 if us else 0
        print(f"{cat:<28}{us / n_steps / 1e3:9.2f}"
              f"{100 * us / total_us:6.1f}{tfs:8.1f}")
    print(f"\n{'op':<34}{'ms/step':>8}{'%':>6}{'TF/s':>7}{'GB/s':>7}  shape")
    for name, o in sorted(per_op.items(), key=lambda kv: -kv[1]["us"])[:28]:
        us = o["us"]
        tfs = o["flops"] * o["n"] / (us * 1e-6) / 1e12 if us else 0
        gbs = o["bytes"] * o["n"] / (us * 1e-6) / 1e9 if us else 0
        shape = re.match(r"%\S+ = (\S+?)\{", o["long"])
        print(f"{name:<34}{us / n_steps / 1e3:8.2f}"
              f"{100 * us / total_us:6.1f}{tfs:7.1f}{gbs:7.0f}  "
              f"{shape.group(1) if shape else ''}")
    return per_op


if __name__ == "__main__":
    summarize(sys.argv[1],
              int(sys.argv[2]) if len(sys.argv) > 2 else None)
