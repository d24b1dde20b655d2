"""Dump ALL ops of one scope from a tracebench trace dir, sorted by time.

Usage: python scripts/tracedump.py TRACE_DIR [SCOPE] [min_ms]
SCOPE is a substring of the named scope ('?' for unattributed); omit for all.
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

ITERS = 8


def main():
    tdir = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else None
    min_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {pid for pid, n in proc_names.items()
                if ("TPU" in n or "/device" in n.lower()) and "Steps" not in n}

    by_op = collections.Counter()
    op_count = collections.Counter()
    metas = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        by_op[name] += e.get("dur", 0)
        op_count[name] += 1
        if name not in metas:
            args = e.get("args", {}) or {}
            metas[name] = str(args.get("tf_op") or args.get("long_name")
                              or "")[:140]

    total = 0.0
    for name, d in by_op.most_common():
        ms = d / ITERS / 1e3
        if ms < min_ms:
            break
        meta = metas[name]
        if want and want != "?" and want not in meta and want not in name:
            continue
        if want == "?" and ("/" in meta):
            continue
        total += ms
        print(f"{ms:8.3f} x{op_count[name]/ITERS:5.1f}  {name[:60]:60s} "
              f"{meta}")
    print(f"\nshown total: {total:.2f} ms/frame")


if __name__ == "__main__":
    main()
