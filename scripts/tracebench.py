"""XProf trace attribution for the detect pipeline: name the glue tail.

Runs the full jitted detect at a given resolution under
``jax.profiler.start_trace``, then parses the produced trace
(``*.trace.json.gz``) and aggregates per-HLO-op device time by (a) the
``jax.named_scope`` pipeline stage embedded in the op metadata and (b) the
individual op name — printing the top-K ops so every sub-0.3 ms fusion in
the "long tail" gets a name and a pipeline line to blame.

Usage:  python scripts/tracebench.py [WxH] [iters] [top]
Output: per-stage table + top-K op table (ms per frame, averaged).
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    for cell in (8, 16, 32, 64):
        small = rng.random((h // cell + 1, w // cell + 1))
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        yi, xi = ys.astype(int), xs.astype(int)
        fy, fx = (ys - yi)[:, None], (xs - xi)[None, :]
        img += ((1 - fy) * (1 - fx) * small[yi][:, xi]
                + (1 - fy) * fx * small[yi][:, xi + 1]
                + fy * (1 - fx) * small[yi + 1][:, xi]
                + fy * fx * small[yi + 1][:, xi + 1])
    img -= img.min()
    return (255 * img / img.max()).astype(np.uint8)


def load_trace_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace files under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_ops(events):
    """Yield (name, dur_us, args) for complete events on the TPU device
    track (skip host threads and derived lines)."""
    # Find pids whose process name mentions TPU / device.
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {pid for pid, n in proc_names.items()
                if ("TPU" in n or "/device" in n.lower()) and "Steps" not in n}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        yield name, e.get("dur", 0), e.get("args", {}) or {}


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1536x1024"
    w, h = map(int, wh.split("x"))
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.pipeline import make_detect_fn

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=32768,
                     sift_buffer_count=2,
                     input_image_max_size=w * h)
    detect = jax.jit(make_detect_fn(cfg, w, h))
    img = jnp.asarray(bench_image(h, w))

    # Attribution map from the executable's own HLO: trace event names ==
    # HLO instruction names, and fusions that carry no metadata inherit
    # their fused computation's scope (scripts/hloattr.py) — this is what
    # names the "unattributed sub-0.3ms fusion tail".
    hlo_attr = {}
    try:
        import hloattr
        hlo_attr = hloattr.build_attr(
            detect.lower(img).compile().as_text())
        print(f"# hlo attribution: {len(hlo_attr)} instructions")
    except Exception as e:  # noqa: BLE001
        print(f"# hlo attribution unavailable: {type(e).__name__}: {e}")

    n = int(detect(img).features.count)
    print(f"# {w}x{h}, {n} features; tracing {iters} frames")
    for _ in range(3):
        int(detect(img).features.count)

    tdir = tempfile.mkdtemp(prefix="vstrace_")
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        out = detect(img)
    int(out.features.count)
    jax.profiler.stop_trace()

    events = list(device_ops(load_trace_events(tdir)))
    by_op = collections.Counter()
    op_count = collections.Counter()
    by_scope = collections.Counter()
    samples = {}
    for name, dur, args in events:
        by_op[name] += dur
        op_count[name] += 1
        # tf_op / long_name metadata carries the named_scope path.
        meta = (args.get("tf_op") or args.get("long_name")
                or args.get("hlo_op") or "")
        # The HLO-derived map resolves fusions with no metadata.
        hname = name.lstrip("%")
        hscope, hsrc = hlo_attr.get(hname, ("", "?"))
        scope = "?"
        for s in ("ScaleSpace", "ExtractKeypoints", "AtlasBuild",
                  "ComputeOrientation", "ComputeDescriptors",
                  "PackFeatures", "Matching"):
            if (s in str(meta) or s in str(args) or s in hscope):
                scope = s
                break
        by_scope[scope] += dur
        if name not in samples:
            samples[name] = (scope, (str(meta) or hscope)[:80]
                             + (f" @{hsrc}" if hsrc != "?" else ""))

    total = sum(by_op.values())
    print(f"\ntotal device time: {total / iters / 1e3:.2f} ms/frame "
          f"({len(by_op)} distinct ops, {sum(op_count.values())} events)")

    print("\n== by named scope (ms/frame) ==")
    for s, d in by_scope.most_common():
        print(f"  {s:22s} {d / iters / 1e3:8.3f}")

    print(f"\n== top {top} ops (ms/frame, count/frame) ==")
    shown = 0.0
    for name, d in by_op.most_common(top):
        scope, meta = samples[name]
        shown += d
        print(f"  {d / iters / 1e3:7.3f}  x{op_count[name] / iters:5.1f} "
              f" [{scope:>18s}] {name[:80]}")
        if meta and meta != name:
            print(f"           {meta}")
    rest = total - shown
    print(f"  {rest / iters / 1e3:7.3f}  (everything below top {top}: "
          f"{len(by_op) - top} ops)")
    print(f"\ntrace dir: {tdir}")


if __name__ == "__main__":
    main()
