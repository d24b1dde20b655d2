"""Name the glue tail from the OPTIMIZED TPU HLO — no hardware needed.

Deviceless-compiles the full detect for a v5e topology (see aotcheck.py),
then walks the optimized HLO entry computation: every top-level
instruction is one executed TPU "program step" (fusion, custom-call,
convolution, while, ...). For each, we record output bytes + operand
bytes and the deepest vulkansift_tpu source line from op metadata, and
estimate a time floor:

    t_op >= max(bytes_touched / HBM_BW, DISPATCH_FLOOR)

The XProf trace showed ~12 ms of sub-0.3 ms fusions at 1536x1024
(docs/PERFORMANCE.md); this census names them: which pipeline lines emit
how many tiny ops, and what their aggregate dispatch-floor cost is.
Timing stays approximate (serialization, queueing and VMEM effects are
not modeled) — use the trace for truth, this for attribution + counting
while the chip is away.

Usage: python scripts/hlocount.py [WxH] [top] [--xla]
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

import os

os.environ["VKSIFT_ASSUME_TPU"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HBM_BW = 810e9          # v5e HBM bandwidth, bytes/s
DISPATCH_FLOOR = 2e-6   # per-executed-op floor, s (measured 1-3 us on v5e)
TINY_THRESHOLD = 3e-4   # "tail" op: < 0.3 ms


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    wh = args[0] if args else "1536x1024"
    top = int(args[1]) if len(args) > 1 else 30
    backhalf = "xla" if "--xla" in sys.argv else "pallas"
    w, h = map(int, wh.split("x"))

    from scripts.aotcheck import compile_detect
    from jax.experimental import topologies

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    compiled, t_low, t_comp = compile_detect(w, h, topo, backhalf=backhalf)
    print(f"# compiled {wh} backhalf={backhalf}: lower {t_low:.0f}s, "
          f"compile {t_comp:.0f}s")
    text = compiled.as_text()

    # Shape byte sizes: f32[8,128]{...} etc.
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1,
                "f64": 8, "s64": 8, "u64": 8}

    def shape_bytes(shape_str):
        total = 0
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
            dt, dims = m.group(1), m.group(2)
            if dt not in dt_bytes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dt_bytes[dt]
        return total

    # Entry computation = the block containing ROOT whose name starts with
    # ENTRY.
    entry = re.search(r"ENTRY [^\{]*\{(.*?)\n\}", text, re.S)
    assert entry, "no ENTRY computation found"
    body = entry.group(1)

    # Fusions carry no metadata themselves; attribute each to the most
    # common op_name scope among its fused computation's instructions.
    comp_scope = {}
    for m in re.finditer(r"\n%?([\w.\-]+) [^\n]*\{(.*?)\n\}", text, re.S):
        cname, cbody = m.groups()
        scopes = collections.Counter(
            re.findall(r'op_name="([^"]*)"', cbody))
        if scopes:
            comp_scope[cname] = scopes.most_common(1)[0][0]
        srcs = collections.Counter(
            f.rsplit("/", 1)[-1] + ":" + ln for f, ln in re.findall(
                r'source_file="([^"]*vulkansift_tpu[^"]*)".*?source_line=(\d+)',
                cbody))
        if srcs:
            comp_scope[cname + "/src"] = srcs.most_common(1)[0][0]

    ops = []
    for line in body.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ([^=]+?) ([\w\-]+)\(", line)
        if not m:
            continue
        name, shape_str, opkind = m.groups()
        if opkind in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        out_b = shape_bytes(shape_str)
        src = None
        mm = re.search(r'op_name="([^"]*)"', line)
        scope = mm.group(1) if mm else ""
        sm = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        if sm and "vulkansift_tpu" in sm.group(1):
            src = sm.group(1).rsplit("/", 1)[-1] + ":" + sm.group(2)
        if not scope or not src:
            # fusions: inherit from the fused computation
            cm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", line)
            if cm:
                scope = scope or comp_scope.get(cm.group(1), "")
                src = src or comp_scope.get(cm.group(1) + "/src")
        # rough traffic: output + output again for reads (operands usually
        # fused); use 2x output bytes as the floor traffic.
        t_est = max(2 * out_b / HBM_BW, DISPATCH_FLOOR)
        ops.append((name, opkind, out_b, t_est, scope, src or "?"))

    total_t = sum(o[3] for o in ops)
    tiny = [o for o in ops if o[3] < TINY_THRESHOLD]
    print(f"# executed top-level ops: {len(ops)}, est floor "
          f"{total_t*1e3:.1f} ms; tiny(<0.3ms-est) ops: {len(tiny)} "
          f"({sum(o[3] for o in tiny)*1e3:.1f} ms est)")

    def stage_of(scope):
        parts = [p for p in scope.split("/") if p and "jit(" not in p]
        return parts[0] if parts else "?"

    by_stage = collections.Counter()
    t_by_stage = collections.defaultdict(float)
    by_line = collections.Counter()
    t_by_line = collections.defaultdict(float)
    for name, opkind, out_b, t_est, scope, src in ops:
        by_stage[stage_of(scope)] += 1
        t_by_stage[stage_of(scope)] += t_est
        by_line[src or "?"] += 1
        t_by_line[src or "?"] += t_est
    print("\n## per stage (ops, est floor)")
    for st, t in sorted(t_by_stage.items(), key=lambda kv: -kv[1]):
        print(f"{t*1e3:8.2f} ms {by_stage[st]:5d} ops  {st}")
    print(f"\n## top {top} source lines by estimated floor time")
    for src, t in sorted(t_by_line.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t*1e3:8.2f} ms {by_line[src]:5d} ops  {src}")

    print(f"\n## top {top} single ops by estimated floor time")
    for name, opkind, out_b, t_est, scope, src in sorted(
            ops, key=lambda o: -o[3])[:top]:
        print(f"{t_est*1e3:8.2f} ms {out_b/1e6:8.2f} MB {opkind:12s} "
              f"{src:26s} {scope[:60]}")


if __name__ == "__main__":
    main()
