"""Name the glue tail from the OPTIMIZED TPU HLO — no hardware needed.

Deviceless-compiles the full detect for a v5e topology (see aotcheck.py),
then walks the optimized HLO entry computation: every top-level
instruction is one executed TPU "program step" (fusion, custom-call,
convolution, while, ...). Each is attributed to its named-scope stage and
deepest vulkansift_tpu source line (scripts/hloattr.py — fusions inherit
their fused computation's metadata), and gets a time-floor estimate:

    t_op >= max(bytes_touched / HBM_BW, DISPATCH_FLOOR)

``dynamic-update-slice``-rooted fusions are IN-PLACE on TPU (verified by
compiling a toy DUS chain: temp memory 0 bytes), so for `*dynamic-update-
slice*` fusions bytes_touched counts only the update operands, not the
full output.

Timing stays approximate (serialization, queueing, VMEM effects are not
modeled) — use scripts/tracebench.py on hardware for truth; use this for
attribution + op counting while the chip is away.

Usage: python scripts/hlocount.py [WxH] [top] [--xla]
"""

import collections
import os
import re
import sys

sys.path.insert(0, "/root/repo")

os.environ["VKSIFT_ASSUME_TPU"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import hloattr  # noqa: E402

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
    attr = hloattr.build_attr(text)

    ops = []
    for name, opkind, shape_str, line in hloattr.entry_instructions(text):
        out_b = hloattr.shape_bytes(shape_str)
        if "dynamic-update-slice" in name or "dynamic-update-slice" in line.split("(")[0]:
            # in-place: traffic = the update operands only; approximate
            # with the smaller operand shapes present on the line past the
            # output (cheap heuristic: 10% of output, floored).
            out_b = out_b // 10
        scope, src = attr.get(name, ("?", "?"))
        t_est = max(2 * out_b / HBM_BW, DISPATCH_FLOOR)
        ops.append((name, opkind, out_b, t_est, scope, src))

    total_t = sum(o[3] for o in ops)
    tiny = [o for o in ops if o[3] < TINY_THRESHOLD]
    print(f"# executed top-level ops: {len(ops)}, est floor "
          f"{total_t*1e3:.1f} ms; tiny(<0.3ms-est) ops: {len(tiny)} "
          f"({sum(o[3] for o in tiny)*1e3:.1f} ms est)")

    by_stage = collections.Counter()
    t_by_stage = collections.defaultdict(float)
    by_line = collections.Counter()
    t_by_line = collections.defaultdict(float)
    for name, opkind, out_b, t_est, scope, src in ops:
        st = hloattr.stage_of(scope)
        by_stage[st] += 1
        t_by_stage[st] += t_est
        by_line[src] += 1
        t_by_line[src] += t_est
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
              f"{src:26s} {scope[:56]}")


if __name__ == "__main__":
    main()
