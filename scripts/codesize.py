"""Attribute compiled-program CODE SIZE (deviceless TPU compile).

aotcheck.py reports 118-238 MB executables; this script finds WHERE the
bytes go: compiles the full detect like aotcheck, then ranks optimized-HLO
computations by instruction count and total text size, groups Mosaic
custom-calls (each embeds a serialized kernel binary whose size shows up
in the executable), and prints per-computation-kind totals.

Usage: python scripts/codesize.py [WxH] [top]
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

from aotcheck import compile_detect  # noqa: E402
from jax.experimental import topologies  # noqa: E402


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "640x480"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    w, h = map(int, wh.split("x"))

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    compiled, t_lower, t_compile = compile_detect(w, h, topo)
    ma = compiled.memory_analysis()
    code_mb = getattr(ma, "generated_code_size_in_bytes", 0) / 1e6
    print(f"{w}x{h}: lower {t_lower:.1f}s compile {t_compile:.1f}s "
          f"code {code_mb:.1f}MB")

    txt = compiled.as_text()
    # Split into computations: lines "%name (param...) -> ... {" or
    # "ENTRY %name ...". Count instructions (lines with " = ") per comp.
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"\s*(ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\)\s*->.*{", line)
        if m:
            cur = m.group(2)
            comps[cur] = dict(instrs=0, bytes=0, calls=0)
            continue
        if cur is None:
            continue
        comps[cur]["bytes"] += len(line)
        if " = " in line:
            comps[cur]["instrs"] += 1

    total_i = sum(c["instrs"] for c in comps.values())
    print(f"{len(comps)} computations, {total_i} instructions, "
          f"HLO text {len(txt)/1e6:.1f} MB")

    # Mosaic kernels: custom-calls with tpu_custom_call; their payload is
    # in backend_config (kernel binary size correlates with config len).
    mosaic = re.findall(r'custom-call.*?custom_call_target="tpu_custom_call"',
                        txt)
    print(f"tpu_custom_call sites: {len(mosaic)}")

    # Group computations by stripped name (bucket clones share prefixes).
    def group(name):
        g = re.sub(r"[\d\.]+$", "", name)
        g = re.sub(r"_\d+_", "_N_", g)
        return g

    by_group = collections.Counter()
    gi = collections.Counter()
    for name, c in comps.items():
        by_group[group(name)] += c["bytes"]
        gi[group(name)] += c["instrs"]

    print(f"\n== top {top} computation groups by HLO text bytes ==")
    for g, b in by_group.most_common(top):
        print(f"  {b/1e6:8.2f} MB  {gi[g]:7d} instr  {g}")


if __name__ == "__main__":
    main()
