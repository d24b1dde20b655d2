"""Deviceless TPU compile check: run the REAL Mosaic/XLA-TPU compiler
locally (libtpu compile-only client via jax.experimental.topologies) with
no TPU attached.

Interpret-mode tests validate kernel *semantics*; this validates the
*lowering* — Mosaic rejections (unsupported rolls/reshapes/dots), VMEM
overflows, and XLA-TPU compile errors — for the exact program that runs
on hardware, without the tunnel. Prints compile time + memory analysis
per configuration.

Usage:  python scripts/aotcheck.py [WxH ...]   (default: the 3 headline
resolutions; compiles the full single-image detect, pallas backhalf)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["VKSIFT_ASSUME_TPU"] = "1"  # pick TPU formulations when lowering

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def compile_detect(w, h, topo, backhalf="pallas"):
    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.pipeline import make_detect_fn

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=16384,
                     sift_buffer_count=1,
                     input_image_max_size=w * h)
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    s = NamedSharding(mesh, P())
    detect = jax.jit(make_detect_fn(cfg, w, h, backhalf=backhalf),
                     in_shardings=s, out_shardings=s)
    spec = jax.ShapeDtypeStruct((h, w), np.uint8)
    t0 = time.time()
    lowered = detect.lower(spec)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    return compiled, t1 - t0, t2 - t1


def compile_multichip(topo):
    """Compile the REAL multi-chip programs (DP detect + ppermute-ring
    2-NN) for all 4 chips of the v5e 2x2 topology — validates the
    TPU lowering of the sharded paths incl. ICI collectives, which the
    CPU virtual-mesh dryrun cannot."""
    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.parallel import make_dp_detect_fn, make_ring_match_fn

    w, h = 640, 480
    cfg = SiftConfig(use_input_upsampling=False,
                     max_nb_sift_per_buffer=4096,
                     sift_buffer_count=1,
                     input_image_max_size=w * h)
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
    n = len(topo.devices)

    t0 = time.time()
    dp = make_dp_detect_fn(cfg, w, h, mesh, backhalf="pallas")
    dp.lower(jax.ShapeDtypeStruct((2 * n, h, w), np.uint8)).compile()
    t1 = time.time()
    print(f"multichip dp detect ({n} chips): OK  {t1 - t0:.1f}s")

    ring = make_ring_match_fn(mesh)
    ring.lower(
        jax.ShapeDtypeStruct((4096, 128), np.uint8),
        jax.ShapeDtypeStruct((), np.int32),
        jax.ShapeDtypeStruct((4096, 128), np.uint8),
        jax.ShapeDtypeStruct((), np.int32)).compile()
    print(f"multichip ring match ({n} chips): OK  {time.time() - t1:.1f}s")


def main():
    whs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "640x480", "1536x1024", "3456x2304"]
    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    if "--multichip" in sys.argv:
        compile_multichip(topo)
        return
    print(f"# topology: {topo.platform_version if hasattr(topo, 'platform_version') else 'v5e'}"
          f" ({len(topo.devices)} devices, compiling single-chip)")
    failures = 0
    for wh in whs:
        w, h = map(int, wh.lower().split("x"))
        try:
            compiled, t_low, t_comp = compile_detect(w, h, topo)
            m = compiled.memory_analysis()
            print(f"{wh}: OK  lower {t_low:.1f}s  compile {t_comp:.1f}s  "
                  f"code {m.generated_code_size_in_bytes/1e6:.1f}MB  "
                  f"temp {m.temp_size_in_bytes/1e9:.2f}GB  "
                  f"args {m.argument_size_in_bytes/1e6:.1f}MB")
        except Exception as e:  # noqa: BLE001
            failures += 1
            msg = str(e).replace("\n", " | ")[:600]
            print(f"{wh}: FAIL  {type(e).__name__}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
