"""Bisect the descriptor-stage code bloat (deviceless TPU compile).

codesize_stages: desc stage = +149.5 MB at 640x480. codesize_kernels:
the Mosaic kernels are 0.2-0.3 MB each — the bytes are in XLA glue.
Probes:
  A: full pipeline, stock                      (baseline, ~208 MB)
  B: pallas_backhalf._bucket_sizes -> [cap]    (no pair/merge buckets)
  C: B + extract.bucket_sizes -> [cap]         (no refine/compact buckets)

Usage: python scripts/codesize_bisect.py [WxH]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["VKSIFT_ASSUME_TPU"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "640x480"
    w, h = map(int, wh.split("x"))

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import extract, pallas_backhalf
    from vulkansift_tpu.pipeline import make_detect_fn

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    sh = NamedSharding(mesh, P())
    spec = jax.ShapeDtypeStruct((h, w), np.uint8)

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=16384,
                     sift_buffer_count=1,
                     input_image_max_size=w * h)

    def compile_size(tag):
        t0 = time.time()
        detect = make_detect_fn(cfg, w, h, backhalf="pallas")
        c = jax.jit(detect, in_shardings=sh, out_shardings=sh).lower(
            spec).compile()
        mb = c.memory_analysis().generated_code_size_in_bytes / 1e6
        print(f"{tag}: {mb:8.1f} MB  compile {time.time() - t0:6.1f}s",
              flush=True)

    compile_size("A stock            ")

    orig_bs = pallas_backhalf._bucket_sizes
    pallas_backhalf._bucket_sizes = lambda total, lo=4096: [total]
    compile_size("B no-backhalf-bkts ")

    orig_es = extract.bucket_sizes
    extract.bucket_sizes = lambda total, lo=2048: [total]
    try:
        compile_size("C no-extract-bkts  ")
    finally:
        pallas_backhalf._bucket_sizes = orig_bs
        extract.bucket_sizes = orig_es


def probe_more():
    """D: stub normalize; E: also stub the desc merge row-gathers."""
    wh = sys.argv[2] if len(sys.argv) > 2 else "640x480"
    w, h = map(int, wh.split("x"))
    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import descriptor as desc_mod
    from vulkansift_tpu.ops import pallas_backhalf
    from vulkansift_tpu.pipeline import make_detect_fn
    import jax.numpy as jnp

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    sh = NamedSharding(mesh, P())
    spec = jax.ShapeDtypeStruct((h, w), np.uint8)
    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=16384,
                     sift_buffer_count=1,
                     input_image_max_size=w * h)

    def compile_size(tag):
        t0 = time.time()
        detect = make_detect_fn(cfg, w, h, backhalf="pallas")
        c = jax.jit(detect, in_shardings=sh, out_shardings=sh).lower(
            spec).compile()
        mb = c.memory_analysis().generated_code_size_in_bytes / 1e6
        print(f"{tag}: {mb:8.1f} MB  compile {time.time() - t0:6.1f}s",
              flush=True)

    orig_norm = desc_mod.normalize_descriptor
    desc_mod.normalize_descriptor = lambda d: jnp.zeros(
        d.shape, jnp.uint8)
    compile_size("D stub-normalize   ")

    orig_dp = pallas_backhalf.descriptor_tpu_packed
    orig_du = pallas_backhalf.descriptor_tpu

    def fake_packed(g, c, a, m, *, geom, edge, use_vlfeat,
                    deinterleave=False):
        capp = a.shape[0]
        return jnp.zeros(((capp + 1) // 2, 16, 16), jnp.float32)

    def fake_unpacked(g, c, a, m, *, geom, use_vlfeat):
        capp = a.shape[0]
        return jnp.zeros((capp, 16, 8), jnp.float32)

    pallas_backhalf.descriptor_tpu_packed = fake_packed
    pallas_backhalf.descriptor_tpu = fake_unpacked
    try:
        compile_size("E stub-desc-kernels")
    finally:
        pallas_backhalf.descriptor_tpu_packed = orig_dp
        pallas_backhalf.descriptor_tpu = orig_du
        desc_mod.normalize_descriptor = orig_norm


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "more":
        probe_more()
    else:
        main()
