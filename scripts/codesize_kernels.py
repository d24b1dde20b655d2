"""Per-kernel generated-code sizes (deviceless TPU compile).

codesize_stages.py attributes 149.5 of 208.5 MB to the descriptor stage
at 640x480; this compiles each back-half kernel (and the desc merge) in
isolation to find which one carries the bytes.

Usage: python scripts/codesize_kernels.py
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
    import jax.numpy as jnp
    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import pallas_backhalf as pb

    cfg = SiftConfig()
    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    sh = NamedSharding(mesh, P())

    cap = 16384
    h_atlas, w_atlas = 1024, 768
    gauss = jax.ShapeDtypeStruct((5, h_atlas, w_atlas), np.float32)
    count = jax.ShapeDtypeStruct((), np.int32)
    addr = jax.ShapeDtypeStruct((cap,), np.int32)
    meta8 = jax.ShapeDtypeStruct((cap, 1, 8), np.float32)
    meta16 = jax.ShapeDtypeStruct((cap, 1, 16), np.float32)

    wrs = pb.kernel_window_rows(cfg)
    edges = pb.desc_bucket_edges(cfg)
    sig_max = pb._sigma_max(cfg, cfg.nb_scales_per_octave + 1)
    ori_edge = pb.ori_window_edge(sig_max)
    ori_geom = pb._KernelGeom(wr=pb._window_rows(ori_edge), wc=256,
                              h8=h_atlas, w32=w_atlas)

    def size_of(name, fn, *specs):
        t0 = time.time()
        c = jax.jit(fn, in_shardings=sh, out_shardings=sh).lower(
            *specs).compile()
        mb = c.memory_analysis().generated_code_size_in_bytes / 1e6
        print(f"{name:>28s}: {mb:8.1f} MB  compile {time.time() - t0:6.1f}s",
              flush=True)

    size_of("hist (unpacked)",
            lambda g, c, a, m: pb.orientation_hist_tpu(
                g, c, a, m, geom=ori_geom),
            gauss, count, addr, meta8)

    for b in range(len(edges)):
        geom = pb._KernelGeom(wr=wrs[b], wc=256, h8=h_atlas, w32=w_atlas)
        if edges[b] <= pb._PACK_MAX_EDGE:
            size_of(f"desc packed b{b} (wr={wrs[b]})",
                    lambda g, c, a, m, geom=geom, e=edges[b]:
                    pb.descriptor_tpu_packed(
                        g, c, a, m, geom=geom, edge=e, use_vlfeat=False,
                        deinterleave=False),
                    gauss, count, addr, meta16)
        else:
            size_of(f"desc unpacked b{b} (wr={wrs[b]})",
                    lambda g, c, a, m, geom=geom: pb.descriptor_tpu(
                        g, c, a, m, geom=geom),
                    gauss, count, addr, meta16)


if __name__ == "__main__":
    main()
