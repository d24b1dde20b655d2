"""Deviceless Mosaic compile bisect for every Pallas kernel entry.

aotcheck.py compiles the whole detect program; when it fails this tool
names the kernel: each public Pallas entry (frontend, K1 hist packed +
unpacked, K2 descriptor packed + unpacked per sigma bucket) is AOT
compiled in isolation for a v5e topology (libtpu compile-only client).

Usage: python scripts/kernelcheck.py
"""

import functools
import os
import sys

sys.path.insert(0, "/root/repo")

os.environ["VKSIFT_ASSUME_TPU"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import pallas_backhalf as pb
    from vulkansift_tpu.ops import pallas_frontend as pf

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    sh = NamedSharding(mesh, P())

    def aot(name, fn, *specs):
        try:
            jf = jax.jit(fn, in_shardings=sh, out_shardings=sh)
            jf.lower(*specs).compile()
            print(f"{name}: OK")
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:400]
            print(f"{name}: FAIL {type(e).__name__}: {msg}")
            return False

    cfg = SiftConfig(max_nb_sift_per_buffer=16384)
    s = cfg.nb_scales_per_octave
    L = s + 2
    h_atlas, w_atlas = 1024, 1024
    cap = 512

    f32 = jnp.float32
    g4 = jax.ShapeDtypeStruct((L, h_atlas, w_atlas), f32)
    count = jax.ShapeDtypeStruct((), jnp.int32)
    addr = jax.ShapeDtypeStruct((cap,), jnp.int32)
    meta8 = jax.ShapeDtypeStruct((cap, 1, 8), f32)
    meta16 = jax.ShapeDtypeStruct((cap, 1, 16), f32)

    ok = True

    # frontend: one DoG octave
    dog = jax.ShapeDtypeStruct((L, 512, 512), f32)
    ok &= aot("frontend", functools.partial(
        pf.frontend_tpu, dog_threshold=cfg.dog_threshold, capacity=1024),
        dog)

    ori_edge = pb.ori_window_edge(pb._sigma_max(cfg, s + 1))
    ori_geom = pb._KernelGeom(wr=pb._window_rows(ori_edge), wc=256,
                              h8=h_atlas, w32=w_atlas)
    ok &= aot("K1 hist", functools.partial(
        pb.orientation_hist_tpu, geom=ori_geom), g4, count, addr, meta8)
    if ori_edge <= pb._PACK_MAX_EDGE:
        ok &= aot("K1 hist packed", functools.partial(
            pb.orientation_hist_tpu_packed, geom=ori_geom, edge=ori_edge),
            g4, count, addr, meta8)

    wrs = pb.kernel_window_rows(cfg)
    edges = pb.desc_bucket_edges(cfg)
    for b in range(len(edges)):
        geom = pb._KernelGeom(wr=wrs[b], wc=256, h8=h_atlas, w32=w_atlas)
        ok &= aot(f"K2 desc b{b} (edge {edges[b]})", functools.partial(
            pb.descriptor_tpu, geom=geom, use_vlfeat=False),
            g4, count, addr, meta16)
        if edges[b] <= pb._PACK_MAX_EDGE:
            ok &= aot(f"K2 desc packed b{b}", functools.partial(
                pb.descriptor_tpu_packed, geom=geom, edge=edges[b],
                use_vlfeat=False), g4, count, addr, meta16)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
