"""Microbenchmark the Pallas back-half kernels in isolation on the TPU.

Times orientation_hist_tpu and descriptor_tpu per-keypoint cost with
synthetic keypoints spread over a realistic atlas, using the two-point
method (see stagebench.py). Usage: python scripts/kernelbench.py [n_kp]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, k=10):
    out = fn(*args)
    _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0] * 0 + 1)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(2)
    t1 = min(run(k) for _ in range(2))
    t2 = min(run(2 * k) for _ in range(2))
    return (t2 - t1) / k * 1e3


def main():
    n_kp = int(sys.argv[1]) if len(sys.argv) > 1 else 4992

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import pallas_backhalf as pb

    cfg = SiftConfig(max_nb_sift_per_buffer=32768)
    s = cfg.nb_scales_per_octave

    # Synthetic atlas ~ 1536x1024 with upsampling: octave0 3072x2048.
    h_atlas, w_atlas = 3072 + 1536 + 768 + 384 + 200, 3072
    h_atlas = ((h_atlas + 7) // 8) * 8
    L = s + 2
    rng = np.random.default_rng(0)
    # Generate on device: shipping a ~370 MB host array through the axon
    # tunnel takes many minutes (transfers are ~MB/s scale).
    g4 = jax.jit(lambda k: jax.random.uniform(
        k, (L, h_atlas, w_atlas), jnp.float32))(jax.random.key(0))
    _ = float(g4[0, 0, 0])
    print("atlas ready", flush=True)

    # Synthetic keypoints: uniform over the big band, sigma distribution
    # concentrated at low scales like real detections. "sorted" arg mimics
    # the real pipeline's address stream (keypoints ordered by octave band
    # then scan order) to separate DMA-locality effects from kernel cost.
    cap = ((n_kp + 7) // 8) * 8
    ys = rng.integers(8, 3000, cap)
    xs = rng.integers(8, 2040, cap)
    if len(sys.argv) > 2 and sys.argv[2] == "sorted":
        order = np.lexsort((xs, ys))
        ys, xs = ys[order], xs[order]
    layer = rng.integers(1, L, cap)
    subs = np.abs(rng.normal(1.2, 0.8, cap)) % (s + 1)
    sig = cfg.seed_scale_sigma * 2.0 ** (subs / s)
    ang = rng.random(cap).astype(np.float32) * 6.28

    def mk_meta(extra=None):
        cols = [xs.astype(np.float32), ys.astype(np.float32),
                sig.astype(np.float32),
                xs.astype(np.float32), ys.astype(np.float32),
                np.full(cap, 1.0, np.float32),
                np.full(cap, h_atlas - 2.0, np.float32),
                np.full(cap, w_atlas - 2.0, np.float32)]
        width = 8
        if extra is not None:
            cols.append(extra)
            cols += [np.zeros(cap, np.float32)] * 7
            width = 16
        return jnp.asarray(np.stack(cols, -1).reshape(cap, 1, width))

    def mk_addr(r1, wr, wc):
        ys_w = np.clip(((ys - r1) // 8) * 8, 0, h_atlas - wr)
        ss = np.clip(((xs - r1) // 128) * 128, 0, w_atlas - wc)
        w = (layer + ((ys_w // 8) << pb._ADDR_YS_SHIFT)
             + ((ss // 128) << pb._ADDR_AX_SHIFT)
             + ((xs - r1 - ss + 64) << pb._ADDR_SH_SHIFT))
        return jnp.asarray(w.astype(np.int32))

    count = jnp.int32(n_kp)

    # K1 orientation
    ori_edge = pb.ori_window_edge(pb._sigma_max(cfg, s + 1))
    ori_geom = pb._KernelGeom(wr=pb._window_rows(ori_edge), wc=256,
                              h8=h_atlas, w32=w_atlas)
    addr1 = mk_addr((ori_edge - 1) // 2, ori_geom.wr, 256)
    meta1 = mk_meta()
    f1 = jax.jit(functools.partial(pb.orientation_hist_tpu, geom=ori_geom))
    ms = timed(f1, (g4, count, addr1, meta1))
    print(f"K1 hist   : {ms:7.2f} ms total, {ms / n_kp * 1e3:6.2f} us/kp "
          f"(wr={ori_geom.wr}, wc={ori_geom.wc})", flush=True)

    if ori_edge <= pb._PACK_MAX_EDGE:
        addr1p = mk_addr((ori_edge - 1) // 2, ori_geom.wr, 256)
        f1p = jax.jit(functools.partial(pb.orientation_hist_tpu_packed,
                                        geom=ori_geom, edge=ori_edge))
        ms = timed(f1p, (g4, count, addr1p, meta1))
        print(f"K1 packed : {ms:7.2f} ms total, {ms / n_kp * 1e3:6.2f} "
              f"us/kp", flush=True)

    # K2 descriptor, all sigma buckets
    wrs = pb.kernel_window_rows(cfg)
    edges = pb.desc_bucket_edges(cfg)
    for b in range(len(edges)):
        wc = 256
        geom = pb._KernelGeom(wr=wrs[b], wc=wc, h8=h_atlas, w32=w_atlas)
        addr2 = mk_addr((edges[b] - 1) // 2, wrs[b], wc)
        meta2 = mk_meta(extra=ang)
        f2 = jax.jit(functools.partial(pb.descriptor_tpu, geom=geom,
                                       use_vlfeat=False))
        ms = timed(f2, (g4, count, addr2, meta2))
        print(f"K2 desc b{b}: {ms:7.2f} ms total, {ms / n_kp * 1e3:6.2f} "
              f"us/kp (wr={geom.wr}, wc={geom.wc})", flush=True)
        if edges[b] <= pb._PACK_MAX_EDGE:
            addr2p = mk_addr((edges[b] - 1) // 2, wrs[b], wc)
            f2p = jax.jit(functools.partial(
                pb.descriptor_tpu_packed, geom=geom, edge=edges[b],
                use_vlfeat=False))
            ms = timed(f2p, (g4, count, addr2p, meta2))
            print(f"K2 pack b{b}: {ms:7.2f} ms total, "
                  f"{ms / n_kp * 1e3:6.2f} us/kp", flush=True)


if __name__ == "__main__":
    main()
