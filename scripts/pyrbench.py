"""Pyramid-only A/B on the real TPU: XLA separable blur vs the opt-in
fused Pallas blur+DoG kernel (ops/pallas_blur), at a given resolution.

The round-3 hardware A/B at 1536x1024 was LOST by the kernel (commit
288994f; XLA blur stayed the default); its predicted win was at
3456x2304 where pyramid HBM traffic dominates (docs/PERFORMANCE.md).
This isolates the pyramid stage so the A/B costs two compiles instead of
ten (stagebench compiles 5 programs per arm at ~1-2 min each at Hannover
size through the tunnel).

Also times the upsample/downsample resampling ops alone: their one-hot
interleave matmuls scale as H*W^2 and are a suspected super-linear cost
at 3456 (scale_space.py upsample2x_linear / downsample2x_nearest).

Usage:  python scripts/pyrbench.py [WxH] [iters]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, k):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # compile+sync

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        return time.perf_counter() - t0

    run(2)
    t1 = run(k)
    t2 = run(2 * k)
    return (t2 - t1) / k * 1e3


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "3456x2304"
    w, h = map(int, wh.split("x"))
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import scale_space

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=32768,
                     input_image_max_size=w * h)
    oct_res = cfg.octave_resolutions(w, h)
    oct_shapes = tuple((hh, ww) for (ww, hh) in oct_res)

    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((h, w)) * 255).astype(np.uint8))

    def make_pyr():
        @jax.jit
        def f(image):
            fimg = image.astype(jnp.float32) / 255.0
            g, d = scale_space.build_pyramid(fimg, cfg, oct_shapes)
            # Sync on tiny scalars from every octave so no stage is DCE'd.
            return [x[0, 0, 0] for x in g] + [x[0, 0, 0] for x in d]
        return f

    @jax.jit
    def resample_only(image):
        fimg = image.astype(jnp.float32) / 255.0
        up = scale_space.upsample2x_linear(fimg)
        outs = [up[0, 0]]
        base = up
        for (hh, ww) in oct_shapes[1:]:
            base = scale_space.downsample2x_nearest(base, hh, ww)
            outs.append(base[0, 0])
        return outs

    print(f"== pyrbench {w}x{h}, k={k} ==")
    ms = timed(resample_only, (img,), k)
    print(f"  resample only (up + {len(oct_shapes) - 1} down): {ms:8.2f} ms")

    os.environ.pop("VKSIFT_BLUR_KERNEL", None)
    ms_xla = timed(make_pyr(), (img,), k)
    print(f"  pyramid XLA blur:                    {ms_xla:8.2f} ms")

    os.environ["VKSIFT_BLUR_KERNEL"] = "1"
    ms_k = timed(make_pyr(), (img,), k)
    print(f"  pyramid fused Pallas blur+DoG:       {ms_k:8.2f} ms")
    os.environ.pop("VKSIFT_BLUR_KERNEL", None)
    print(f"  kernel/XLA ratio: {ms_k / ms_xla:.3f}")


if __name__ == "__main__":
    main()
