"""Per-stage device timing of the detect pipeline on the real TPU.

The axon tunnel makes naive timing useless (~26 ms per host sync, fake
block_until_ready), so each stage is timed with the two-point method:
run the jitted stage k and 2k times back-to-back (serial on-device
execution, one scalar sync at the end) and report (T(2k) - T(k)) / k —
sync cost and dispatch overhead cancel.

Stages are cumulative prefixes of the pipeline; per-stage cost = adjacent
difference. Usage:  python scripts/stagebench.py [WxH] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, k):
    out = fn(*args)
    _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile+sync

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = int(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = run(k)
    t2 = run(2 * k)
    return (t2 - t1) / k * 1e3


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "1536x1024"
    w, h = map(int, wh.split("x"))
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.ops import extract, pallas_backhalf, pallas_frontend
    from vulkansift_tpu.ops import scale_space
    from vulkansift_tpu.pipeline import make_detect_fn

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=32768,
                     input_image_max_size=w * h)
    oct_res = cfg.octave_resolutions(w, h)
    caps = cfg.octave_section_capacities(len(oct_res))
    oct_shapes = tuple((hh, ww) for (ww, hh) in oct_res)
    s = cfg.nb_scales_per_octave

    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((h, w)) * 255).astype(np.uint8))

    def stage_pyramid(image):
        fimg = image.astype(jnp.float32) / 255.0
        return scale_space.build_pyramid(fimg, cfg, oct_shapes)

    from vulkansift_tpu.pipeline import _FRONTEND_MIN_W

    def frontend(dogs):
        cands, codes = [], []
        for o, (ow, oh) in enumerate(oct_res):
            if _FRONTEND_MIN_W <= ow and oh >= 32:
                cand, code = pallas_frontend.frontend_tpu(
                    dogs[o], dog_threshold=cfg.dog_threshold,
                    capacity=caps[o])
            else:
                cand, code = extract.dense_frontend(
                    dogs[o], cfg.dog_threshold, caps[o])
            cands.append(cand)
            codes.append(code)
        return cands, codes

    def refine(dogs, cands, codes):
        from vulkansift_tpu.pipeline import _GLOBAL_REFINE_MAX_CELLS
        total_cells = sum(hh * ww for (hh, ww) in oct_shapes) * (s + 2)
        if total_cells <= _GLOBAL_REFINE_MAX_CELLS:
            g = extract.refine_candidates_global(
                dogs, cands, codes, nb_scales=s, oct_res=oct_res,
                dog_threshold=cfg.dog_threshold,
                edge_threshold=cfg.edge_threshold,
                seed_sigma=cfg.seed_scale_sigma,
                upsampling=cfg.use_input_upsampling)
            return [g.refined]
        out = []
        for o, (ow, oh) in enumerate(oct_res):
            oi = o - 1
            out.append(extract.refine_candidates(
                dogs[o], cands[o], nb_scales=s, width=ow, height=oh,
                dog_threshold=cfg.dog_threshold,
                edge_threshold=cfg.edge_threshold,
                seed_sigma=cfg.seed_scale_sigma, octave_idx=oi,
                code=codes[o]))
        return out

    @jax.jit
    def s1(image):
        g, d = stage_pyramid(image)
        return d[-1]

    @jax.jit
    def s2(image):
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        return [c.count for c in cands]

    @jax.jit
    def s3(image):
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        r = refine(d, cands, codes)
        return [x.valid.sum() for x in r]

    @jax.jit
    def s4(image):
        # NOTE: returning only ``count`` dead-code-eliminates the
        # DESCRIPTOR kernels + merge (count depends on K1/peaks only), so
        # the "full detect" minus s4 delta IS the descriptor stage.
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        r = refine(d, cands, codes)
        fields, count, per_oct, lost = pallas_backhalf.run_atlas(
            g, r, extract.rank_select, config=cfg, oct_res=oct_res,
            caps=caps, capacity=cfg.max_nb_sift_per_buffer)
        return count

    detect = jax.jit(make_detect_fn(cfg, w, h))

    names = [
        ("pyramid", s1, (img,)),
        ("+frontend", s2, (img,)),
        ("+refine", s3, (img,)),
        ("+backhalf(atlas)", s4, (img,)),
        ("full detect", detect, (img,)),
    ]
    prev = 0.0
    print(f"== {w}x{h}, k={k} ==")
    for name, fn, args in names:
        ms = timed(fn, args, k)
        print(f"{name:>20s}: {ms:8.2f} ms  (delta {ms - prev:+7.2f})")
        prev = ms


if __name__ == "__main__":
    main()
