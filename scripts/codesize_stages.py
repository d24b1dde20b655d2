"""Attribute generated-code size to pipeline stages (deviceless compile).

Compiles cumulative prefixes of the detect pipeline (like stagebench) and
prints each executable's generated_code_size — the adjacent difference
attributes the 200+ MB code bloat (results/hw_r4d/aotcheck.log) to a
stage. Usage: python scripts/codesize_stages.py [WxH]
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
    from vulkansift_tpu.ops import extract, pallas_backhalf, pallas_frontend
    from vulkansift_tpu.ops import scale_space
    from vulkansift_tpu.pipeline import (_FRONTEND_MIN_W,
                                         _GLOBAL_REFINE_MAX_CELLS,
                                         make_detect_fn)

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=16384,
                     sift_buffer_count=1,
                     input_image_max_size=w * h)
    oct_res = cfg.octave_resolutions(w, h)
    caps = cfg.octave_section_capacities(len(oct_res))
    oct_shapes = tuple((hh, ww) for (ww, hh) in oct_res)
    s = cfg.nb_scales_per_octave

    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    mesh = Mesh(np.array(topo.devices)[:1].reshape(1), ("x",))
    sh = NamedSharding(mesh, P())

    def stage_pyramid(image):
        fimg = image.astype(jax.numpy.float32) / 255.0
        return scale_space.build_pyramid(fimg, cfg, oct_shapes)

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
            out.append(extract.refine_candidates(
                dogs[o], cands[o], nb_scales=s, width=ow, height=oh,
                dog_threshold=cfg.dog_threshold,
                edge_threshold=cfg.edge_threshold,
                seed_sigma=cfg.seed_scale_sigma, octave_idx=o - 1,
                code=codes[o]))
        return out

    def s1(image):
        g, d = stage_pyramid(image)
        return d[-1]

    def s2(image):
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        return [c.count for c in cands]

    def s3(image):
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        r = refine(d, cands, codes)
        return [x.valid.sum() for x in r]

    def s4(image):
        g, d = stage_pyramid(image)
        cands, codes = frontend(d)
        r = refine(d, cands, codes)
        fields, count, per_oct, lost = pallas_backhalf.run_atlas(
            g, r, extract.rank_select, config=cfg, oct_res=oct_res,
            caps=caps, capacity=cfg.max_nb_sift_per_buffer)
        return count

    full = make_detect_fn(cfg, w, h, backhalf="pallas")
    spec = jax.ShapeDtypeStruct((h, w), np.uint8)

    prev = 0.0
    for name, fn in (("pyramid", s1), ("+frontend", s2), ("+refine", s3),
                     ("+backhalf", s4), ("full", full)):
        t0 = time.time()
        jfn = jax.jit(fn, in_shardings=sh, out_shardings=sh)
        compiled = jfn.lower(spec).compile()
        dt = time.time() - t0
        mb = compiled.memory_analysis().generated_code_size_in_bytes / 1e6
        print(f"{name:>10s}: code {mb:8.1f} MB (delta {mb - prev:+8.1f})"
              f"  compile {dt:6.1f}s", flush=True)
        prev = mb


if __name__ == "__main__":
    main()
