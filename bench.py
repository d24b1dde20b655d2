"""Headline benchmark: SIFT detect latency/throughput on one chip.

Protocol mirrors the reference's perf harness (docs/Performances.md:22 —
10 warmup + 100 measured full detections; "full" = image upload + detection
pipeline + feature download, src/perf/wrappers/vulkansift_wrapper.cpp:25-54)
on a Hannover-shaped 1536x1024 image. Baseline: VulkanSift on RTX 2060 =
16.47 ms mean (docs/Performances.md:24-27) = 60.72 fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_MS = 16.47  # VulkanSift, RTX 2060, Hannover 1536x1024
W, H = 1536, 1024
WARMUP = int(os.environ.get("BENCH_WARMUP", "10"))
ITERS = int(os.environ.get("BENCH_ITERS", "100"))


def _bench_image(h, w, seed=0):
    """Deterministic textured image (Hannover images are high-detail
    outdoor photos; multi-scale noise approximates their keypoint density)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    for cell in (8, 16, 32, 64):
        small = rng.random((h // cell + 1, w // cell + 1))
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        yi, xi = ys.astype(int), xs.astype(int)
        fy, fx = (ys - yi)[:, None], (xs - xi)[None, :]
        img += ((1 - fy) * (1 - fx) * small[yi][:, xi]
                + (1 - fy) * fx * small[yi][:, xi + 1]
                + fy * (1 - fx) * small[yi + 1][:, xi]
                + fy * fx * small[yi + 1][:, xi + 1])
    img -= img.min()
    return (255 * img / img.max()).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.pipeline import make_detect_fn
    from vulkansift_tpu.types import features_to_numpy

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=32768,
                     sift_buffer_count=1,
                     input_image_max_size=W * H)
    detect = jax.jit(make_detect_fn(cfg, W, H))
    img = _bench_image(H, W)

    def full_detect():
        # upload + detect + download (reference wrapper protocol)
        out = detect(jnp.asarray(img))
        n = int(out.features.count)
        feats = features_to_numpy(out.features, n)
        return n, feats

    n, _ = full_detect()  # compile
    for _ in range(WARMUP):
        full_detect()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        full_detect()
    dt = (time.perf_counter() - t0) / ITERS

    ms = dt * 1e3
    fps = 1.0 / dt
    baseline_fps = 1e3 / BASELINE_MS
    print(json.dumps({
        "metric": "sift_detect_fps_1536x1024",
        "value": round(fps, 2),
        "unit": f"frames/s ({ms:.2f} ms/frame, {n} feats; ref RTX2060 "
                f"{BASELINE_MS} ms)",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
