"""Headline benchmark: SIFT detect throughput on one chip.

Protocol mirrors the reference's perf harness (docs/Performances.md:22 —
warmup + timed full detections on a Hannover-shaped 1536x1024 image).
Baseline: VulkanSift on RTX 2060 = 16.47 ms mean (docs/Performances.md:24-27)
= 60.72 fps.

Measurement mode: the reference API contract makes detectFeatures a
non-blocking submit with N result buffers for pipelining
(vulkansift.h:40-47, vksift_Config.sift_buffer_count) — its harness still
measures sequentially because GPU downloads are ~free over PCIe. In this
environment the host link is a development tunnel with ~26 ms round-trip
latency (see .claude/skills/verify/SKILL.md), so the sequential number
would measure the tunnel, not the chip. We therefore report pipelined
throughput: dispatch BATCH detections back-to-back (alternating buffers),
sync once per batch, and ALSO print the single-image latency (incl. one
host sync) in the unit string for transparency.

Robustness: round 1's driver run died with a transient FAILED_PRECONDITION
TPU-backend error on the very first device sync and recorded nothing
(BENCH_r01.json rc=1). The reference harness never loses a run that way
(perf_runtime.cpp:63-85 — plain loop). So every device interaction here
runs under retry-with-backoff: on failure we rebuild the jitted function
(fresh executable, fresh backend handles) and try again; and the JSON line
is ALWAYS printed, from whatever subset of measurements succeeded.
"""

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

BASELINE_MS = 16.47  # VulkanSift, RTX 2060, Hannover 1536x1024
W, H = 1536, 1024
WARMUP = int(os.environ.get("BENCH_WARMUP", "5"))
BATCHES = int(os.environ.get("BENCH_BATCHES", "12"))
# Pipelining depth: one ~26 ms tunnel sync per BATCH frames is amortized
# into the per-frame number (8 -> 3.2 ms/frame of pure tunnel artifact;
# 24 -> 1.1). The multi-buffer API contract is exactly this pattern
# (vksift_Config.sift_buffer_count, vulkansift.h:40-47); on standard TPU
# hosts the sync is ~0.1 ms and the depth is irrelevant.
BATCH = int(os.environ.get("BENCH_BATCH", "24"))
RETRIES = int(os.environ.get("BENCH_RETRIES", "4"))
# Hard wall-clock watchdog: a wedged backend (e.g. a tunnel RPC that never
# returns) would otherwise hang forever and record NOTHING; emit the best
# JSON we have and exit instead.
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "1800"))

_best = {"json": None}


def _watchdog():
    time.sleep(WATCHDOG_S)
    line = _best["json"] or json.dumps({
        "metric": "sift_detect_fps_1536x1024",
        "value": 0.0,
        "unit": f"frames/s (watchdog: no measurement within "
                f"{WATCHDOG_S:.0f}s — backend hung)",
        "vs_baseline": 0.0,
    })
    print(line, flush=True)
    os._exit(0)


threading.Thread(target=_watchdog, daemon=True).start()


def _bench_image(h, w, seed=0):
    """Deterministic textured image (Hannover images are high-detail
    outdoor photos; multi-scale noise approximates their keypoint
    density)."""
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


def _emit(fps, dt_ms, lat_ms, n, note="", defer=False):
    baseline_fps = 1e3 / BASELINE_MS
    unit = (f"frames/s pipelined ({dt_ms:.2f} ms/frame; "
            f"single-image latency {lat_ms:.1f} ms incl. ~26 ms tunnel "
            f"round-trip; {n} feats; ref RTX2060 {BASELINE_MS} ms)")
    if note:
        unit += f"; {note}"
    line = json.dumps({
        "metric": "sift_detect_fps_1536x1024",
        "value": round(fps, 2),
        "unit": unit,
        "vs_baseline": round(fps / baseline_fps, 3),
    })
    _best["json"] = line
    if not defer:
        print(line)
        sys.stdout.flush()


def _emit_big(fps, dt_ms, n):
    """Hannover-large metric (docs/Performances.md:24-27: 73.29 ms on the
    RTX 2060 at 3456x2304)."""
    big_baseline_ms = 73.29
    line = json.dumps({
        "metric": "sift_detect_fps_3456x2304",
        "value": round(fps, 2),
        "unit": (f"frames/s pipelined ({dt_ms:.2f} ms/frame; {n} feats; "
                 f"ref RTX2060 {big_baseline_ms} ms)"),
        "vs_baseline": round(fps * big_baseline_ms / 1e3, 3),
    })
    print(line)
    sys.stdout.flush()


def _emit_match(ms, na, nb):
    """2-NN matcher metric. The reference never published a matching
    number (docs/Performances.md — 'not published'); vs_baseline is
    measured against this repo's round-3 recorded 6.9 ms at 16k x 16k
    (docs/PERFORMANCE.md) so the driver history shows the trend.

    A non-positive ``ms`` is a measurement FAILURE (the on-device repeat
    loop makes it structurally impossible; see measure_match) and is
    reported as value 0 / vs_baseline 0 rather than clamped into a
    fabricated speedup."""
    r3_ms = 6.9
    if not (ms > 0):
        line = json.dumps({
            "metric": "sift_match_2nn_16k_ms",
            "value": 0.0,
            "unit": (f"ms per {na}x{nb} u8-descriptor 2-NN match — "
                     f"measurement failed (non-positive estimate)"),
            "vs_baseline": 0.0,
        })
        print(line)
        sys.stdout.flush()
        return
    line = json.dumps({
        "metric": "sift_match_2nn_16k_ms",
        "value": round(ms, 3),
        "unit": (f"ms per {na}x{nb} u8-descriptor 2-NN match (reference "
                 f"publishes no number; vs_baseline = round-3's 6.9 ms / "
                 f"this)"),
        "vs_baseline": round(r3_ms / ms, 3),
    })
    print(line)
    sys.stdout.flush()


def _emit_northstar(fps, dt_ms, n):
    """Secondary metric line (printed BEFORE the headline): BASELINE north
    star #1 is frames/s/chip on 640x480 Oxford-sized detection. The
    reference's RTX 2060 Oxford data is plot-only
    (docs/Performances.md:39-52, perf_runtime_oxford_640x480.png); reading
    the VulkanSift curve at this config's ~2.5k detected features gives
    ~6.8 ms — that is the bar for this line."""
    ns_baseline_ms = 6.8
    line = json.dumps({
        "metric": "sift_detect_fps_640x480",
        "value": round(fps, 2),
        "unit": (f"frames/s pipelined ({dt_ms:.2f} ms/frame; {n} feats; "
                 f"north-star config: no upsampling, 4k buffer; ref "
                 f"RTX2060 Oxford plot ~{ns_baseline_ms} ms at this "
                 f"feature count)"),
        "vs_baseline": round(fps * ns_baseline_ms / 1e3, 3),
    })
    print(line)
    sys.stdout.flush()


def _retry(fn, what, retries=RETRIES, on_reset=None):
    """Run fn() with retry-with-backoff; on_reset() rebuilds state between
    attempts (e.g. re-jit after a backend FAILED_PRECONDITION crash)."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception:  # noqa: BLE001
            if attempt == retries:
                raise
            print(f"# bench: {what} failed (attempt {attempt + 1}/"
                  f"{retries + 1}); retrying", file=sys.stderr)
            traceback.print_exc(limit=2, file=sys.stderr)
            time.sleep(1.5 * (attempt + 1))
            if on_reset is not None:
                on_reset()


def main():
    # Triage knobs must never leak into a bench run: the ablation arms
    # emit degenerate (wrong) keypoints with no error.
    for knob in ("VKSIFT_FRONTEND_ABLATE", "VKSIFT_NO_SIGMA_REMAP"):
        if os.environ.pop(knob, None) is not None:
            print(f"# bench: cleared leaked triage knob {knob}",
                  file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from vulkansift_tpu import SiftConfig
    from vulkansift_tpu.pipeline import make_detect_fn

    cfg = SiftConfig(use_input_upsampling=True,
                     max_nb_sift_per_buffer=32768,
                     sift_buffer_count=2,
                     input_image_max_size=W * H)

    state = {"fails": 0}

    def build():
        # Safe mode: if the Pallas path fails to compile/run twice (e.g. a
        # Mosaic lowering regression on a backend newer than the last
        # hardware run), fall back to the pure-XLA back-half — slower but
        # records a real number instead of nothing.
        backhalf = "auto" if state["fails"] < 2 else "xla"
        if backhalf == "xla":
            # No Pallas path may survive into safe mode — the blur
            # kernel is default-AUTO (on for >= 7M px octaves), so it
            # must be forced off, not just unset.
            os.environ["VKSIFT_BLUR_KERNEL"] = "0"
            os.environ.pop("VKSIFT_PACKED_HIST", None)
            print("# bench: falling back to backhalf='xla'",
                  file=sys.stderr)
        state["detect"] = jax.jit(
            make_detect_fn(cfg, W, H, backhalf=backhalf))

    def build_count():
        state["fails"] += 1
        build()

    build()
    imgs = [jnp.asarray(_bench_image(H, W, seed=s)) for s in range(2)]

    # --- secondary metric: 640x480 north-star config (BASELINE #1) -------
    # Measured FIRST so a late failure still leaves the headline as the
    # LAST printed JSON line (the driver parses the last line).
    if os.environ.get("BENCH_SKIP_NORTHSTAR") != "1":
        try:
            ns_cfg = SiftConfig(use_input_upsampling=False,
                                max_nb_sift_per_buffer=4096,
                                sift_buffer_count=2,
                                input_image_max_size=640 * 480)
            ns_detect = jax.jit(make_detect_fn(ns_cfg, 640, 480))
            ns_imgs = [jnp.asarray(_bench_image(480, 640, seed=s))
                       for s in range(2)]
            ns_n = _retry(
                lambda: int(ns_detect(ns_imgs[0]).features.count),
                "north-star compile+sync")
            def measure_ns():
                for _ in range(WARMUP):
                    outs = [ns_detect(ns_imgs[i % 2]) for i in range(BATCH)]
                    jax.device_get([o.features.count for o in outs])
                t0 = time.perf_counter()
                for _ in range(BATCHES):
                    outs = [ns_detect(ns_imgs[i % 2]) for i in range(BATCH)]
                    jax.device_get([o.features.count for o in outs])
                return (time.perf_counter() - t0) / (BATCHES * BATCH)
            ns_dt = _retry(measure_ns, "north-star measurement")
            _emit_northstar(1.0 / ns_dt, ns_dt * 1e3, ns_n)
        except Exception:  # noqa: BLE001
            traceback.print_exc(limit=2, file=sys.stderr)

    # First compile + sync — the round-1 crash site; retried with rebuild.
    n = _retry(lambda: int(state["detect"](imgs[0]).features.count),
               "first compile+sync", on_reset=build_count)

    lat_ms = float("nan")
    try:
        def measure_latency():
            for _ in range(WARMUP):
                int(state["detect"](imgs[0]).features.count)
            t0 = time.perf_counter()
            lat_iters = 10
            for _ in range(lat_iters):
                int(state["detect"](imgs[0]).features.count)
            return (time.perf_counter() - t0) / lat_iters * 1e3

        lat_ms = _retry(measure_latency, "latency measurement",
                        on_reset=build_count)
    except Exception:  # noqa: BLE001
        traceback.print_exc(limit=2, file=sys.stderr)

    # Pipelined throughput (multi-buffer contract): dispatch BATCH detects,
    # sync once per batch on the counts.
    def measure_pipelined():
        detect = state["detect"]
        for _ in range(WARMUP):
            outs = [detect(imgs[i % 2]) for i in range(BATCH)]
            jax.device_get([o.features.count for o in outs])
        t0 = time.perf_counter()
        for _ in range(BATCHES):
            outs = [detect(imgs[i % 2]) for i in range(BATCH)]
            jax.device_get([o.features.count for o in outs])
        return (time.perf_counter() - t0) / (BATCHES * BATCH)

    try:
        dt = _retry(measure_pipelined, "pipelined measurement",
                    on_reset=build_count)
        # Defer the headline print: secondary metric lines go first so the
        # driver parses the headline from the LAST line.
        _emit(1.0 / dt, dt * 1e3, lat_ms, n, defer=True)
    except Exception:  # noqa: BLE001
        traceback.print_exc(limit=2, file=sys.stderr)
        if np.isfinite(lat_ms):
            # Fall back to the sequential number rather than recording
            # nothing (latency includes one tunnel round-trip per frame).
            _emit(1e3 / lat_ms, lat_ms, lat_ms, n,
                  note="pipelined path failed; sequential fallback",
                  defer=True)
        else:
            raise

    # --- secondary metric: Hannover-large 3456x2304 (BENCH item since
    # round 4; docs/Performances.md:24-27 publishes 73.29 ms) -------------
    if os.environ.get("BENCH_SKIP_BIG") != "1":
        try:
            bw, bh = 3456, 2304
            big_cfg = SiftConfig(use_input_upsampling=True,
                                 max_nb_sift_per_buffer=32768,
                                 sift_buffer_count=2,
                                 input_image_max_size=bw * bh)
            big_detect = jax.jit(make_detect_fn(big_cfg, bw, bh))
            big_img = jnp.asarray(_bench_image(bh, bw, seed=0))
            big_n = _retry(
                lambda: int(big_detect(big_img).features.count),
                "big-image compile+sync")
            big_batch = max(4, BATCH // 4)

            def measure_big():
                for _ in range(2):
                    outs = [big_detect(big_img) for _ in range(big_batch)]
                    jax.device_get([o.features.count for o in outs])
                t0 = time.perf_counter()
                nb = max(3, BATCHES // 4)
                for _ in range(nb):
                    outs = [big_detect(big_img) for _ in range(big_batch)]
                    jax.device_get([o.features.count for o in outs])
                return (time.perf_counter() - t0) / (nb * big_batch)

            big_dt = _retry(measure_big, "big-image measurement")
            _emit_big(1.0 / big_dt, big_dt * 1e3, big_n)
            del big_detect, big_img
        except Exception:  # noqa: BLE001
            traceback.print_exc(limit=2, file=sys.stderr)

    # --- secondary metric: 2-NN matcher at 16k x 16k ----------------------
    if os.environ.get("BENCH_SKIP_MATCH") != "1":
        try:
            from vulkansift_tpu.ops import match as match_mod
            nm = 16384
            key = jax.random.PRNGKey(0)
            da = jax.random.randint(key, (nm, 128), 0, 256, jnp.int32
                                    ).astype(jnp.uint8)
            db = jax.random.randint(jax.random.PRNGKey(1), (nm, 128), 0,
                                    256, jnp.int32).astype(jnp.uint8)
            cnt = jnp.int32(nm)
            # Fused Pallas kernel on TPU (bit-identical to match_2nn,
            # tests/test_match.py); XLA packed-key path elsewhere.
            from vulkansift_tpu.utils.backend import is_tpu_backend
            mimpl = (match_mod.match_2nn_fused if is_tpu_backend()
                     else match_mod.match_2nn)
            mfn = jax.jit(lambda a, b: mimpl(a, cnt, b, cnt))
            _retry(lambda: int(mfn(da, db).idx_b1[0]), "match compile")

            def measure_match():
                # On-device repeat loop: run the kernel k times inside ONE
                # executable (lax.fori_loop) with a forced data dependence
                # between iterations — one descriptor byte of A is
                # overwritten with the previous iteration's result — so XLA
                # can neither elide nor hoist iterations out of the loop.
                # Per-kernel time = (T(k2) - T(k1)) / (k2 - k1): each T is
                # ONE dispatch + ONE sync, so the ~26 ms tunnel sync
                # cancels in the subtraction, and per-measurement jitter is
                # a single sync's, not k syncs' (the old host-side loop
                # once produced a negative number that way). Median-of-3
                # per point; a non-positive difference is reported as a
                # measurement failure by _emit_match, never clamped.
                import jax.numpy as jnp_  # local: match jnp in scope

                def make_loop(k):
                    def body(i, acc):
                        a2 = da.at[0, 0].set(acc.astype(jnp_.uint8))
                        m = mimpl(a2, cnt, db, cnt)
                        return m.idx_b1[0].astype(jnp_.int32) + (acc & 1)
                    return jax.jit(
                        lambda: jax.lax.fori_loop(0, k, body, jnp_.int32(0)))

                k1, k2 = 16, 112
                f1, f2 = make_loop(k1), make_loop(k2)
                int(f1())  # compile+sync
                int(f2())

                def run(f):
                    t0 = time.perf_counter()
                    int(f())
                    return time.perf_counter() - t0

                t1s = sorted(run(f1) for _ in range(3))
                t2s = sorted(run(f2) for _ in range(3))
                return (t2s[1] - t1s[1]) / (k2 - k1) * 1e3

            m_ms = _retry(measure_match, "match measurement")
            _emit_match(m_ms, nm, nm)
        except Exception:  # noqa: BLE001
            traceback.print_exc(limit=2, file=sys.stderr)

    # Headline LAST (the driver parses the last JSON line).
    if _best["json"]:
        print(_best["json"])
        sys.stdout.flush()


if __name__ == "__main__":
    try:
        main()
    except Exception:  # noqa: BLE001
        # Absolute last resort: never exit without the JSON line.
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "sift_detect_fps_1536x1024",
            "value": 0.0,
            "unit": "frames/s (benchmark failed; see stderr)",
            "vs_baseline": 0.0,
        }))
        sys.exit(0)
