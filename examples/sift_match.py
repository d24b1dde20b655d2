"""GPU match + CPU cross-check demo (parity: src/examples/
test_sift_match.cpp:66-107 — detect two images, 2-NN match on device,
cross-check both directions, Lowe ratio 0.75, draw match lines).

Usage: python examples/sift_match.py IMG1 IMG2 [--out matches.png]
Synthesizes a warped pair when images are omitted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("img1", nargs="?")
    ap.add_argument("img2", nargs="?")
    ap.add_argument("--out", default="sift_match_out.png")
    args = ap.parse_args()

    import cv2
    import vulkansift_tpu as vs

    if args.img1 and args.img2:
        img1 = cv2.imread(args.img1, 0)
        img2 = cv2.imread(args.img2, 0)
        if img1 is None or img2 is None:
            sys.exit("failed to read input images")
    else:
        rng = np.random.default_rng(1)
        img1 = cv2.resize(rng.random((60, 80)), (640, 480),
                          interpolation=cv2.INTER_CUBIC)
        img1 = cv2.normalize(img1, None, 0, 255,
                             cv2.NORM_MINMAX).astype(np.uint8)
        h = np.array([[0.95, -0.1, 30], [0.1, 0.95, -10], [0, 0, 1.0]])
        img2 = cv2.warpPerspective(img1, h, (640, 480))

    with vs.SiftInstance(vs.SiftConfig(
            max_nb_sift_per_buffer=16384, sift_buffer_count=2,
            input_image_max_size=4096 * 4096)) as inst:
        inst.detect_features(img1, 0)
        inst.detect_features(img2, 1)
        f1 = inst.download_features(0)
        f2 = inst.download_features(1)
        # A->B with Lowe ratio.
        inst.match_features(0, 1)
        m_ab = inst.download_matches()
        # B->A for the cross-check (reference does both directions).
        inst.match_features(1, 0)
        m_ba = inst.download_matches()

    ratio_ok = m_ab["dist_a_b1"] < 0.75 * np.maximum(m_ab["dist_a_b2"], 1e-9)
    back = m_ba["idx_b1"][m_ab["idx_b1"]]
    mutual = back == m_ab["idx_a"]
    keep = ratio_ok & mutual
    ia, ib = m_ab["idx_a"][keep], m_ab["idx_b1"][keep]
    print(f"features: {len(f1)} / {len(f2)}; "
          f"cross-checked Lowe matches: {keep.sum()}")

    vis = np.concatenate([cv2.cvtColor(img1, cv2.COLOR_GRAY2BGR),
                          cv2.cvtColor(img2, cv2.COLOR_GRAY2BGR)], axis=1)
    w = img1.shape[1]
    rng = np.random.default_rng(0)
    for a, b in zip(ia[:500], ib[:500]):
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        cv2.line(vis, (int(f1["x"][a]), int(f1["y"][a])),
                 (int(f2["x"][b]) + w, int(f2["y"][b])), color, 1,
                 cv2.LINE_AA)
    cv2.imwrite(args.out, vis)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
