"""Detect-and-draw demo (parity: src/examples/test_sift_detect.cpp).

Usage: python examples/sift_detect.py IMAGE [--out out.png]
Falls back to a synthetic image when IMAGE is omitted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import argparse
import sys

import numpy as np


def load_or_synthesize(path):
    import cv2
    if path:
        img = cv2.imread(path, 0)
        if img is None:
            sys.exit(f"failed to read {path}")
        return img
    rng = np.random.default_rng(0)
    img = cv2.resize(rng.random((60, 80)), (640, 480),
                     interpolation=cv2.INTER_CUBIC)
    return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image", nargs="?")
    ap.add_argument("--out", default="sift_detect_out.png")
    args = ap.parse_args()

    import cv2
    import vulkansift_tpu as vs

    img = load_or_synthesize(args.image)
    with vs.SiftInstance(vs.SiftConfig(
            max_nb_sift_per_buffer=16384,
            input_image_max_size=4096 * 4096)) as inst:
        inst.detect_features(img, 0)
        n = inst.get_features_number(0)
        feats = inst.download_features(0)
    print(f"detected {n} features")

    vis = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    for f in feats:
        cv2.circle(vis, (int(f["x"]), int(f["y"])),
                   max(1, int(f["sigma"])), (0, 255, 0), 1)
    cv2.imwrite(args.out, vis)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
