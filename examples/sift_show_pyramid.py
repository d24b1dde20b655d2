"""Scale-space / DoG introspection demo (parity: src/examples/
test_sift_show_pyr.cpp — dumps every gaussian and DoG pyramid level).

Usage: python examples/sift_show_pyramid.py [IMAGE] [--out-dir pyr_out]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image", nargs="?")
    ap.add_argument("--out-dir", default="pyr_out")
    args = ap.parse_args()

    import cv2
    import vulkansift_tpu as vs

    if args.image:
        img = cv2.imread(args.image, 0)
    else:
        rng = np.random.default_rng(2)
        img = cv2.resize(rng.random((60, 80)), (640, 480),
                         interpolation=cv2.INTER_CUBIC)
        img = cv2.normalize(img, None, 0, 255,
                            cv2.NORM_MINMAX).astype(np.uint8)

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = vs.SiftConfig(retain_pyramid=True, max_nb_sift_per_buffer=16384,
                        input_image_max_size=4096 * 4096)
    with vs.SiftInstance(cfg) as inst:
        inst.detect_features(img, 0)
        nb_oct = inst.get_scale_space_nb_octaves(0)
        print(f"{nb_oct} octaves")
        for o in range(nb_oct):
            w, h = inst.get_scale_space_octave_resolution(o, 0)
            print(f"octave {o}: {w}x{h}")
            for s in range(cfg.nb_scales_per_octave + 3):
                g = inst.download_scale_space_image(o, s, 0)
                cv2.imwrite(os.path.join(args.out_dir,
                                         f"gauss_o{o}_s{s}.png"),
                            (255 * np.clip(g, 0, 1)).astype(np.uint8))
            for s in range(cfg.nb_scales_per_octave + 2):
                d = inst.download_dog_image(o, s, 0)
                dn = (d - d.min()) / max(d.max() - d.min(), 1e-9)
                cv2.imwrite(os.path.join(args.out_dir,
                                         f"dog_o{o}_s{s}.png"),
                            (255 * dn).astype(np.uint8))
    print(f"wrote pyramid levels to {args.out_dir}/")


if __name__ == "__main__":
    main()
