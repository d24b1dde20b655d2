"""Error-callback/exception demo (parity: src/examples/
test_sift_error_handling.cpp — deliberately triggers invalid inputs and
shows that errors surface through the callback and exceptions while the
instance stays usable)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import vulkansift_tpu as vs

    seen = []
    inst = vs.SiftInstance(
        vs.SiftConfig(sift_buffer_count=2, max_nb_sift_per_buffer=4096),
        on_error=lambda r: seen.append(r))
    rng = np.random.default_rng(0)
    img = (rng.random((128, 128)) * 255).astype(np.uint8)

    # Invalid buffer index (reference: test_sift_error_handling.cpp:49-69).
    for bad_call in (
            lambda: inst.detect_features(img, 99),
            lambda: inst.detect_features(img.astype(np.float32), 0),
            lambda: inst.detect_features(np.zeros((4, 4), np.uint8), 0),
            lambda: inst.download_matches(),
    ):
        try:
            bad_call()
            print("ERROR: expected an exception")
        except vs.InvalidInputError as e:
            print(f"caught InvalidInputError: {e}")

    print(f"error callback fired {len(seen)} times "
          f"({[r.name for r in seen]})")

    # The instance remains fully usable after INVALID_INPUT errors.
    inst.detect_features(img, 0)
    print(f"instance still works: {inst.get_features_number(0)} features")
    inst.close()


if __name__ == "__main__":
    main()
