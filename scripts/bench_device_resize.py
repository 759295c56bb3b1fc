"""Host-PIL vs device (MXU fixed-point) resize at real OCR page shapes.

The 1-core host's PIL resize is the crop-mode throughput ceiling
(~39 ms for 2200x1700 -> 1024 letterbox + ~2x that for the tiling resize).
The device path ships the raw uint8 page once and runs the PIL-bit-exact
digit-split GEMM kernels; this script measures both ends to decide the
default for TPU serving.

Timing: axon's block_until_ready does not sync — every device measurement
ends with a small np.asarray host read. Per-dispatch round trip ~30 ms, so
device timings are per-PAGE loops (ship + both kernels + sync), not
micro-kernel numbers.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from PIL import Image

from deepseek_ocr2_tpu.preprocess.device_resize import device_preprocess_page
from deepseek_ocr2_tpu.preprocess.image import (
    candidate_ratios,
    find_closest_aspect_ratio,
    preprocess_base_u8,
    preprocess_tiles_u8,
)

BASE, CROP = 1024, 768
PAGES = [(2200, 1700), (1700, 2200), (1280, 960), (3300, 2550)]


def host_page(img, ratio):
    base = preprocess_base_u8(img, BASE, 127)
    tiles = preprocess_tiles_u8(img, CROP, ratio) if ratio else None
    return base, tiles


def main():
    rng = np.random.default_rng(0)
    ratios = candidate_ratios(2, 6)
    for w, h in PAGES:
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        img = Image.fromarray(arr)
        ratio = find_closest_aspect_ratio(w / h, ratios, w, h, CROP)

        # Host (PIL fixed-point SIMD) -------------------------------------
        host_page(img, ratio)  # warm any lazy state
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            base_h, tiles_h = host_page(img, ratio)
        host_ms = (time.perf_counter() - t0) / n * 1e3

        # Device ----------------------------------------------------------
        base_d, tiles_d = device_preprocess_page(arr, BASE, CROP, ratio)  # compile
        np.asarray(base_d[0, 0, :1, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            base_d, tiles_d = device_preprocess_page(arr, BASE, CROP, ratio)
            np.asarray(base_d[0, 0, :1, 0])
            np.asarray(tiles_d[0, 0, :1, 0])
        dev_ms = (time.perf_counter() - t0) / n * 1e3

        exact = np.array_equal(np.asarray(base_d), base_h) and np.array_equal(
            np.asarray(tiles_d), tiles_h
        )
        print(
            f"{w}x{h} ratio={ratio}: host {host_ms:7.1f} ms/page  "
            f"device {dev_ms:7.1f} ms/page  speedup {host_ms / dev_ms:4.2f}x  "
            f"bit-exact={exact}"
        )


if __name__ == "__main__":
    main()
