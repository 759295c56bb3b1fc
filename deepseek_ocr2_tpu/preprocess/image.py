"""Host-side image preprocessing.

Parity with the reference pipeline (/root/reference/src/main.rs):
- clockwise rotation 0/90/180/270 (main.rs:331-338),
- auto-rotate heuristic: grayscale downsample to 256px, dx/dy edge-energy
  ratio with threshold 1.35, dark-top-vs-bottom tie-break (main.rs:348-460),
- letterbox pad-to-square with bicubic (Catmull-Rom) resize, pad color 127
  (main.rs:462-481, 1450),
- dynamic tiling: enumerate (i,j) grids with min<=i*j<=max, closest aspect
  ratio with area tie-break, resize then crop image_size tiles
  (main.rs:1228-1298),
- normalize to [-1, 1] NCHW float32, mean=std=0.5 (main.rs:1300-1326).

Decode/rotate/resize stay on the host (PIL, with an optional C++ fast path in
preprocess/native); normalization is a trivial fused op that also runs
on-device inside the encoder jit.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image

ROTATIONS = (0, 90, 180, 270)


def rotate_image(img: Image.Image, degrees_cw: int) -> Image.Image:
    """Rotate clockwise by 0/90/180/270 degrees (main.rs:331-338)."""
    if degrees_cw % 360 == 0:
        return img
    # PIL's transpose constants rotate counterclockwise.
    table = {90: Image.ROTATE_270, 180: Image.ROTATE_180, 270: Image.ROTATE_90}
    return img.transpose(table[degrees_cw % 360])


def _gray_u8(rgb: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma, identical to reference main.rs:340-346."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def _downsample_for_heuristic(img: Image.Image, max_side: int = 256) -> Image.Image:
    w, h = img.size
    m = max(w, h, 1)
    if m <= max_side:
        return img
    scale = max_side / m
    nw = max(int(round(w * scale)), 1)
    nh = max(int(round(h * scale)), 1)
    return img.resize((nw, nh), Image.BILINEAR)  # Triangle filter (main.rs:357)


def _edge_ratio_dx_dy(gray: np.ndarray) -> float:
    """dx/dy edge-energy ratio with the reference's striding (main.rs:360-387)."""
    h, w = gray.shape
    if w < 2 or h < 2:
        return 1.0
    step = max(max(w, h) // 256, 1)
    ys = np.arange(0, h, step)
    xs = np.arange(0, w, step)
    sub = gray[np.ix_(ys, xs)].astype(np.int64)
    # dx: difference with the pixel `step` to the right, where it exists.
    xs_ok = xs + step < w
    dx = np.abs(sub[:, xs_ok] - gray[np.ix_(ys, xs[xs_ok] + step)].astype(np.int64)).sum()
    ys_ok = ys + step < h
    dy = np.abs(sub[ys_ok, :] - gray[np.ix_(ys[ys_ok] + step, xs)].astype(np.int64)).sum()
    return float(dx) / (float(dy) + 1e-9)


def _dark_top_minus_bottom(gray: np.ndarray, thr: int = 100) -> float:
    """Fraction of dark pixels, top half minus bottom half (main.rs:389-423)."""
    h, w = gray.shape
    if h == 0 or w == 0:
        return 0.0
    step = max(max(w, h) // 256, 1)
    sub = gray[::step, ::step]
    mid_row = (h // 2 - 1) // step + 1 if h // 2 > 0 else 0  # rows with y < h//2
    dark = sub < thr
    top = dark[:mid_row]
    bot = dark[mid_row:]
    top_frac = top.sum() / (top.size + 1e-9)
    bot_frac = bot.sum() / (bot.size + 1e-9)
    return float(top_frac - bot_frac)


def auto_rotate_choice(img: Image.Image) -> int:
    """Pick 0/90/270 via the edge-energy heuristic (main.rs:425-460)."""
    small = _downsample_for_heuristic(img, 256)
    arr = np.asarray(small.convert("RGB"))
    g0 = _gray_u8(arr)
    r0 = _edge_ratio_dx_dy(g0)
    if r0 <= 1.35:
        return 0
    g90 = _gray_u8(np.asarray(rotate_image(small, 90).convert("RGB")))
    g270 = _gray_u8(np.asarray(rotate_image(small, 270).convert("RGB")))
    r90 = _edge_ratio_dx_dy(g90)
    r270 = _edge_ratio_dx_dy(g270)
    best = 90 if r90 <= r270 else 270
    if abs(r90 - r270) < 0.05:
        d90 = _dark_top_minus_bottom(g90)
        d270 = _dark_top_minus_bottom(g270)
        best = 90 if d90 >= d270 else 270
    return best


def pad_to_square(img: Image.Image, size: int, pad_color: int = 127) -> Image.Image:
    """Letterbox to size x size with centered paste (main.rs:462-481)."""
    w, h = img.size
    scale = min(size / w, size / h)
    nw = max(int(round(w * scale)), 1)
    nh = max(int(round(h * scale)), 1)
    resized = img.resize((nw, nh), Image.BICUBIC)  # Catmull-Rom class filter
    canvas = Image.new("RGB", (size, size), (pad_color, pad_color, pad_color))
    canvas.paste(resized, ((size - nw) // 2, (size - nh) // 2))
    return canvas


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: Sequence[Tuple[int, int]],
    width: int,
    height: int,
    image_size: int,
) -> Tuple[int, int]:
    """Pick the tiling grid closest in aspect ratio (main.rs:1228-1256)."""
    best_diff = float("inf")
    best = (1, 1)
    area = float(width) * float(height)
    for rw, rh in target_ratios:
        target_ar = rw / rh
        diff = abs(aspect_ratio - target_ar)
        if diff < best_diff:
            best_diff = diff
            best = (rw, rh)
        elif abs(diff - best_diff) < np.finfo(np.float32).eps:
            if area > 0.5 * image_size * image_size * rw * rh:
                best = (rw, rh)
    return best


def candidate_ratios(min_num: int, max_num: int) -> List[Tuple[int, int]]:
    ratios = set()
    for n in range(min_num, max_num + 1):
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                if min_num <= i * j <= max_num:
                    ratios.add((i, j))
    return sorted(ratios, key=lambda r: r[0] * r[1])


def dynamic_preprocess(
    img: Image.Image, min_num: int = 2, max_num: int = 6, image_size: int = 768
) -> Tuple[List[Image.Image], Tuple[int, int]]:
    """Tile into (tiles_w, tiles_h) crops of image_size (main.rs:1258-1298)."""
    w, h = img.size
    aspect = w / h
    ratios = candidate_ratios(min_num, max_num)
    tiles_w, tiles_h = find_closest_aspect_ratio(aspect, ratios, w, h, image_size)
    resized = img.resize((image_size * tiles_w, image_size * tiles_h), Image.BICUBIC)
    crops = []
    for i in range(tiles_w * tiles_h):
        x = (i % tiles_w) * image_size
        y = (i // tiles_w) * image_size
        crops.append(resized.crop((x, y, x + image_size, y + image_size)))
    return crops, (tiles_w, tiles_h)


def images_to_nchw(imgs: Sequence[Image.Image]) -> np.ndarray:
    """Stack to [N,3,H,W] float32 in [-1,1] (mean=std=0.5, main.rs:1300-1326).

    Writes straight into the output buffer per channel (u8 gather + /255,
    then in-place *2-1): one f32 materialization instead of the naive
    convert/divide/transpose/stack chain's four — ~2.4x on the 1-core host,
    bit-identical values (same f32 op sequence per element). The host
    pixel path bounds crop-mode throughput, so these milliseconds are
    end-to-end milliseconds."""
    w, h = imgs[0].size
    out = np.empty((len(imgs), 3, h, w), np.float32)
    for i, im in enumerate(imgs):
        a = np.asarray(im if im.mode == "RGB" else im.convert("RGB"))
        dst = out[i]
        for c in range(3):
            np.divide(a[:, :, c], np.float32(255.0), out=dst[c], casting="unsafe")
        np.multiply(dst, np.float32(2.0), out=dst)
        np.subtract(dst, np.float32(1.0), out=dst)
    return out


def images_to_u8_nchw(imgs: Sequence[Image.Image]) -> np.ndarray:
    """Stack to [N,3,H,W] uint8 — raw pixels, normalization deferred to the
    device (models.deepseek_ocr2.normalize_pixels, bit-identical to
    images_to_nchw). 4x fewer host->device bytes and no host f32 pass; the
    pixel transfer and normalize were the admission bottleneck on a
    tunneled/PCIe link."""
    w, h = imgs[0].size
    out = np.empty((len(imgs), 3, h, w), np.uint8)
    for i, im in enumerate(imgs):
        a = np.asarray(im if im.mode == "RGB" else im.convert("RGB"))
        out[i] = a.transpose(2, 0, 1)
    return out


def preprocess_base_u8(img: Image.Image, size: int, pad_color: int = 127) -> np.ndarray:
    """Letterbox only -> [1, 3, size, size] uint8 (device normalizes)."""
    return images_to_u8_nchw([pad_to_square(img, size, pad_color)])


def preprocess_tiles_u8(
    img: Image.Image, size: int, ratio: Tuple[int, int]
) -> np.ndarray:
    """Dynamic-tiling crops -> [P, 3, size, size] uint8 (device normalizes)."""
    resized = img.resize((size * ratio[0], size * ratio[1]), Image.BICUBIC)
    crops = []
    for i in range(ratio[0] * ratio[1]):
        x = (i % ratio[0]) * size
        y = (i // ratio[0]) * size
        crops.append(resized.crop((x, y, x + size, y + size)))
    return images_to_u8_nchw(crops)


def should_crop(img: Image.Image, crop_mode: bool, crop_image_size: int) -> bool:
    """Dynamic tiling triggers only for large images (main.rs:1430-1436)."""
    w, h = img.size
    return crop_mode and (w > crop_image_size or h > crop_image_size)


# ---------------------------------------------------------------------------
# Fused front-end entry points (native C++ fast path, PIL fallback)
# ---------------------------------------------------------------------------


def use_native() -> bool:
    """Native path is opt-in: its Catmull-Rom resize is more precise than
    PIL's fixed-point one (PIL clips the intermediate pass to uint8), so the
    default stays PIL for bit-parity with HF preprocessing."""
    import os

    if not os.environ.get("DEEPSEEK_NATIVE_PREPROCESS"):
        return False
    from . import native

    return native.available()


def preprocess_base_nchw(img: Image.Image, size: int, pad_color: int = 127) -> np.ndarray:
    """Letterbox + normalize -> [1, 3, size, size] float32 (fused)."""
    if use_native():
        from . import native

        out = native.pad_normalize(np.asarray(img.convert("RGB")), size, pad_color)
        if out is not None:
            return out[None]
    return images_to_nchw([pad_to_square(img, size, pad_color)])


def preprocess_tiles_nchw(
    img: Image.Image, size: int, ratio: Tuple[int, int]
) -> np.ndarray:
    """Dynamic-tiling crops + normalize -> [P, 3, size, size] float32 (fused)."""
    if use_native():
        from . import native

        out = native.tile_normalize(np.asarray(img.convert("RGB")), size, ratio[0], ratio[1])
        if out is not None:
            return out
    resized = img.resize((size * ratio[0], size * ratio[1]), Image.BICUBIC)
    crops = []
    for i in range(ratio[0] * ratio[1]):
        x = (i % ratio[0]) * size
        y = (i // ratio[0]) * size
        crops.append(resized.crop((x, y, x + size, y + size)))
    return images_to_nchw(crops)
