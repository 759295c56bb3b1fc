"""Device-side bit-exact PIL resize (Catmull-Rom / PIL "BICUBIC").

The OCR front end's throughput ceiling on a 1-core host is PIL's resize
(~39 ms for a 2200x1700 -> 1024 letterbox, ~2x that for crop-mode tiling,
reference main.rs:462-481, 1258-1298). This module moves the resize onto the
TPU while staying BIT-IDENTICAL to PIL's fixed-point resample, so the
HF-preprocessing parity contract is untouched (the native C++ path is only
~close — it filters in double precision; PIL clips the intermediate pass to
uint8 and rounds coefficients to 1/2^22).

How PIL resamples 8-bit images (Pillow Resample.c, two separable passes,
horizontal first):

- per output pixel: taps ``x in [xmin, xmin+xmax)`` with double weights from
  the Catmull-Rom kernel, normalized to sum 1, then rounded to int32
  fixed-point ``kk = trunc(w * 2^22 +- 0.5)``;
- pass math: ``ss = 2^21 + sum(pixel * kk)`` in int32, output
  ``clip8(ss)`` = ``0 if ss<=0 else 255 if ss>=2^30 else ss>>22`` — the
  INTERMEDIATE image between the passes is uint8.

TPU mapping (everything exact, no floating-point error anywhere):

- the sparse tap structure is expanded on-device into a dense [W, OW]
  coefficient matrix (each column has <=ksize nonzeros) so the pass is ONE
  MXU GEMM instead of a per-lane gather Mosaic can't vectorize;
- int32 coefficients don't fit bf16, so each ``kk`` is split into three
  balanced base-256 digits ``kk = d2*2^16 + d1*2^8 + d0`` with
  ``|di| <= 128``. Digits and uint8 pixels are exact in bf16; every product
  is <= 255*128 and every partial sum < 2^24, so the bf16 MXU GEMM with f32
  accumulation (Precision.DEFAULT — single pass) is EXACT integer
  arithmetic. The three digit-plane GEMMs are recombined in int32 with
  shifts, reproducing PIL's ``ss`` bit-for-bit (|ss| < 2^31 because the
  normalized |kk| sum to ~1.3*2^22 — the same bound PIL's own int32
  accumulator relies on).
- letterbox paste offsets are folded into the coefficient placement
  (columns outside the pasted box get zero coefficients and are masked to
  the pad color), so ``pad_to_square`` is the same two GEMMs + a select.

Input images are zero-padded up to a shape bucket (multiples of 256) to
bound jit recompiles; padding rows/columns have zero coefficients so the
result is exactly the unpadded resize.

Host cost per page: coefficient tables (lru-cached numpy, ~micro-seconds)
+ one uint8 ship of the original image (usually FEWER bytes than shipping
the resized global view + tiles). Device cost: ~2-5 ms of GEMMs per page.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 22  # Pillow Resample.c: 32 - 8 - 2
_ROUND = 1 << (PRECISION_BITS - 1)
_CLIP_HI = (1 << (PRECISION_BITS + 8)) - 1
BUCKET = 256  # input images pad up to multiples of this (compile-variant cap)


def _cubic(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom (a=-0.5), same expression order as Pillow's bicubic_filter."""
    a = -0.5
    x = np.abs(x)
    in1 = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    in2 = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, in1, np.where(x < 2.0, in2, 0.0))


@functools.lru_cache(maxsize=256)
def pil_coeffs(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """PIL precompute_coeffs + normalize_coeffs_8bpc, bit-exact.

    Returns (xmin int32 [out], kk int32 [out, ksize]); taps for output pixel
    ``o`` read input pixels ``xmin[o] + k`` with fixed-point weight
    ``kk[o, k]`` (zero-padded beyond the valid tap count).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    ksize = int(math.ceil(support)) * 2 + 1

    xx = np.arange(out_size, dtype=np.float64)
    center = (xx + 0.5) * scale
    # C int casts truncate toward zero.
    xmin = np.trunc(center - support + 0.5).astype(np.int64)
    xmin = np.maximum(xmin, 0)
    xmax = np.trunc(center + support + 0.5).astype(np.int64)
    xmax = np.minimum(xmax, in_size) - xmin

    ss = 1.0 / filterscale
    k_idx = np.arange(ksize, dtype=np.int64)
    # Same fp-op order as Pillow: ((x + xmin) - center + 0.5) * ss.
    pos = ((k_idx[None, :] + xmin[:, None]).astype(np.float64) - center[:, None] + 0.5) * ss
    w = _cubic(pos)
    w = np.where(k_idx[None, :] < xmax[:, None], w, 0.0)
    # Sequential tap-order accumulation (vectorized over outputs) matches
    # Pillow's `ww += w` loop rounding exactly; adding exact 0.0 is identity.
    ww = np.zeros(out_size, dtype=np.float64)
    for k in range(ksize):
        ww += w[:, k]
    w = np.where(ww[:, None] != 0.0, w / np.where(ww == 0.0, 1.0, ww)[:, None], w)

    scaled = w * float(1 << PRECISION_BITS)
    kk = np.where(scaled < 0.0, np.trunc(scaled - 0.5), np.trunc(scaled + 0.5))
    return xmin.astype(np.int32), kk.astype(np.int32)


def _digits3(kk: np.ndarray) -> np.ndarray:
    """Balanced base-256 split: kk == d2*2^16 + d1*2^8 + d0, |di| <= 128.

    Each digit is exactly representable in bf16; see module docstring.
    """
    k = kk.astype(np.int64)
    d0 = ((k + 128) % 256) - 128
    r = (k - d0) >> 8
    d1 = ((r + 128) % 256) - 128
    d2 = (r - d1) >> 8
    out = np.stack([d2, d1, d0]).astype(np.int32)
    assert np.abs(out).max(initial=0) <= 128
    return out


@functools.lru_cache(maxsize=256)
def _plain_plan(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    xmin, kk = pil_coeffs(in_size, out_size)
    return xmin, _digits3(kk)


@functools.lru_cache(maxsize=256)
def _placed_plan(
    in_size: int, canvas: int, valid: int, offset: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Coefficients for `resize to `valid` then paste at `offset` on `canvas``:
    output pixels inside [offset, offset+valid) carry the (in_size -> valid)
    taps; the rest have zero coefficients (masked to pad color on device)."""
    xmin, digs = _plain_plan(in_size, valid)
    K = digs.shape[-1]
    xmin_f = np.zeros(canvas, np.int32)
    digs_f = np.zeros((3, canvas, K), np.int32)
    xmin_f[offset : offset + valid] = xmin
    digs_f[:, offset : offset + valid] = digs
    return xmin_f, digs_f


def _expand_dense(xmin, digs, in_size: int):
    """[W, 3*O] bf16 dense digit-coefficient matrix from compact taps.

    Each (w, o) matches at most one tap k, so the accumulation has a single
    nonzero contribution — exact in bf16.
    """
    out_size = xmin.shape[0]
    K = digs.shape[-1]
    w = jax.lax.broadcasted_iota(jnp.int32, (in_size, out_size), 0)
    t = w - xmin[None, :]
    m = jnp.zeros((in_size, 3, out_size), jnp.bfloat16)
    for k in range(K):
        dk = digs[:, :, k].astype(jnp.bfloat16)  # [3, O]
        m = m + jnp.where((t == k)[:, None, :], dk[None], jnp.bfloat16(0))
    return m.reshape(in_size, 3 * out_size)


def _fixed_pass(x_u8, m, out_size: int):
    """One PIL resample pass along the LAST axis: uint8 [..., W] -> [..., O]."""
    p = jax.lax.dot_general(
        x_u8.astype(jnp.bfloat16),
        m,
        (((x_u8.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    p = p.astype(jnp.int32).reshape(*x_u8.shape[:-1], 3, out_size)
    ss = (p[..., 0, :] << 16) + (p[..., 1, :] << 8) + p[..., 2, :] + _ROUND
    return (jnp.clip(ss, 0, _CLIP_HI) >> PRECISION_BITS).astype(jnp.uint8)


def _resize_chw(img, hx, hd, vx, vd, box, pad):
    """Two fixed-point passes (horizontal then vertical, like PIL) + pad mask.

    img: uint8 [H, W, 3] (zero-padded to its bucket; padded rows/cols have
    zero coefficients). Returns uint8 [3, OH, OW]; pixels outside
    ``box = (x0, x1, y0, y1)`` become ``pad``.
    """
    H, W, _ = img.shape
    OW, OH = hx.shape[0], vx.shape[0]
    h = _fixed_pass(jnp.transpose(img, (0, 2, 1)), _expand_dense(hx, hd, W), OW)
    v = _fixed_pass(jnp.transpose(h, (1, 2, 0)), _expand_dense(vx, vd, H), OH)
    out = jnp.transpose(v, (0, 2, 1))  # [3, OH, OW]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, OH, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, OW), 2)
    valid = (col >= box[0]) & (col < box[1]) & (row >= box[2]) & (row < box[3])
    return jnp.where(valid, out, pad)


@jax.jit
def _letterbox_kernel(img, hx, hd, vx, vd, box, pad):
    return _resize_chw(img, hx, hd, vx, vd, box, pad)[None]  # [1, 3, S, S]


@functools.partial(jax.jit, static_argnames=("tiles_w", "tiles_h"))
def _tiles_kernel(img, hx, hd, vx, vd, box, pad, tiles_w: int, tiles_h: int):
    out = _resize_chw(img, hx, hd, vx, vd, box, pad)  # [3, th*S, tw*S]
    size_h = out.shape[1] // tiles_h
    size_w = out.shape[2] // tiles_w
    t = out.reshape(3, tiles_h, size_h, tiles_w, size_w)
    return jnp.transpose(t, (1, 3, 0, 2, 4)).reshape(
        tiles_w * tiles_h, 3, size_h, size_w
    )


def bucket_pad(arr: np.ndarray, bucket: int = BUCKET) -> np.ndarray:
    """Zero-pad HWC uint8 up to shape-bucket multiples (bounds jit variants)."""
    h, w = arr.shape[:2]
    hb = max(-(-h // bucket) * bucket, bucket)
    wb = max(-(-w // bucket) * bucket, bucket)
    if (hb, wb) == (h, w):
        return arr
    out = np.zeros((hb, wb, 3), np.uint8)
    out[:h, :w] = arr
    return out


def ship_image(arr: np.ndarray, device=None) -> jax.Array:
    """Pad to the shape bucket and transfer once; both the letterbox and the
    tiles kernel read the same device buffer."""
    padded = bucket_pad(np.ascontiguousarray(arr))
    return jax.device_put(padded, device)


def _full_box(ow: int, oh: int) -> jnp.ndarray:
    return jnp.asarray([0, ow, 0, oh], jnp.int32)


def device_resize_u8(
    img_dev: jax.Array, true_w: int, true_h: int, out_w: int, out_h: int
) -> jax.Array:
    """Plain PIL-bit-exact resize: [3, out_h, out_w] uint8."""
    hx, hd = _plain_plan(true_w, out_w)
    vx, vd = _plain_plan(true_h, out_h)
    return _letterbox_kernel(
        img_dev, hx, hd, vx, vd, _full_box(out_w, out_h), jnp.uint8(0)
    )[0]


def device_letterbox_u8(
    img_dev: jax.Array, true_w: int, true_h: int, size: int, pad_color: int = 127
) -> jax.Array:
    """pad_to_square on device: [1, 3, size, size] uint8, PIL-bit-exact.

    ``img_dev`` from ship_image; (true_w, true_h) are the pre-padding dims.
    Mirrors preprocess.image.pad_to_square (main.rs:462-481): aspect-fit
    resize + centered paste on a pad_color canvas.
    """
    scale = min(size / true_w, size / true_h)
    nw = max(int(round(true_w * scale)), 1)
    nh = max(int(round(true_h * scale)), 1)
    ox, oy = (size - nw) // 2, (size - nh) // 2
    hx, hd = _placed_plan(true_w, size, nw, ox)
    vx, vd = _placed_plan(true_h, size, nh, oy)
    box = jnp.asarray([ox, ox + nw, oy, oy + nh], jnp.int32)
    return _letterbox_kernel(
        img_dev, hx, hd, vx, vd, box, jnp.uint8(pad_color)
    )


def device_tiles_u8(
    img_dev: jax.Array, true_w: int, true_h: int, size: int, ratio: Tuple[int, int]
) -> jax.Array:
    """dynamic_preprocess tiling on device: [tw*th, 3, size, size] uint8,
    PIL-bit-exact (resize to (size*tw, size*th) then row-major crops,
    main.rs:1258-1298)."""
    tw, th = ratio
    hx, hd = _plain_plan(true_w, size * tw)
    vx, vd = _plain_plan(true_h, size * th)
    return _tiles_kernel(
        img_dev,
        hx,
        hd,
        vx,
        vd,
        _full_box(size * tw, size * th),
        jnp.uint8(0),
        tw,
        th,
    )


def device_preprocess_page(
    img_arr: np.ndarray,
    base_size: int,
    crop_size: int,
    crop_ratio: Optional[Tuple[int, int]],
    pad_color: int = 127,
    dev: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full OCR pixel front end on device from one raw-image ship.

    Returns (base [1,3,S,S] uint8, tiles [P,3,c,c] uint8 or None) — the same
    contract as preprocess_base_u8 / preprocess_tiles_u8, downstream
    normalize_pixels consumes either.

    `dev`: optionally a pre-staged bucket-padded device buffer for this
    image (from a BATCHED ship — the tunnel's device_put costs ~100 ms per
    call on top of bandwidth, so the serve prefetcher stacks several pages
    into one transfer and passes per-page slices here).
    """
    h, w = img_arr.shape[:2]
    if dev is None:
        dev = ship_image(img_arr)
    tiles = (
        device_tiles_u8(dev, w, h, crop_size, crop_ratio)
        if crop_ratio is not None
        else None
    )
    base = device_letterbox_u8(dev, w, h, base_size, pad_color)
    return base, tiles
