"""Object segmentation: alpha-plane extraction (SURVEY F24, videosegment.c).

TPU-native equivalent of the reference's `VideoSegment`
(FR/src/videosegment.c:150): moving-object alpha planes from temporal frame
differencing + grayscale morphology + median filtering.

Reference behavior reproduced:

* moving-pixel detection — a pixel is "moving" when it differs by >= 6 from
  the frame 3 ahead OR the frame 6 ahead (videosegment.c:268-279
  `differ1/differ2` against `r2 = +3` frames, `r3 = +6` frames, threshold 6);
* grayscale erosion / dilation with a flat square structuring element of
  constant height (the `cake` of value 10, videosegment.c:13 `grayerosion`,
  :56 `grayinflation`) — min/max pooling +/- the cake value, clipped to
  [0,255], computed here with `lax.reduce_window` instead of the quadruple
  pixel loop;
* 3x3 median filtering (videosegment.c:104 `median`) as a vectorized
  rank-5 selection over the 9 shifted planes;
* binarization to {0, GREY_LEVELS} so `plane // GREY_LEVELS` yields the
  object index used by the coder (defines_enc.h:16 `GREY_LEVELS 255`).

Everything is fixed-shape and jit-friendly; the per-frame pipeline maps onto
the VPU (elementwise + reduce_window) with no host round-trips.
"""

from functools import partial

import jax
import jax.numpy as jnp

GREY_LEVELS = 255  # defines_enc.h:16


def _pad_shift_stack(x, kh, kw, fill):
    """[kh*kw, H, W] stack of shifted copies (window gather, VPU-friendly)."""
    ph, pw = kh // 2, kw // 2
    p = jnp.pad(x, ((ph, ph), (pw, pw)), constant_values=fill)
    H, W = x.shape
    return jnp.stack([p[dy:dy + H, dx:dx + W]
                      for dy in range(kh) for dx in range(kw)])


def gray_erosion(img, cake_value: int = 10, size: int = 3):
    """Grayscale erosion, flat square element (videosegment.c:13)."""
    img = jnp.asarray(img, jnp.int32)
    st = _pad_shift_stack(img, size, size, 255)
    return jnp.clip(jnp.min(st, axis=0) - cake_value, 0, 255)


def gray_dilation(img, cake_value: int = 10, size: int = 3):
    """Grayscale dilation, flat square element (videosegment.c:56)."""
    img = jnp.asarray(img, jnp.int32)
    st = _pad_shift_stack(img, size, size, 0)
    return jnp.clip(jnp.max(st, axis=0) + cake_value, 0, 255)


def median3x3(img):
    """3x3 median (videosegment.c:104); interior-only like the reference
    (border pixels keep their input value)."""
    img = jnp.asarray(img, jnp.int32)
    st = _pad_shift_stack(img, 3, 3, 0)
    med = jnp.sort(st, axis=0)[4]
    out = img.at[1:-1, 1:-1].set(med[1:-1, 1:-1])
    return out


@partial(jax.jit, static_argnums=())
def _segment_one(cur, fwd3, fwd6):
    moving = ((jnp.abs(cur - fwd3) >= 6) | (jnp.abs(cur - fwd6) >= 6))
    plane = jnp.where(moving, 255, 0).astype(jnp.int32)
    # close (dilate, erode) to fill holes, then open (erode, dilate) to kill
    # speckle — the reference applies the same cake-10 pair (videosegment.c
    # morphology section), then a median pass.
    plane = gray_erosion(gray_dilation(plane))
    plane = gray_dilation(gray_erosion(plane))
    plane = median3x3(plane)
    return jnp.where(plane >= 128, GREY_LEVELS, 0).astype(jnp.uint8)


def segment_sequence(y_frames):
    """Alpha plane (H, W) uint8 in {0, GREY_LEVELS} per input luma frame.

    Frame t is differenced against frames t+3 and t+6 (videosegment.c:
    268-271 `r2`/`r3` strides); the tail reuses the last available frames.
    """
    n = len(y_frames)
    ys = [jnp.asarray(f, jnp.int32) for f in y_frames]
    out = []
    for t in range(n):
        out.append(_segment_one(ys[t], ys[min(t + 3, n - 1)],
                                ys[min(t + 6, n - 1)]))
    return out


def mb_region_labels(mask, mb: int = 16):
    """Per-macroblock region label from an alpha plane: 0 = all background,
    1 = all object, 2 = straddles both (block_enc.c:523-561 `region` logic).
    Returns [H//mb, W//mb] int32."""
    m = (jnp.asarray(mask, jnp.int32) // GREY_LEVELS)
    H, W = m.shape
    cells = m[:H - H % mb, :W - W % mb].reshape(H // mb, mb, W // mb, mb)
    s = cells.sum(axis=(1, 3))
    full = mb * mb
    return jnp.where(s == 0, 0, jnp.where(s == full, 1, 2)).astype(jnp.int32)
