"""Shi-Tomasi corner detection as a fused device kernel.

TPU-native re-design of /root/reference/modules/features/shi_tomasi.cc:
Sobel gradients -> 3x3-averaged structure tensor -> min-eigenvalue score ->
two-radius non-maximum suppression, all expressed as convolutions and pooling
(the reference's hand-rolled single-pass C++ becomes a handful of fused XLA
ops). Score threshold 80 and the inner/outer NMS radii (options window / 15)
match shi_tomasi.cc:123-160.

Selection returns a fixed number of slots via top-k with a validity mask —
the device-friendly replacement for the dynamic keypoint vector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nrslam_tpu.ops import image as image_ops

SCORE_THRESHOLD = 80.0  # shi_tomasi.cc:142
OUTER_RADIUS = 15       # shi_tomasi.cc:126 (NPrev)


def score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Min-eigenvalue score of the 3x3-box-averaged structure tensor.

    Gradients use the Sobel kernel (smooth [1,2,1], diff [-1,0,1]) without
    normalization, matching FastSobelXYandScore (shi_tomasi.cc:163-345);
    the tensor average uses 1/9 (shi_tomasi.h inv_size).
    """
    smooth = jnp.array([1.0, 2.0, 1.0], jnp.float32)
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    gx = image_ops._conv_sep(img, smooth, diff)
    gy = image_ops._conv_sep(img, diff, smooth)

    box = jnp.ones(3, jnp.float32)
    g11 = image_ops._conv_sep(gx * gx, box, box) / 9.0
    g12 = image_ops._conv_sep(gx * gy, box, box) / 9.0
    g22 = image_ops._conv_sep(gy * gy, box, box) / 9.0

    tr = g11 + g22
    det = g11 * g22 - g12 * g12
    root = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return (tr - root) * 0.5


def _max_pool(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")


def detect(img: jnp.ndarray, max_keypoints: int, nms_radius: int = 7,
           mask: jnp.ndarray | None = None,
           occupied: jnp.ndarray | None = None):
    """Detect up to ``max_keypoints`` corners.

    Args:
      img: [H, W] float32 grayscale.
      max_keypoints: static output capacity.
      nms_radius: inner NMS radius (reference uses 7 for tracking,
        tracking.cc:35; 5 default).
      mask: optional [H, W] bool; detections only where True (the reference
        masks keypoints after extraction, tracking.cc:121-133).
      occupied: optional [H, W] bool map of already-extracted keypoint pixels.
        Candidates within OUTER_RADIUS of an occupied pixel are suppressed
        (score-poisoning in shi_tomasi.cc:90-99 + IsLocalMaximum -1 checks).

    Returns:
      xy: [max_keypoints, 2] float32 pixel positions (x, y).
      valid: [max_keypoints] bool.
      scores: [max_keypoints] float32.
    """
    h, w = img.shape
    s = score_map(img)

    # Border: the reference only writes scores for interior pixels
    # (rows 2..H-2 via its streaming loops); zero out a 1-px frame plus the
    # filter support so maxima never sit on the border.
    interior = jnp.zeros_like(s, dtype=bool).at[2:-2, 2:-2].set(True)

    is_max = (s >= _max_pool(s, nms_radius)) & (s >= SCORE_THRESHOLD) & interior
    if occupied is not None:
        near_occupied = image_ops.dilate(occupied, 2 * OUTER_RADIUS + 1)
        is_max = is_max & ~near_occupied
    if mask is not None:
        is_max = is_max & mask

    flat = jnp.where(is_max, s, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    yy = (top_idx // w).astype(jnp.float32)
    xx = (top_idx % w).astype(jnp.float32)
    valid = jnp.isfinite(top_scores)
    xy = jnp.stack([xx, yy], axis=-1)
    return xy, valid, jnp.where(valid, top_scores, 0.0)
