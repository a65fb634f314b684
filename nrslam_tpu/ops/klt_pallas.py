"""Pallas TPU kernel for the KLT per-level iteration loop.

The signature hand-written kernel of the framework (SURVEY.md §3.5 hot-loop
#1): for one pyramid level, every point runs its full flow iteration
(sample window -> gain/bias -> 2x2 normal equations -> update -> gates)
inside a single kernel program. The per-point image neighborhood arrives as
a pre-extracted [TILE_R, TILE_C] tile (the wrapper extracts tiles with the
same one-hot MXU matmuls as the XLA path), so the kernel contains no DMA
and no dynamic-slice alignment hazards — v1 DMA'd the tile from the level
image in HBM, which Mosaic rejects when the level image lands in VMEM
(dynamic slice offsets must be divisible by the (8, 128) tiling).

Why one kernel per level wins: the XLA path runs the flow iteration as a
`lax.while_loop` of ~15 small ops per trip — tens of serial dispatches per
level. Here the whole iteration runs on VMEM-resident tiles in one program
launch per level.

Window alignment against the reference patch uses dynamic circular rolls
(cheap VPU data movement) and masked reductions.

The JAX wrapper (ops/klt.py) keeps the level pyramid loop, the status
bookkeeping and the SSIM gate; this kernel returns final positions plus an
event code per point:
  0 = ran to iteration limit or converged
  1 = out of image bounds (pre- or post-update check)
  2 = degenerate gradient matrix (min-eig / det failure)
  3 = drift reset (> 10 px from level start)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 48    # tile rows: 22 window + 2*13 margin
TILE_C = 128   # tile cols: lane-aligned

EVENT_NONE = 0
EVENT_OOB = 1
EVENT_DEGENERATE = 2
EVENT_DRIFT = 3

FLT_SCALE = 1.0 / (1 << 20)
IVAL_SCALE = 32.0


def _level_kernel(
        # scalar prefetch (SMEM)
        pts_ref, active_ref, mean_i_ref, mean_i2_ref, hw_ref,
        tile_x0_ref, tile_y0_ref,
        # blocked inputs (VMEM, one [TILE_R, TILE_C] tile per point)
        timg_ref, tgx_ref, tgy_ref, patch_ref, pgx_ref, pgy_ref,
        # outputs
        out_pts_ref, out_event_ref,
        *, win: int, max_iters: int, epsilon: float, min_eig_threshold: float):
    p = pl.program_id(0)
    h = hw_ref[0]
    w = hw_ref[1]
    half = (win - 1) * 0.5
    area = float(win * win)
    border_gap = win // 2 + 1  # round(win/2) + 1 for odd win

    px = pts_ref[p, 0]
    py = pts_ref[p, 1]
    active = active_ref[p] != 0
    x0 = tile_x0_ref[p]
    y0 = tile_y0_ref[p]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    win_mask = (row_ids < win) & (col_ids < win)

    mean_i = mean_i_ref[p]
    mean_i2 = mean_i2_ref[p]

    T = timg_ref[0] * IVAL_SCALE
    GX = tgx_ref[0]
    GY = tgy_ref[0]

    def shift1(a, axis):
        return pltpu.roll(a, TILE_R - 1 if axis == 0 else TILE_C - 1, axis)

    # Pre-shifted copies for the in-iteration bilinear blend.
    T01 = shift1(T, 1)
    T10 = shift1(T, 0)
    T11 = shift1(T10, 1)
    GX01 = shift1(GX, 1)
    GX10 = shift1(GX, 0)
    GX11 = shift1(GX10, 1)
    GY01 = shift1(GY, 1)
    GY10 = shift1(GY, 0)
    GY11 = shift1(GY10, 1)

    # Reference windows arrive zero-padded to tile shape (wrapper pads).
    refI = patch_ref[0]
    refGX = pgx_ref[0]
    refGY = pgy_ref[0]

    start_x, start_y = px, py

    def body(j, carry):
        x, y, pdx, pdy, done, event = carry
        run = active & ~done

        # Pre-sample image bounds check (lucas_kanade_tracker.cc:227-239).
        ipx = jnp.floor(x - half)
        ipy = jnp.floor(y - half)
        oob = ((ipx < -border_gap) | (ipx >= (w - border_gap).astype(jnp.float32))
               | (ipy < -border_gap) | (ipy >= (h - border_gap).astype(jnp.float32)))
        event = jnp.where(run & oob, EVENT_OOB, event)
        done = done | (run & oob)
        run = run & ~oob

        fx = x - half - ipx
        fy = y - half - ipy
        dx = jnp.clip(ipx.astype(jnp.int32) - x0, 0, TILE_C - win - 1)
        dy = jnp.clip(ipy.astype(jnp.int32) - y0, 0, TILE_R - win - 1)

        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy

        def window(a, a01, a10, a11):
            blend = w00 * a + w01 * a01 + w10 * a10 + w11 * a11
            rolled = pltpu.roll(pltpu.roll(blend, (TILE_R - dy) % TILE_R, 0),
                                (TILE_C - dx) % TILE_C, 1)
            return jnp.where(win_mask, rolled, 0.0)

        J = window(T, T01, T10, T11)
        JGX = window(GX, GX01, GX10, GX11)
        JGY = window(GY, GY01, GY10, GY11)

        mean_j = jnp.sum(J) * FLT_SCALE / area
        mean_j2 = jnp.sum(J * J) * FLT_SCALE / area
        alpha = jnp.sqrt(mean_i2 / jnp.maximum(mean_j2, 1e-20))
        beta = mean_i - alpha * mean_j

        diff = J * alpha - refI - jnp.where(win_mask, beta, 0.0)
        dgx = refGX + JGX * alpha
        dgy = refGY + JGY * alpha

        b1 = jnp.sum(diff * dgx) * FLT_SCALE
        b2 = jnp.sum(diff * dgy) * FLT_SCALE
        a11 = jnp.sum(dgx * dgx) * FLT_SCALE
        a12 = jnp.sum(dgx * dgy) * FLT_SCALE
        a22 = jnp.sum(dgy * dgy) * FLT_SCALE

        det = a11 * a22 - a12 * a12
        min_eig = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4 * a12 * a12)) / (2.0 * area)
        degenerate = (min_eig < min_eig_threshold) | (det < 1e-30)
        event = jnp.where(run & degenerate, EVENT_DEGENERATE, event)
        # Reference retries (continue) on degeneracy with unchanged state —
        # an infinite no-op, so masking the update is equivalent.
        solve = run & ~degenerate

        safe_det = jnp.where(jnp.abs(det) > 0, det, 1.0)
        ddx = jnp.where(solve, (a12 * b2 - a22 * b1) / safe_det, 0.0)
        ddy = jnp.where(solve, (a12 * b1 - a11 * b2) / safe_det, 0.0)

        nx = x + ddx
        ny = y + ddy

        out_post = solve & ((nx < border_gap + 1) | (nx >= (w - 1 - border_gap).astype(jnp.float32))
                            | (ny < border_gap + 1) | (ny >= (h - 1 - border_gap).astype(jnp.float32)))
        event = jnp.where(out_post, EVENT_OOB, event)

        drift2 = (nx - start_x) ** 2 + (ny - start_y) ** 2
        drifted = solve & ~out_post & (drift2 > 100.0)
        event = jnp.where(drifted, EVENT_DRIFT, event)
        nx = jnp.where(drifted, start_x, nx)
        ny = jnp.where(drifted, start_y, ny)

        live = solve & ~out_post & ~drifted
        converged = live & (ddx * ddx + ddy * ddy <= epsilon)
        oscillating = live & (j > 0) & (jnp.abs(ddx + pdx) < 0.01) \
            & (jnp.abs(ddy + pdy) < 0.01)
        nx = jnp.where(oscillating & ~converged, nx - ddx * 0.5, nx)
        ny = jnp.where(oscillating & ~converged, ny - ddy * 0.5, ny)

        done = done | out_post | drifted | converged | oscillating
        x = jnp.where(solve, nx, x)
        y = jnp.where(solve, ny, y)
        return x, y, ddx, ddy, done, event

    init = (px, py, jnp.float32(0.0), jnp.float32(0.0), ~active,
            jnp.int32(EVENT_NONE))
    x, y, _, _, _, event = jax.lax.fori_loop(0, max_iters, body, init)

    out_pts_ref[p, 0] = x
    out_pts_ref[p, 1] = y
    out_event_ref[p] = event


def track_level(img, gx, gy, patch, patch_gx, patch_gy, pts, active,
                mean_i, mean_i2, win: int, max_iters: int, epsilon: float,
                min_eig_threshold: float, interpret: bool = False):
    """Run the per-level KLT iteration kernel.

    Args:
      img/gx/gy: [H, W] float32 level image + Scharr gradients.
      patch*: [P, win, win] reference windows (ival units / Scharr units).
      pts: [P, 2] start positions at this level's scale.
      active: [P] bool — points to track at this level.
      mean_i/mean_i2: [P] descaled reference means.

    Returns (pts [P, 2], event [P] int32) — see module docstring for codes.
    """
    P = pts.shape[0]
    h, w = img.shape
    hw = jnp.array([h, w], jnp.int32)

    # Per-point tiles covering the whole iteration range (drift clamp bounds
    # every sampled position to <= 10 px from the level start): extracted
    # with the same one-hot MXU matmuls as the XLA path, at the level start.
    half = (win - 1) * 0.5
    margin = (TILE_R - (win + 1)) // 2
    tile_x0 = jnp.floor(pts[:, 0] - half).astype(jnp.int32) - margin
    tile_y0 = jnp.floor(pts[:, 1] - half).astype(jnp.int32) - margin
    rows = jnp.clip(tile_y0[:, None] + jnp.arange(TILE_R), 0, h - 1)
    cols = jnp.clip(tile_x0[:, None] + jnp.arange(TILE_C), 0, w - 1)
    R = jax.nn.one_hot(rows, h, dtype=jnp.float32)        # [P, TR, H]
    C = jax.nn.one_hot(cols, w, dtype=jnp.float32)        # [P, TC, W]

    def extract(a):
        rowsel = jnp.einsum("prh,hw->prw", R, a)
        return jnp.einsum("prw,pcw->prc", rowsel, C)

    timg = extract(img)
    tgx = extract(gx)
    tgy = extract(gy)

    # Zero-pad the reference windows to the tile layout (one pad per level).
    def pad(a):
        return jnp.pad(a, ((0, 0), (0, TILE_R - win), (0, TILE_C - win)))

    patch = pad(patch)
    patch_gx = pad(patch_gx)
    patch_gy = pad(patch_gy)

    tile_spec = pl.BlockSpec((1, TILE_R, TILE_C), lambda p, *_: (p, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(P,),
        in_specs=[tile_spec] * 6,
        out_specs=[
            # Whole-array SMEM outputs; each program writes its own slot
            # (small per-point blocks violate the (8, 128) tiling rule).
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )

    kernel = functools.partial(
        _level_kernel, win=win, max_iters=max_iters, epsilon=epsilon,
        min_eig_threshold=min_eig_threshold)

    out_pts, out_event = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, 2), jnp.float32),
            jax.ShapeDtypeStruct((P,), jnp.int32),
        ],
        interpret=interpret,
    )(pts, active.astype(jnp.int32), mean_i, mean_i2, hw,
      tile_x0, tile_y0,
      timg, tgx, tgy, patch, patch_gx, patch_gy)
    return out_pts, out_event
