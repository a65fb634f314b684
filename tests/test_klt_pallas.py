"""Pallas KLT kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrslam_tpu.ops import klt
from tests.test_klt import textured_image, shift_image, grid_points


CFG_XLA = klt.KLTConfig(win=21, max_level=3, max_iters=10, epsilon=1e-4,
                        min_eig_threshold=1e-4)
CFG_PAL = CFG_XLA._replace(use_pallas=True, pallas_interpret=True)


def _run(cfg, img, img2, pts):
    valid = jnp.ones(pts.shape[0], bool)
    pyr1 = klt.build_pyramid(img, cfg)
    pyr2 = klt.build_pyramid(img2, cfg)
    refs = klt.set_reference(pyr1, pts, valid, cfg)
    statuses = jnp.full(pts.shape[0], klt.TRACKED, jnp.int32)
    return klt.track(pyr2, refs, pts, statuses, cfg, min_ssim=0.5)


def test_pallas_matches_xla_path():
    img = textured_image()
    img2 = shift_image(img, 2.7, -1.9)
    pts = grid_points(*img.shape)

    pts_x, st_x = _run(CFG_XLA, img, img2, pts)
    pts_p, st_p = _run(CFG_PAL, img, img2, pts)

    ok_x = np.asarray(klt.is_usable(st_x))
    ok_p = np.asarray(klt.is_usable(st_p))
    # Same points should track (allow a stray disagreement at gates).
    assert (ok_x == ok_p).mean() > 0.95, (ok_x.sum(), ok_p.sum())
    both = ok_x & ok_p
    d = np.linalg.norm(np.asarray(pts_x - pts_p)[both], axis=-1)
    assert np.median(d) < 0.05, np.median(d)
    assert np.max(d) < 0.5, np.max(d)


def test_pallas_recovers_translation():
    img = textured_image(seed=4)
    dx, dy = 3.1, 2.2
    img2 = shift_image(img, dx, dy)
    pts = grid_points(*img.shape)
    out_pts, st = _run(CFG_PAL, img, img2, pts)
    ok = np.asarray(klt.is_usable(st))
    assert ok.mean() > 0.8
    flow = np.asarray(out_pts - pts)[ok]
    err = np.abs(flow - np.array([dx, dy]))
    assert np.median(err[:, 0]) < 0.15 and np.median(err[:, 1]) < 0.15
