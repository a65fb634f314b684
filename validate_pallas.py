"""On-chip validation of the Pallas KLT level kernel vs the XLA path.

Round-1 note: the kernel passes interpret-mode parity tests but its first
on-chip run coincided with a backend wedge, so it ships opt-in
(KLTConfig.use_pallas=False). This script runs it for real, in an isolated
process, and compares against the XLA one-hot-matmul path point by point.

Exit code 0 + "PALLAS OK" means the kernel is safe to enable on this backend.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    from nrslam_tpu.datasets import synthetic
    from nrslam_tpu.ops import klt

    print("backend:", jax.default_backend(), jax.devices()[:1], flush=True)

    scene = synthetic.SceneConfig(height=240, width=320, deform_amp=0.02)
    gray0, _, _ = synthetic.render_frame(0, scene)
    gray1, _, _ = synthetic.render_frame(1, scene)

    P = int(os.environ.get("PALLAS_POINTS", 256))
    cfg_x = klt.KLTConfig(use_pallas=False)
    cfg_p = klt.KLTConfig(use_pallas=True)

    key = jax.random.PRNGKey(0)
    uv = jnp.stack([
        30 + 260 * jax.random.uniform(key, (P,)),
        30 + 180 * jax.random.uniform(jax.random.fold_in(key, 1), (P,)),
    ], -1)
    valid = jnp.ones(P, bool)
    pyr0 = klt.build_pyramid(gray0, cfg_x)
    pyr1 = klt.build_pyramid(gray1, cfg_x)
    refs = klt.set_reference(pyr0, uv, valid, cfg_x)
    status0 = jnp.zeros(P, jnp.int32)

    t0 = time.perf_counter()
    pts_x, st_x = jax.jit(lambda: klt.track(
        pyr1, refs, uv, status0, cfg_x, min_ssim=0.7))()
    jax.block_until_ready(pts_x)
    print(f"xla path compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    pts_p, st_p = jax.jit(lambda: klt.track(
        pyr1, refs, uv, status0, cfg_p, min_ssim=0.7))()
    jax.block_until_ready(pts_p)
    print(f"pallas path compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # timing (warm)
    fx = jax.jit(lambda s: klt.track(pyr1, refs, uv, s, cfg_x, min_ssim=0.7))
    fp = jax.jit(lambda s: klt.track(pyr1, refs, uv, s, cfg_p, min_ssim=0.7))
    for f, name in [(fx, "xla"), (fp, "pallas")]:
        jax.block_until_ready(f(status0))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(status0)
        jax.block_until_ready(out)
        print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)

    pts_x = np.asarray(pts_x)
    pts_p = np.asarray(pts_p)
    st_x = np.asarray(st_x)
    st_p = np.asarray(st_p)
    ok_both = (st_x <= 2) & (st_p <= 2)
    d = np.linalg.norm(pts_x - pts_p, axis=-1)
    agree = (st_x == st_p).mean()
    print(f"status agreement: {agree:.3f}")
    print(f"tracked-by-both: {ok_both.sum()}/{P}")
    if ok_both.sum():
        print(f"pos diff px: median {np.median(d[ok_both]):.4f} "
              f"p95 {np.percentile(d[ok_both], 95):.4f} "
              f"max {d[ok_both].max():.4f}")
    ok = (agree > 0.9 and ok_both.sum() > 0.7 * P
          and np.median(d[ok_both]) < 0.1 and np.percentile(d[ok_both], 95) < 1.0)
    print("PALLAS OK" if ok else "PALLAS MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
