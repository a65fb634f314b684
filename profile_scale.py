"""Reference-scale sweep: bench fps across operating points + init at 4000.

VERDICT r3 item 3: the reference tracks half-res Endomapper frames
(~720x540 -> apps/endomapper.cc:66-67) and initializes with up to 4000
features (tracking.cc:46-61); the repo bench defaults to 320x240 / P=384.
This harness records the steady-state frame rate at the default and scaled
points (BENCH_* env knobs of bench.py) and times a monocular-initializer
pass at max_features=4000, so the dense-[P,P]-graph and one-hot-sampling
design decisions are justified by measurement, not defaults.

Run on the real TPU: ``python profile_scale.py`` (slow cold: each point
compiles its own program set through the relay).
"""

from __future__ import annotations

import json
import os
import time

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def bench_point(max_points, h, w, new_kp, n_frames=50):
    import bench as bench_mod
    from nrslam_tpu.slam import system as system_mod

    os.environ["BENCH_POINTS"] = str(max_points)
    os.environ["BENCH_H"] = str(h)
    os.environ["BENCH_W"] = str(w)
    os.environ["BENCH_NEW_KP"] = str(new_kp)
    state, _, mask, cam, config, raw_frames = bench_mod.build_bench_problem()

    def step(s, raw, kf):
        return system_mod.frame_step(s, raw, mask, cam, config, kf)

    s = state
    t0 = time.perf_counter()
    s, _ = step(s, raw_frames[0], False)
    s, _ = step(s, raw_frames[1], True)
    s, _ = step(s, raw_frames[2], False)
    s, _ = step(s, raw_frames[3], True)
    jax.block_until_ready(s.positions)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_frames):
        s, _ = step(s, raw_frames[i % len(raw_frames)], (i % 5) == 4)
    jax.block_until_ready(s.positions)
    dt = time.perf_counter() - t0
    return dict(P=max_points, h=h, w=w, new_kp=new_kp,
                fps=round(n_frames / dt, 1),
                frame_ms=round(dt / n_frames * 1e3, 2),
                warmup_s=round(compile_s, 1))


def init_at_scale(max_features, h, w, n_frames=8):
    """Time the monocular-initializer loop (reset -> track -> try_initialize)
    at the reference's feature budget (tracking.cc:46-61: 4000)."""
    from nrslam_tpu.datasets import synthetic
    from nrslam_tpu.ops import klt
    from nrslam_tpu.slam import initializer as init_mod
    from nrslam_tpu.slam.state import Config

    scene = synthetic.SceneConfig(height=h, width=w, deform_amp=0.02)
    seq = synthetic.SyntheticSequence(scene, n_frames=n_frames + 1)
    config = Config(rad_per_pixel=1.0 / scene.fx)
    cam = synthetic.camera(scene)
    icfg = init_mod.InitializerConfig(max_features=max_features,
                                      rad_per_pixel=1.0 / scene.fx)
    kcfg = config.klt_config

    gray0, _, _ = seq.get_frame(0)
    pyr = klt.build_pyramid(gray0, kcfg)
    mask = jnp.ones(gray0.shape, bool)

    t0 = time.perf_counter()
    st = init_mod.reset(pyr, mask, jnp.int32(0), kcfg, icfg)
    jax.block_until_ready(st.ref_keypoints)
    reset_first_s = time.perf_counter() - t0

    key = jax.random.PRNGKey(4)
    # Prerender frames and pre-derive per-frame keys (fold_in, not a
    # chained split): the renderer and the key chain are NOT part of the
    # measured init path — r4's 138.7 ms/frame figure was dominated by the
    # renderer, and per-frame split serializes through the relay.
    pyrs = [klt.build_pyramid(seq.get_frame(i)[0], kcfg)
            for i in range(1, n_frames + 1)]
    subs = [jax.random.fold_in(key, i) for i in range(n_frames)]
    jax.block_until_ready(pyrs[-1][0][0])

    def one_pass(st):
        """Desynced loop: success flags stay on device, ONE batched fetch
        at the end (the System's init_check_every pattern)."""
        flags = []
        for i, p in enumerate(pyrs[1:]):
            st, res = init_mod.init_step(st, p, mask, subs[i], cam.params,
                                         cam.kind, kcfg, icfg)
            flags.append(res.success)
        return jax.device_get(jnp.stack(flags))

    one_pass(st)   # warm pass: init_step + the flags-stack program
    t0 = time.perf_counter()
    flags = one_pass(st)
    per_frame_ms = (time.perf_counter() - t0) / (n_frames - 1) * 1e3
    success = bool(flags.any())
    return dict(max_features=max_features, h=h, w=w,
                init_frame_ms=round(per_frame_ms, 1), success=bool(success),
                first_reset_s=round(reset_first_s, 1))


def main():
    print("backend:", jax.default_backend(), jax.devices()[:1], flush=True)
    points = [
        (384, 240, 320, 128),     # bench default
        (768, 480, 640, 256),     # reference half-res scale
        (1024, 480, 640, 256),    # above-reference point budget
    ]
    rows = []
    for P, h, w, kp in points:
        r = bench_point(P, h, w, kp)
        rows.append(r)
        print(json.dumps(r), flush=True)
    r = init_at_scale(4000, 480, 640)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
