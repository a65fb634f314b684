"""Per-stage on-chip timing of the steady-state frame step.

Times each pipeline stage (pyramid, KLT, pose-only, joint pose+deformation,
point reuse, triangulation mapping, keyframe BA) in isolation plus the fused
frame step, on whatever backend JAX selects (real TPU under the relay).

Usage: python profile_stages.py  [BENCH_POINTS/BENCH_H/BENCH_W env as bench.py]
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # reuse the problem builder


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from functools import partial

    from nrslam_tpu.ops import klt
    from nrslam_tpu.slam import mapping as mapping_mod
    from nrslam_tpu.slam import state as state_mod
    from nrslam_tpu.slam import tracking as tracking_mod
    from nrslam_tpu.slam import graph as graph_mod
    from nrslam_tpu.solver import pose_only, pose_deformation as pd

    state, frames, mask, cam, config, raw_frames = bench.build_bench_problem()

    # Advance a few frames so the state is a realistic steady state.
    s = state
    for i, kf in [(0, False), (1, True), (2, False), (3, True)]:
        pyr = klt.build_pyramid(raw_frames[i], config.klt_config)
        s, _ = tracking_mod.process_frame(s, pyr, mask, cam, config,
                                          make_keyframe=kf)
        s = mapping_mod.do_mapping(s, cam, config, has_new_keyframe=kf)
    jax.block_until_ready(s.positions)

    pyr = klt.build_pyramid(raw_frames[4], config.klt_config)
    jax.block_until_ready(pyr[0][0])

    results = {}

    pyr_fn = jax.jit(lambda g: klt.build_pyramid(g, config.klt_config))
    results["pyramid"] = timeit(pyr_fn, raw_frames[4])

    track_fn = jax.jit(partial(
        klt.track, config=config.klt_config, min_ssim=config.klt_min_ssim,
        use_initial_flow=True))
    results["klt_track"] = timeit(
        track_fn, pyr, s.refs, s.keypoints, s.status)

    with3d = state_mod.tracked_with_3d(s)
    po_fn = jax.jit(pose_only.camera_pose_optimization, static_argnums=())
    results["pose_only"] = timeit(
        po_fn, cam, s.Tcw, s.positions, s.keypoints, with3d)

    nbr = graph_mod.top_k_neighbors(s.graph, with3d,
                                    config.regularizers_per_point)
    nbr_idx, nbr_w, nbr_d0, nbr_valid = nbr
    pairs = pd.pairs_from_neighbors(nbr_idx, nbr_w, nbr_d0,
                                    nbr_valid & with3d[:, None])

    def joint(Tcw, positions, keypoints, with3d, pairs, scale):
        return pd.pose_deformation_optimization(
            cam, Tcw, positions, keypoints, with3d, pairs, scale)
    joint_fn = jax.jit(joint)
    results["pose_deformation"] = timeit(
        joint_fn, s.Tcw, s.positions, s.keypoints, with3d, pairs, s.scale)

    nbr_fn = jax.jit(partial(graph_mod.top_k_neighbors,
                             k=config.regularizers_per_point))
    results["top_k_neighbors"] = timeit(nbr_fn, s.graph, with3d)

    reuse_fn = jax.jit(partial(tracking_mod.point_reuse, config=config,
                               lost_mask=None), static_argnames=())
    try:
        results["point_reuse"] = timeit(
            jax.jit(lambda st, py: tracking_mod.point_reuse(
                st, py, cam, config, None)), s, pyr)
    except Exception as e:  # noqa: BLE001
        results["point_reuse"] = f"err {e}"

    results["tracking_frame_nokf"] = timeit(
        lambda: tracking_mod.process_frame(s, pyr, mask, cam, config,
                                           make_keyframe=False)[0].positions)
    results["tracking_frame_kf"] = timeit(
        lambda: tracking_mod.process_frame(s, pyr, mask, cam, config,
                                           make_keyframe=True)[0].positions)
    results["mapping_triangulate"] = timeit(
        lambda: mapping_mod.do_mapping(s, cam, config,
                                       has_new_keyframe=False).positions)
    results["mapping_ba"] = timeit(
        lambda: mapping_mod.do_mapping(s, cam, config,
                                       has_new_keyframe=True).positions)

    def full_nokf():
        p = pyr_fn(raw_frames[4])
        st, _ = tracking_mod.process_frame(s, p, mask, cam, config,
                                           make_keyframe=False)
        return mapping_mod.do_mapping(st, cam, config,
                                      has_new_keyframe=False).positions
    results["full_frame_nokf"] = timeit(full_nokf)

    def full_kf():
        p = pyr_fn(raw_frames[4])
        st, _ = tracking_mod.process_frame(s, p, mask, cam, config,
                                           make_keyframe=True)
        return mapping_mod.do_mapping(st, cam, config,
                                      has_new_keyframe=True).positions
    results["full_frame_kf"] = timeit(full_kf)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
