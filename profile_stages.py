"""Per-stage on-chip timing of the steady-state frame step.

Times each pipeline stage (pyramid, KLT, pose-only, joint pose+deformation,
point reuse, triangulation mapping, keyframe BA) in isolation plus the fused
frame step, on whatever backend JAX selects (real TPU under the relay).

All timings use utils.profiler.chained_timeit: each call's input is
perturbed by the previous call's output so the relay cannot elide repeated
identical executions (which otherwise collapses timings to ~0.1 ms of
dispatch overhead).

Usage: python profile_stages.py  [BENCH_POINTS/BENCH_H/BENCH_W env as bench.py]
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # reuse the problem builder
from nrslam_tpu.utils.profiler import chained_timeit


def main():
    from functools import partial

    from nrslam_tpu.ops import klt
    from nrslam_tpu.slam import mapping as mapping_mod
    from nrslam_tpu.slam import state as state_mod
    from nrslam_tpu.slam import system as system_mod
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
    results["pyramid"] = chained_timeit(
        lambda g: pyr_fn(g)[0][0], lambda eps: raw_frames[4] + eps)

    track_fn = jax.jit(partial(
        klt.track, config=config.klt_config, min_ssim=config.klt_min_ssim,
        use_initial_flow=True))
    results["klt_track"] = chained_timeit(
        lambda kp: track_fn(pyr, s.refs, kp, s.status)[0],
        lambda eps: s.keypoints + eps)

    with3d = state_mod.tracked_with_3d(s)
    po_fn = jax.jit(pose_only.camera_pose_optimization)
    results["pose_only"] = chained_timeit(
        lambda kp: po_fn(cam, s.Tcw, s.positions, kp, with3d).t,
        lambda eps: s.keypoints + eps)

    nbr = graph_mod.top_k_neighbors(s.graph, with3d,
                                    config.regularizers_per_point)
    nbr_idx, nbr_w, nbr_d0, nbr_valid = nbr
    pairs = pd.pairs_from_neighbors(nbr_idx, nbr_w, nbr_d0,
                                    nbr_valid & with3d[:, None])

    joint_fn = jax.jit(lambda kp: pd.pose_deformation_optimization(
        cam, s.Tcw, s.positions, kp, with3d, pairs, s.scale).flows)
    results["pose_deformation"] = chained_timeit(
        joint_fn, lambda eps: s.keypoints + eps)

    nbr_fn = jax.jit(partial(graph_mod.top_k_neighbors,
                             k=config.regularizers_per_point))
    results["top_k_neighbors"] = chained_timeit(
        lambda g: nbr_fn(g, with3d)[1], lambda eps: s.graph._replace(
            weight=s.graph.weight + eps))

    reuse_fn = jax.jit(lambda st: tracking_mod.point_reuse(
        st, pyr, cam, config, None).keypoints)
    results["point_reuse"] = chained_timeit(
        reuse_fn, lambda eps: s._replace(positions=s.positions + eps))

    trk_nokf = jax.jit(lambda st: tracking_mod.process_frame(
        st, pyr, mask, cam, config, make_keyframe=False)[0].positions)
    results["tracking_frame_nokf"] = chained_timeit(
        trk_nokf, lambda eps: s._replace(positions=s.positions + eps))
    trk_kf = jax.jit(lambda st: tracking_mod.process_frame(
        st, pyr, mask, cam, config, make_keyframe=True)[0].positions)
    results["tracking_frame_kf"] = chained_timeit(
        trk_kf, lambda eps: s._replace(positions=s.positions + eps))

    map_tri = jax.jit(lambda st: mapping_mod.do_mapping(
        st, cam, config, has_new_keyframe=False).positions)
    results["mapping_triangulate"] = chained_timeit(
        map_tri, lambda eps: s._replace(positions=s.positions + eps))
    map_ba = jax.jit(lambda st: mapping_mod.do_mapping(
        st, cam, config, has_new_keyframe=True).positions)
    results["mapping_ba"] = chained_timeit(
        map_ba, lambda eps: s._replace(positions=s.positions + eps))

    def full(st, raw, make_kf):
        st2, _ = system_mod.frame_step(st, raw, mask, cam, config, make_kf)
        return st2.positions
    results["full_frame_nokf"] = chained_timeit(
        lambda st: full(st, raw_frames[4], False),
        lambda eps: s._replace(positions=s.positions + eps))
    results["full_frame_kf"] = chained_timeit(
        lambda st: full(st, raw_frames[4], True),
        lambda eps: s._replace(positions=s.positions + eps))

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
