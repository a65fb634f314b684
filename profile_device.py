"""Pure device-time per-stage profiling (dispatch-overhead free).

profile_stages.py times one dispatch per call, which on the remote-relay
TPU backend includes a large host->relay round trip that can swamp the
device time of small stages. This harness runs each stage K times chained
inside ONE jitted fori_loop (utils.profiler.device_timeit), so the reported
number is the on-device execution time of the stage.

Usage: python profile_device.py  [BENCH_POINTS/BENCH_H/BENCH_W env as bench.py]
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
from nrslam_tpu.utils.profiler import device_timeit


def main():
    from functools import partial

    from nrslam_tpu.ops import klt
    from nrslam_tpu.slam import graph as graph_mod
    from nrslam_tpu.slam import mapping as mapping_mod
    from nrslam_tpu.slam import state as state_mod
    from nrslam_tpu.slam import system as system_mod
    from nrslam_tpu.slam import tracking as tracking_mod
    from nrslam_tpu.solver import pose_only, pose_deformation as pd

    state, frames, mask, cam, config, raw_frames = bench.build_bench_problem()

    # Advance a few frames so the state is a realistic steady state.
    s = state
    for i, kf in [(0, False), (1, True), (2, False), (3, True)]:
        s, _ = system_mod.frame_step(s, raw_frames[i], mask, cam, config, kf)
    jax.block_until_ready(s.positions)

    pyr = klt.build_pyramid(raw_frames[4], config.klt_config)
    jax.block_until_ready(pyr[0][0])

    results = {}

    # Null-step calibration: the relay adds a variable per-dispatch floor
    # (observed anywhere from ~0.06 ms to ~26 ms per dispatch depending on
    # process/relay state). Each k-rep loop pays it once, so the per-call
    # floor is RTT/k; report it so stage figures can be read as
    # (value - null) ~= true device time.
    results["null_step"] = device_timeit(lambda g: g * 1.000001 + 1e-9,
                                         raw_frames[4])

    def consume(*arrays):
        """Tiny data-dependent scalar so XLA cannot DCE any stage output."""
        return sum(jnp.sum(a.astype(jnp.float32)) * 1e-30 for a in arrays)

    # Pyramid: carry the raw image; consume every level's image + gradients.
    def pyramid_step(g):
        p = klt.build_pyramid(g, config.klt_config)
        return g + consume(*[x for lvl in p for x in lvl])
    results["pyramid"] = device_timeit(pyramid_step, raw_frames[4])

    # KLT track: carry the keypoints.
    def klt_step(kp):
        pts, st = klt.track(pyr, s.refs, kp, s.status, config.klt_config,
                            min_ssim=config.klt_min_ssim,
                            use_initial_flow=True)
        return pts + consume(st)
    results["klt_track"] = device_timeit(klt_step, s.keypoints)

    with3d = state_mod.tracked_with_3d(s)

    def pose_only_step(kp):
        T = pose_only.camera_pose_optimization(cam, s.Tcw, s.positions, kp,
                                               with3d)
        return kp + 1e-9 * T.t[:2]
    results["pose_only"] = device_timeit(pose_only_step, s.keypoints)

    nbr = graph_mod.top_k_neighbors(s.graph, with3d,
                                    config.regularizers_per_point)
    nbr_idx, nbr_w, nbr_d0, nbr_valid = nbr
    pairs = pd.pairs_from_neighbors(nbr_idx, nbr_w, nbr_d0,
                                    nbr_valid & with3d[:, None])

    def joint_step(kp):
        res = pd.pose_deformation_optimization(
            cam, s.Tcw, s.positions, kp, with3d, pairs, s.scale)
        return kp + 1e-9 * res.flows[:, :2]
    results["pose_deformation"] = device_timeit(joint_step, s.keypoints)

    def nbr_step(w):
        g2 = s.graph._replace(weight=w)
        out = graph_mod.top_k_neighbors(g2, with3d,
                                        config.regularizers_per_point)[1]
        return w + consume(out)
    results["top_k_neighbors"] = device_timeit(nbr_step, s.graph.weight)

    def reuse_step(st):
        return tracking_mod.point_reuse(st, pyr, cam, config, None)
    results["point_reuse"] = device_timeit(reuse_step, s)

    def trk_step(kf):
        def f(st):
            return tracking_mod.process_frame(st, pyr, mask, cam, config,
                                              make_keyframe=kf)[0]
        return f
    results["tracking_frame_nokf"] = device_timeit(trk_step(False), s)
    results["tracking_frame_kf"] = device_timeit(trk_step(True), s)

    def map_step(kf):
        def f(st):
            return mapping_mod.do_mapping(st, cam, config,
                                          has_new_keyframe=kf)
        return f
    results["mapping_triangulate"] = device_timeit(map_step(False), s)
    results["mapping_ba"] = device_timeit(map_step(True), s)

    def full_step(kf):
        def f(st):
            return system_mod.frame_step(st, raw_frames[4], mask, cam,
                                         config, kf)[0]
        return f
    results["full_frame_nokf"] = device_timeit(full_step(False), s)
    results["full_frame_kf"] = device_timeit(full_step(True), s)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
