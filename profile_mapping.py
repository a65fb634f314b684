"""Fine-grained on-chip timing of the mapping/triangulation stage.

Splits landmark_triangulation into: neighbor query + input assembly,
rigid path, and the batched deformable LM (by iteration count), so the
next optimization targets the real cost. Usage: python profile_mapping.py
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

    from nrslam_tpu.geometry import se3
    from nrslam_tpu.ops import klt
    from nrslam_tpu.slam import mapping as mapping_mod
    from nrslam_tpu.slam import tracking as tracking_mod
    from nrslam_tpu.solver import deformable_triangulation as dt

    state, frames, mask, cam, config, raw_frames = bench.build_bench_problem()

    s = state
    for i, kf in [(0, False), (1, True), (2, False), (3, True)]:
        pyr = klt.build_pyramid(raw_frames[i], config.klt_config)
        s, _ = tracking_mod.process_frame(s, pyr, mask, cam, config,
                                          make_keyframe=kf)
        s = mapping_mod.do_mapping(s, cam, config, has_new_keyframe=kf)
    jax.block_until_ready(s.positions)

    results = {}

    # Full triangulation mapping step (reference point).
    results["mapping_triangulate"] = timeit(
        lambda: mapping_mod.do_mapping(s, cam, config,
                                       has_new_keyframe=False).positions)

    # Assemble the deformable inputs once (mirrors landmark_triangulation).
    @jax.jit
    def build_inputs(s):
        last = mapping_mod._last_snapshot_index(s)
        candidates = (s.tb_valid[last]
                      & s.tb_tracked[last] & ~s.tb_with3d[last]
                      & s.slot_used & ~s.has_3d)
        nbr_idx, nbr_valid, nbr_ok = mapping_mod._closest_mapped_neighbors(
            s, config)
        candidates = candidates & nbr_ok
        order, order_valid = mapping_mod._chronological(s)
        inputs = mapping_mod._deformable_inputs(
            s, config, order, order_valid, nbr_idx, nbr_valid, candidates)
        poses = se3.index(s.tb_pose, order)
        C = min(config.max_triangulation_candidates, candidates.shape[0])
        _, cand_sel = jax.lax.top_k(jnp.where(candidates, 1.0, 0.0), C)
        inputs_c = jax.tree.map(lambda x: x[cand_sel], inputs)
        return inputs_c, poses

    results["input_assembly"] = timeit(
        lambda: jax.tree.leaves(build_inputs(s))[0])
    inputs_c, poses = build_inputs(s)
    jax.block_until_ready(inputs_c.obs)

    for n_it in (0, 1, 5, 10):
        f = jax.jit(partial(dt.deformable_triangulate, n_iters=n_it),
                    static_argnames=("n_iters",))
        results[f"deformable_lm_{n_it}it"] = timeit(
            lambda f=f: f(cam, inputs_c, poses, config.rad_per_pixel)[0])

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
