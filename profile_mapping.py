"""Fine-grained on-chip timing of the mapping/triangulation stage.

Splits landmark_triangulation into: neighbor query + input assembly,
rigid path, and the batched deformable LM (by iteration count), so the
next optimization targets the real cost. Usage: python profile_mapping.py
[BENCH_POINTS/BENCH_H/BENCH_W env as bench.py]

All timings use utils.profiler.chained_timeit: on the relay-backed TPU,
un-chained repeated dispatch of identical computations is elided and the
classic timeit pattern reports ~0.1 ms dispatch overhead instead of device
time.
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
    map_fn = jax.jit(lambda st: mapping_mod.do_mapping(
        st, cam, config, has_new_keyframe=False).positions)
    results["mapping_triangulate"] = chained_timeit(
        map_fn, lambda eps: s._replace(positions=s.positions + eps))

    # Candidate selection + deformable-input assembly (the exact block the
    # pipeline runs — mapping_mod.assemble_triangulation_inputs).
    assemble = jax.jit(partial(mapping_mod.assemble_triangulation_inputs,
                               config=config))
    results["input_assembly"] = chained_timeit(
        lambda st: assemble(st)[1].obs,
        lambda eps: s._replace(positions=s.positions + eps))

    _, inputs_c, _, _, _, poses = assemble(s)
    jax.block_until_ready(inputs_c.obs)

    for n_it in (0, 1, 5, 10):
        f = jax.jit(partial(dt.deformable_triangulate, n_iters=n_it))
        results[f"deformable_lm_{n_it}it"] = chained_timeit(
            lambda ins, f=f: f(cam, ins, poses, config.rad_per_pixel)[0],
            lambda eps: inputs_c._replace(obs=inputs_c.obs + eps))

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
