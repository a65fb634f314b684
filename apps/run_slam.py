"""Unified CLI: run TPU-native NR-SLAM on a dataset.

Replaces the reference's three binaries (apps/endomapper.cc, apps/hamlyn.cc,
apps/simulation.cc) with one entry point; the ``--dataset`` flag selects the
loader. Flags mirror the reference's absl flags (--dataset_path,
--settings_path, --starting_frame, --end_frame, apps/endomapper.cc:31-34).

Examples:
  python apps/run_slam.py --dataset synthetic --end_frame 100
  python apps/run_slam.py --dataset simulation --dataset_path /data/sim \
      --settings_path data/simulation/settings.yaml
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["synthetic", "simulation", "hamlyn",
                                          "endomapper"], default="synthetic")
    ap.add_argument("--dataset_path", default="")
    ap.add_argument("--settings_path", default="")
    ap.add_argument("--starting_frame", type=int, default=0)
    ap.add_argument("--end_frame", type=int, default=100)
    ap.add_argument("--half_resolution", action="store_true",
                    help="process at half resolution (the reference does this "
                         "for endomapper/simulation, apps/endomapper.cc:66-67)")
    ap.add_argument("--deform_amp", type=float, default=0.02,
                    help="synthetic scene deformation amplitude")
    ap.add_argument("--save_ply", default="")
    ap.add_argument("--save_rmse", default="")
    ap.add_argument("--checkpoint_dir", default="")
    args = ap.parse_args()

    import os

    import jax

    # Honor JAX_PLATFORMS explicitly: the environment's sitecustomize
    # registers the remote TPU backend and sets jax_platforms
    # programmatically, which silently overrides the env var — a CLI launched
    # with JAX_PLATFORMS=cpu would otherwise run through the TPU relay.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    # Persistent compile cache (shared with bench.py): the remote-TPU compile
    # relay and the CPU pipeline compiles are both slow; warm reruns matter.
    cache_dir = str(Path(__file__).resolve().parent.parent / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from nrslam_tpu.slam import system as system_mod
    from nrslam_tpu.slam.state import Config
    from nrslam_tpu.utils.profiler import TimeProfiler

    profiler = TimeProfiler()

    if args.dataset == "synthetic":
        from nrslam_tpu.datasets import synthetic
        scene = synthetic.SceneConfig(deform_amp=args.deform_amp)
        seq = synthetic.SyntheticSequence(scene, n_frames=args.end_frame)
        cam = synthetic.camera(scene)
        config = Config(rad_per_pixel=1.0 / scene.fx)
        slam = system_mod.System(cam, config)

        def frames():
            for i in range(args.starting_frame, args.end_frame):
                gray, depth, _ = seq.get_frame(i)
                yield i, gray, depth
    else:
        from nrslam_tpu.config import Settings
        settings = Settings(args.settings_path)
        cam = settings.calibration
        config = settings.slam_config()
        slam = system_mod.System(cam, config, masker=settings.masker)

        if args.dataset == "simulation":
            from nrslam_tpu.datasets.loaders import Simulation
            ds = Simulation(args.dataset_path)

            def frames():
                for i in range(args.starting_frame, min(args.end_frame, len(ds))):
                    img = ds.get_image(i)
                    depth = ds.get_depth_image(i)
                    if args.half_resolution:
                        img = img[::2, ::2]
                        depth = depth[::2, ::2]
                    yield i, img, depth
        elif args.dataset == "hamlyn":
            from nrslam_tpu.datasets.loaders import Hamlyn
            ds = Hamlyn(args.dataset_path)

            def frames():
                for i in range(args.starting_frame, min(args.end_frame, len(ds))):
                    yield i, ds.get_image(i), None
        else:
            from nrslam_tpu.datasets.loaders import Endomapper
            ds = Endomapper(args.dataset_path)

            def frames():
                for i in range(args.starting_frame, min(args.end_frame, len(ds))):
                    img = ds.get_image(i)
                    if args.half_resolution:
                        img = img[::2, ::2]
                    yield i, img, None

    n_tracked = 0
    for i, img, depth in frames():
        with profiler.section("frame"):
            if depth is not None:
                out = slam.track_image_with_depth(img, depth)
            else:
                out = slam.track_image(img)
        if out["status"] == system_mod.TRACKING:
            n_tracked += 1
        if i % 10 == 0:
            print(f"frame {i}: {out}", file=sys.stderr)
        if out["status"] == system_mod.LOST:
            print("tracking lost", file=sys.stderr)
            break

    stats = profiler.statistics().get("frame", {})
    summary = {
        "frames_tracked": n_tracked,
        "status": slam.status,
        "mean_frame_ms": stats.get("mean_ms"),
        "median_rmse": (float(np.median(slam.evaluator.rmse_history))
                        if slam.evaluator.rmse_history else None),
    }
    print(json.dumps(summary))

    if args.save_ply and slam.state is not None:
        from nrslam_tpu.viz.dumps import export_ply
        export_ply(args.save_ply, slam.state)
    if args.save_rmse:
        slam.evaluator.save(args.save_rmse)
    if args.checkpoint_dir and slam.state is not None:
        from nrslam_tpu.utils import checkpoint
        checkpoint.save(args.checkpoint_dir, slam.state)


if __name__ == "__main__":
    main()
