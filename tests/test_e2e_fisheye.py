"""End-to-end test with the Kannala-Brandt-8 fisheye camera (the Endomapper
configuration, settings.cc:93-122)."""

import numpy as np
import pytest

from nrslam_tpu.datasets import synthetic
from nrslam_tpu.geometry import cameras
from nrslam_tpu.slam import system as system_mod
from nrslam_tpu.slam.state import Config


@pytest.mark.slow
def test_fisheye_sequence_tracks():
    scene = synthetic.SceneConfig(camera_kind=cameras.KB8)
    seq = synthetic.SyntheticSequence(scene, n_frames=24)
    cam = synthetic.camera(scene)
    assert cam.kind == cameras.KB8
    config = Config(max_points=256, max_new_keypoints=96,
                    rad_per_pixel=1.0 / scene.fx)
    init_config = system_mod.init_mod.InitializerConfig(
        max_features=384, min_matches=60, min_triangulated=50,
        rad_per_pixel=1.0 / scene.fx, n_hypotheses=48)
    sys = system_mod.System(cam, config, init_config)

    rmses = []
    for i in range(24):
        gray, depth, _ = seq.get_frame(i)
        out = sys.track_image_with_depth(gray, depth)
        if "depth_rmse" in out:
            rmses.append(out["depth_rmse"])
        if sys.status == system_mod.LOST:
            break

    assert sys.status == system_mod.TRACKING, sys.status
    assert len(rmses) >= 8, len(rmses)
    assert np.median(rmses) < 0.2, rmses
