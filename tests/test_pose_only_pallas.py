"""Interpret-mode parity of the whole-solver pose-only Pallas kernel.

The kernel (solver/pose_only_pallas.py) must reproduce the XLA driver
(solver/pose_only.py) bit-for-bit in schedule and to float tolerance in
result — both run the reference's CameraPoseOptimization semantics
(g2o_optimization.cc:50-146)."""

import jax
import jax.numpy as jnp
import pytest

from nrslam_tpu.geometry import cameras, se3
from nrslam_tpu.solver import pose_only
from nrslam_tpu.solver.pose_only_pallas import camera_pose_optimization_pallas


def _problem(kind, key):
    P = 200
    if kind == "pinhole":
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0)
    else:
        cam = cameras.kannala_brandt8(300.0, 300.0, 160.0, 120.0,
                                      0.05, -0.01, 0.004, -0.001)
    X = jax.random.uniform(key, (P, 3), minval=-1, maxval=1) \
        + jnp.array([0.0, 0.0, 3.0])
    T_true = se3.SE3(se3.quat_normalize(jnp.array([1.0, 0.02, -0.03, 0.01])),
                     jnp.array([0.05, -0.02, 0.1]))
    obs = cameras.project(cam, se3.apply(T_true, X))
    obs = obs + 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (P, 2))
    outlier = jax.random.uniform(jax.random.fold_in(key, 2), (P,)) < 0.1
    obs = jnp.where(outlier[:, None], obs + 20.0, obs)
    valid = jnp.arange(P) % 7 != 3
    return cam, X, obs, valid, T_true


@pytest.mark.parametrize("kind", ["pinhole", "kb8"])
def test_pose_kernel_matches_xla_driver(kind):
    cam, X, obs, valid, T_true = _problem(kind, jax.random.PRNGKey(0))
    T_x = pose_only.camera_pose_optimization(cam, se3.identity(), X, obs,
                                             valid)
    T_p = camera_pose_optimization_pallas(cam, se3.identity(), X, obs, valid,
                                          interpret=True)
    assert float(jnp.linalg.norm(T_x.q - T_p.q)) < 1e-4
    assert float(jnp.linalg.norm(T_x.t - T_p.t)) < 1e-4
    # And both near the ground truth.
    assert float(jnp.linalg.norm(T_p.t - T_true.t)) < 0.01


def test_pose_kernel_nonsquare_point_count():
    """P not a lane multiple exercises the padded-lane guards."""
    cam, X, obs, valid, _ = _problem("pinhole", jax.random.PRNGKey(3))
    X, obs, valid = X[:131], obs[:131], valid[:131]
    T_x = pose_only.camera_pose_optimization(cam, se3.identity(), X, obs,
                                             valid)
    T_p = camera_pose_optimization_pallas(cam, se3.identity(), X, obs, valid,
                                          interpret=True)
    assert float(jnp.linalg.norm(T_x.t - T_p.t)) < 1e-4
