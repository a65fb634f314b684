"""Interpret-mode parity of the whole-solver joint pose+deformation kernel.

The Pallas kernel (solver/pose_deformation_pallas.py) is the default TPU
path for CameraPoseAndDeformationOptimization
(/root/reference/modules/optimization/g2o_optimization.cc:148-557); it must
reproduce the XLA driver (solver/pose_deformation.py) — same two-round
relevel schedule, same gradient/Hessian terms — to float tolerance.

Problems deliberately use non-uniform RBF edge weights (a uniform-weight
problem would not have caught the missing-pw^2 spatial-gradient bug fixed in
round 4), partial point/edge masks, outliers that trip the chi2 relevel, and
odd P (padded-lane guards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrslam_tpu.geometry import cameras, se3
from nrslam_tpu.solver import pose_deformation as pd
from nrslam_tpu.solver import pose_only
from nrslam_tpu.solver.pose_deformation_pallas import (
    pose_deformation_optimization_pallas)

from test_pose_deformation import knn_table, make_scene

CAM_PIN = cameras.pinhole(472.65, 472.65, 479.5, 359.5)
CAM_KB8 = cameras.kannala_brandt8(400.0, 400.0, 479.5, 359.5,
                                  0.05, -0.01, 0.004, -0.001)


def _problem(cam, n=150, seed=0, deform_amp=0.05, n_outliers=0,
             masked_points=0):
    X, flow_true, T_true, obs = make_scene(n=n, seed=seed,
                                           deform_amp=deform_amp)
    if cam is not CAM_PIN:
        obs = cameras.project(cam, se3.apply(T_true, X + flow_true))
    if n_outliers:
        obs = obs.at[:n_outliers].add(
            40.0 * jax.random.normal(jax.random.PRNGKey(seed + 7),
                                     (n_outliers, 2)))
    valid = jnp.ones(n, bool)
    if masked_points:
        valid = valid.at[-masked_points:].set(False)
    T_seed = pose_only.camera_pose_optimization(cam, se3.identity(), X, obs,
                                                valid)
    nbr_idx, nbr_w, nbr_d0, nbr_valid = knn_table(X)
    # Knock out a band of edges so edge masking is exercised too.
    nbr_valid = nbr_valid.at[10:20, ::2].set(False)
    pairs = pd.pairs_from_neighbors(nbr_idx, nbr_w, nbr_d0, nbr_valid)
    return X, obs, valid, pairs, T_seed, T_true


def _both(cam, X, obs, valid, pairs, T_seed, rounds=(10, 10), stream=False):
    pd.set_backend("xla")
    try:
        res_x = pd.pose_deformation_optimization(
            cam, T_seed, X, obs, valid, pairs, scale=1.0, rounds=rounds)
    finally:
        pd.set_backend("auto")
    T_p, flows_p, chi2_p = pose_deformation_optimization_pallas(
        cam, T_seed, X, obs, valid, pairs, scale=1.0, rounds=rounds,
        interpret=True, stream=stream)
    return res_x, (T_p, flows_p, chi2_p)


def _assert_parity(res_x, pallas_out, valid, flow_tol=5e-3, pose_tol=2e-3):
    T_p, flows_p, chi2_p = pallas_out
    # Pose parity (rotation via quaternion up to sign).
    q_x, q_p = res_x.Tcw.q, T_p.q
    q_err = min(float(jnp.linalg.norm(q_x - q_p)),
                float(jnp.linalg.norm(q_x + q_p)))
    assert q_err < pose_tol, q_err
    assert float(jnp.linalg.norm(res_x.Tcw.t - T_p.t)) < pose_tol
    # Flow parity on valid points, relative to flow magnitude scale.
    m = np.asarray(valid)
    dflow = np.linalg.norm(np.asarray(res_x.flows - flows_p), axis=-1)[m]
    fmag = max(float(jnp.median(jnp.linalg.norm(res_x.flows, axis=-1))), 0.01)
    assert np.median(dflow) < flow_tol * max(fmag / 0.01, 1.0), (
        np.median(dflow), fmag)
    # Inlier-set agreement (chi2 gates): allow a few boundary flips.
    inl_p = m & (np.asarray(chi2_p) <= pd.TH_2DOF)
    inl_x = np.asarray(res_x.reproj_inlier)
    assert (inl_p != inl_x).mean() < 0.03, (inl_p.sum(), inl_x.sum())


@pytest.mark.parametrize("cam", [CAM_PIN, CAM_KB8], ids=["pinhole", "kb8"])
def test_joint_kernel_matches_xla_driver(cam):
    X, obs, valid, pairs, T_seed, _ = _problem(cam, deform_amp=0.05,
                                               n_outliers=8)
    res_x, out_p = _both(cam, X, obs, valid, pairs, T_seed)
    _assert_parity(res_x, out_p, valid)


@pytest.mark.parametrize("cam", [CAM_PIN, CAM_KB8], ids=["pinhole", "kb8"])
def test_joint_kernel_streaming_matches_xla_driver(cam):
    """HBM-streaming variant (double-buffered selector DMA, multi-block:
    E ~ 1152 > STREAM_BLOCK=512 so 3 blocks stream per edge pass) must
    match the XLA driver exactly like the resident kernel does."""
    X, obs, valid, pairs, T_seed, _ = _problem(cam, deform_amp=0.05,
                                               n_outliers=8)
    res_x, out_p = _both(cam, X, obs, valid, pairs, T_seed, stream=True)
    _assert_parity(res_x, out_p, valid)


def test_joint_kernel_streaming_masked_and_odd():
    """Streaming + masked points/edges + odd P (padded lanes AND a padded
    tail block in the edge table)."""
    X, obs, valid, pairs, T_seed, _ = _problem(
        CAM_PIN, n=131, deform_amp=0.04, n_outliers=4, masked_points=17)
    res_x, out_p = _both(CAM_PIN, X, obs, valid, pairs, T_seed, stream=True)
    _assert_parity(res_x, out_p, valid)
    T_p, flows_p, _ = out_p
    assert float(jnp.max(jnp.abs(flows_p[-17:]))) == 0.0


def test_joint_kernel_masked_points_and_edges():
    X, obs, valid, pairs, T_seed, _ = _problem(
        CAM_PIN, deform_amp=0.03, n_outliers=5, masked_points=23)
    res_x, out_p = _both(CAM_PIN, X, obs, valid, pairs, T_seed)
    _assert_parity(res_x, out_p, valid)
    # Masked points must keep zero flow in both paths.
    T_p, flows_p, _ = out_p
    assert float(jnp.max(jnp.abs(flows_p[-23:]))) == 0.0


def test_joint_kernel_odd_point_count():
    """P=131 exercises padded lanes; small maps exercise the edge-budget
    clamp (top_k k must not exceed the raw edge-table length)."""
    X, obs, valid, pairs, T_seed, _ = _problem(CAM_PIN, n=131,
                                               deform_amp=0.04)
    res_x, out_p = _both(CAM_PIN, X, obs, valid, pairs, T_seed)
    _assert_parity(res_x, out_p, valid)


def test_joint_kernel_tiny_map_edge_budget():
    """P=40 with K=6 neighbors: raw edge table is smaller than the
    lane-aligned VMEM budget (the r3 crash case from ADVICE.md)."""
    X, flow_true, T_true, obs = make_scene(n=40, seed=5, deform_amp=0.02)
    valid = jnp.ones(40, bool)
    nbr = knn_table(X, k=6)
    pairs = pd.pairs_from_neighbors(*nbr)
    T_seed = pose_only.camera_pose_optimization(CAM_PIN, se3.identity(), X,
                                                obs, valid)
    res_x, out_p = _both(CAM_PIN, X, obs, valid, pairs, T_seed)
    _assert_parity(res_x, out_p, valid)


def test_joint_kernel_relevel_converges_to_truth():
    """With outliers, the second round must run on the releveled masks and
    still land near the rigid ground truth."""
    X, obs, valid, pairs, T_seed, T_true = _problem(
        CAM_PIN, deform_amp=0.0, n_outliers=12, seed=2)
    res_x, out_p = _both(CAM_PIN, X, obs, valid, pairs, T_seed)
    _assert_parity(res_x, out_p, valid)
    T_p, flows_p, chi2_p = out_p
    # Rigid truth up to the nonrigid gauge (a common flow translation trades
    # against camera translation, so ~3% residual pose error remains with
    # 12 gross outliers in the mix — same on both paths).
    err = se3.log(se3.compose(T_p, se3.inverse(T_true)))
    assert float(jnp.linalg.norm(err)) < 0.05, np.asarray(err)
    assert float(jnp.median(jnp.linalg.norm(flows_p, axis=-1))) < 0.05
    # The joint model absorbs gross outliers into large flows rather than
    # reprojection residuals; the reference demotes them via the IQR
    # deformation-magnitude gate (g2o_optimization.cc:424-437) — each
    # outlier must fail at least one of the two gates.
    demoted = ~(np.asarray(res_x.reproj_inlier)
                & np.asarray(res_x.deform_ok))[:12]
    assert demoted.mean() > 0.5, demoted
