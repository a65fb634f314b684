"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates the distribution design of nrslam_tpu/parallel: state sharded over
the point axis runs the full pipeline steps unchanged (XLA SPMD inserts the
collectives) and produces the same numbers as single-device execution; the
hand-written shard_map pose system psums to the identical 6x6 normal
equations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nrslam_tpu.parallel import sharding as shard_mod


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return shard_mod.make_mesh(jax.devices()[:8])


def _problem(max_points=64):
    import __graft_entry__ as ge
    return ge._small_problem(max_points=max_points)


def test_sharded_tracking_matches_single_device(mesh):
    from nrslam_tpu.slam import tracking as tracking_mod

    state, pyr, cam, config, shape = _problem()
    mask = jnp.ones(shape, bool)

    ref_state, ref_res = tracking_mod._process_frame_impl(
        state, pyr, mask, cam.params, cam.kind, config, make_keyframe=False)

    sstate = shard_mod.shard_state(state, mesh, config.max_points)
    spyr = shard_mod.replicate(pyr, mesh)
    smask = shard_mod.replicate(mask, mesh)
    out_state, out_res = tracking_mod._process_frame_impl(
        sstate, spyr, smask, cam.params, cam.kind, config, make_keyframe=False)

    assert int(out_res.n_tracked_3d) == int(ref_res.n_tracked_3d)
    np.testing.assert_allclose(np.asarray(out_state.Tcw.t),
                               np.asarray(ref_state.Tcw.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_state.positions),
                               np.asarray(ref_state.positions), atol=1e-3)


def test_shard_map_pose_system_matches(mesh):
    from nrslam_tpu.solver import residuals, core
    from nrslam_tpu.geometry import se3

    state, pyr, cam, config, shape = _problem()
    w = state.slot_used.astype(jnp.float32)

    psys = shard_mod.pose_system_shard_map(mesh, cam)
    H, g = psys(state.Tcw.q, state.Tcw.t,
                jax.device_put(state.positions, NamedSharding(mesh, P("pt"))),
                jax.device_put(state.keypoints, NamedSharding(mesh, P("pt"))),
                jax.device_put(w, NamedSharding(mesh, P("pt"))))

    e, J, _ = residuals.reprojection(cam, state.Tcw, state.positions,
                                     state.keypoints)
    chi2 = jnp.sum(e * e, axis=-1)
    wh = core.huber_weight(chi2, 5.99) * w
    H_ref = jnp.einsum("pri,p,prj->ij", J, wh, J)
    g_ref = jnp.einsum("pri,p,pr->i", J, wh, e)
    # Tolerances account for cross-device reduction-order differences
    # (psum over shards vs one einsum); H entries span ~1e6.
    scale = np.abs(np.asarray(H_ref)).max()
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-5 * max(1.0, np.abs(np.asarray(g_ref)).max()))


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)
