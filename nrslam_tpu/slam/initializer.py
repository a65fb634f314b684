"""Monocular map initialization: KLT track accumulation + essential-matrix
RANSAC on bearing rays + midpoint triangulation gates.

TPU-native re-design of the reference's MonocularMapInitializer +
EssentialMatrixInitialization (/root/reference/modules/tracking/
monocular_map_initializer.cc, essential_matrix_initialization.cc). The
sequential RANSAC loop (:105-178) becomes a BATCH of hypotheses scored in
parallel: all 8-point minimal problems are solved with one vmapped SVD and
all inlier counts with one einsum — the natural TPU shape.

Deviations from the reference, by design:
- kmeans-stratified sampling (one point per cluster, fixed srand(4)) is
  replaced by spatially-stratified random sampling from a fixed PRNG key:
  8 clusters via a fixed-iteration Lloyd's kmeans, one member per cluster per
  hypothesis. Same variance-reduction idea, deterministic, batched.
- The hypothesis count is static (>= the reference's adaptive ~16 for
  inlier_fraction 0.8 / confidence 0.95, essential_matrix_initialization.cc:81-84).
- The optical-flow DBSCAN clustering (monocular_map_initializer.cc:185-219)
  only feeds visualization in the reference (labels are stored, never used to
  filter — BuildInitializationResults ignores them), so it is not part of
  this math path; see ops/dbscan.py for the standalone op.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nrslam_tpu.geometry import cameras, se3, triangulation
from nrslam_tpu.ops import klt, shi_tomasi


class InitializerConfig(NamedTuple):
    max_features: int = 1024        # reference: 4000
    min_matches: int = 100          # reset below (monocular_map_initializer.cc:116)
    max_frames_from_ref: int = 30   # reset above (:125)
    min_triangulated: int = 100     # essential_matrix_initialization.cc:401
    max_low_parallax_frac: float = 0.25
    n_hypotheses: int = 64
    epipolar_threshold: float = 0.005
    rad_per_pixel: float = 0.002
    nms_radius: int = 7
    klt_min_ssim: float = 0.5
    kmeans_clusters: int = 8
    kmeans_iters: int = 10


class InitializerState(NamedTuple):
    ref_keypoints: jnp.ndarray   # [F, 2]
    cur_keypoints: jnp.ndarray   # [F, 2]
    track_id: jnp.ndarray        # [F] int32
    status: jnp.ndarray          # [F] int32 (TRACKED while alive)
    valid: jnp.ndarray           # [F] slot holds a feature
    refs: klt.KLTRefs
    frames_from_ref: jnp.ndarray  # int32
    next_track_id: jnp.ndarray    # int32


class InitializationResult(NamedTuple):
    success: jnp.ndarray          # bool
    Tcw: se3.SE3                  # current camera from world (ref camera)
    ref_keypoints: jnp.ndarray    # [F, 2]
    cur_keypoints: jnp.ndarray    # [F, 2]
    landmarks: jnp.ndarray        # [F, 3] world (= reference-camera) frame
    point_ok: jnp.ndarray         # [F]
    track_id: jnp.ndarray         # [F]


@partial(jax.jit, static_argnames=("klt_config", "config"))
def reset(pyramid, mask, next_track_id, klt_config: klt.KLTConfig,
          config: InitializerConfig) -> InitializerState:
    """Extract fresh features and set the KLT reference
    (monocular_map_initializer.cc:81-98 ResetInitialization)."""
    img = pyramid[0][0]
    xy, valid, _ = shi_tomasi.detect(img, config.max_features,
                                     nms_radius=config.nms_radius, mask=mask)
    refs = klt.set_reference(pyramid, xy, valid, klt_config)
    F = config.max_features
    track_id = jnp.where(valid, next_track_id + jnp.arange(F, dtype=jnp.int32),
                         -1)
    n_new = jnp.sum(valid.astype(jnp.int32))
    return InitializerState(
        ref_keypoints=xy,
        cur_keypoints=xy,
        track_id=track_id,
        status=jnp.where(valid, klt.TRACKED, klt.BAD).astype(jnp.int32),
        valid=valid,
        refs=refs,
        frames_from_ref=jnp.int32(0),
        next_track_id=next_track_id + n_new,
    )


@partial(jax.jit, static_argnames=("klt_config", "config"))
def track_frame(state: InitializerState, pyramid, klt_config: klt.KLTConfig,
                config: InitializerConfig):
    """KLT data association against the reference image. Returns
    (state, n_matches)."""
    pts, status = klt.track(pyramid, state.refs, state.cur_keypoints,
                            state.status, klt_config,
                            min_ssim=config.klt_min_ssim)
    tracked = state.valid & (status == klt.TRACKED)
    n = jnp.sum(tracked.astype(jnp.int32))
    return state._replace(cur_keypoints=pts, status=status,
                          frames_from_ref=state.frames_from_ref + 1), n


# ---------------------------------------------------------------------------
# Essential matrix machinery
# ---------------------------------------------------------------------------

def _kmeans(points, valid, k, iters, key):
    """Fixed-iteration Lloyd's kmeans over valid 2D points -> labels [N]."""
    N = points.shape[0]
    # init centers from valid points (deterministic shuffle)
    perm = jax.random.permutation(key, N)
    order = jnp.argsort(~valid[perm])  # valid first
    centers = points[perm[order][:k]]

    def step(centers, _):
        d = jnp.sum((points[:, None] - centers[None]) ** 2, axis=-1)
        lbl = jnp.argmin(d, axis=-1)
        one_hot = (jax.nn.one_hot(lbl, k) * valid[:, None])
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ points
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d = jnp.sum((points[:, None] - centers[None]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1)


def _eight_point(ref_rays, cur_rays):
    """E from 8 correspondences with the (1,1,0) singular-value projection
    (essential_matrix_initialization.cc:180-212). Batched over hypotheses."""
    A = jnp.concatenate([
        ref_rays * cur_rays[..., 0:1],
        ref_rays * cur_rays[..., 1:2],
        ref_rays * cur_rays[..., 2:3],
    ], axis=-1)                                   # [..., 8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[..., 8, :]
    E = e.reshape(e.shape[:-1] + (3, 3))
    u, _, vt2 = jnp.linalg.svd(E)
    s = jnp.zeros(E.shape[:-2] + (3,), E.dtype).at[..., 0].set(1.0).at[..., 1].set(1.0)
    Ef = u @ (s[..., :, None] * vt2)
    return -Ef


def _epipolar_inliers(E, ref_rays, cur_rays, threshold):
    """Angular epipolar test (essential_matrix_initialization.cc:236-256)."""
    Er = jnp.einsum("...ij,nj->...ni", E, ref_rays)
    Er = Er / jnp.maximum(jnp.linalg.norm(Er, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.sum(Er * cur_rays[None], axis=-1)
    err = jnp.abs(jnp.pi / 2 - jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    return err < threshold


def find_essential_ransac(ref_rays, cur_rays, tracked, config: InitializerConfig,
                          key):
    """Batched stratified RANSAC. Returns (E, inliers [N])."""
    N = ref_rays.shape[0]
    labels = _kmeans(ref_rays[:, :2] / jnp.maximum(ref_rays[:, 2:3], 1e-6),
                     tracked, config.kmeans_clusters, config.kmeans_iters, key)

    # For each hypothesis and each cluster, pick one random tracked member.
    def sample(hkey):
        gumbel = jax.random.gumbel(hkey, (N,))
        picks = []
        for c in range(config.kmeans_clusters):
            w = jnp.where(tracked & (labels == c), gumbel, -jnp.inf)
            picks.append(jnp.argmax(w))
        return jnp.stack(picks)

    keys = jax.random.split(jax.random.fold_in(key, 1), config.n_hypotheses)
    sample_idx = jax.vmap(sample)(keys)                 # [H, 8]
    E = _eight_point(ref_rays[sample_idx], cur_rays[sample_idx])  # [H, 3, 3]

    inl = _epipolar_inliers(E, ref_rays, cur_rays, config.epipolar_threshold)
    inl = inl & tracked[None]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    E_best, inl_best = E[best], inl[best]

    # Gold-standard refit on the FULL inlier set (deviation from the
    # reference, which decomposes the raw best 8-point hypothesis,
    # essential_matrix_initialization.cc:105-178): the minimal-sample E is a
    # draw lottery — measured 6x spread in downstream map depth-RMSE
    # between adjacent init frames from the sample draw alone (r5). One
    # least-squares refit (smallest eigenvector of the inlier-weighted
    # normal matrix + (1,1,0) projection) collapses that variance; kept
    # only if it does not lose inliers.
    A = jnp.concatenate([ref_rays * cur_rays[:, 0:1],
                         ref_rays * cur_rays[:, 1:2],
                         ref_rays * cur_rays[:, 2:3]], axis=-1)   # [N, 9]
    M = jnp.einsum("ni,nj,n->ij", A, A, inl_best.astype(A.dtype))
    _, vecs = jnp.linalg.eigh(M)
    Er = vecs[:, 0].reshape(3, 3)
    u, _, vt = jnp.linalg.svd(Er)
    s = jnp.zeros(3, Er.dtype).at[0].set(1.0).at[1].set(1.0)
    Er = -(u @ (s[:, None] * vt))
    inl_r = (_epipolar_inliers(Er[None], ref_rays, cur_rays,
                               config.epipolar_threshold)[0] & tracked)
    keep = jnp.sum(inl_r.astype(jnp.int32)) >= jnp.sum(
        inl_best.astype(jnp.int32))
    E_out = jnp.where(keep, Er, E_best)
    inl_out = jnp.where(keep, inl_r, inl_best)
    return E_out, inl_out


def reconstruct_cameras(E, ref_rays, cur_rays, inliers):
    """Decompose E, pick the smaller rotation, orient t by ray consensus
    (essential_matrix_initialization.cc:284-318)."""
    u, _, vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W.T @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = u @ W @ vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    R = jnp.where(jnp.trace(R2) > jnp.trace(R1), R2, R1)
    t = u[:, 2] / jnp.linalg.norm(u[:, 2])

    w = inliers.astype(E.dtype)
    away = jnp.sum(w * jnp.sign(jnp.sum(
        (ref_rays @ R.T - cur_rays) * (cur_rays - t[None]), axis=-1)))
    t = jnp.where(away < 0, -t, t)
    return se3.SE3(se3.matrix_to_quat(R), t)


def reconstruct_points(cam, Tcw, ref_uv, cur_uv, inliers,
                       config: InitializerConfig):
    """Midpoint triangulation + parallax/depth/reprojection gates
    (essential_matrix_initialization.cc:320-410). Returns
    (landmarks [N, 3], ok [N], low_parallax [N])."""
    ref_rays = cameras.unit_rays(cam, ref_uv)
    cur_rays = cameras.unit_rays(cam, cur_uv)
    T_ref = se3.identity()
    X = triangulation.triangulate_midpoint(ref_rays, cur_rays, T_ref, Tcw)

    t_wc = se3.inverse(Tcw).t
    parallax = triangulation.rays_parallax(X, X - t_wc)
    low_parallax = inliers & (parallax < config.rad_per_pixel * 5.0)

    Xc = se3.apply(Tcw, X)
    proj_ref = cameras.project(cam, X)
    proj_cur = cameras.project(cam, Xc)
    ok = (inliers
          & jnp.isfinite(X).all(axis=-1)
          & ~low_parallax
          & (X[:, 2] > 0) & (Xc[:, 2] > 0)
          & (triangulation.squared_reprojection_error(ref_uv, proj_ref) <= 5.991)
          & (triangulation.squared_reprojection_error(cur_uv, proj_cur) <= 5.991))
    return X, ok, low_parallax


@partial(jax.jit, static_argnames=("cam_kind", "klt_config", "config"))
def init_step(state: InitializerState, pyramid, mask, key, cam_params,
              cam_kind, klt_config: klt.KLTConfig,
              config: InitializerConfig):
    """ONE fused init-phase frame: KLT tracking + reset decision + rigid
    initialization attempt as a single jitted program.

    Mirrors MonocularMapInitializer's per-frame flow
    (monocular_map_initializer.cc:100-133): track against the reference;
    if matches drop below min_matches or the window exceeds
    max_frames_from_ref, re-seed the reference from this frame (no attempt);
    otherwise attempt the essential-matrix initialization. The returned
    ``result.success`` is an un-materialized device bool — the System holds
    it (plus this frame's pyramid) and materializes a BATCH of flags every
    ``init_check_every`` frames, so the init loop, previously 2-3 blocking
    host round trips per frame on the remote-relay backend, makes none.
    """
    cam = cameras.Camera(cam_params, cam_kind)
    state_t, n = track_frame(state, pyramid, klt_config, config)
    reset_needed = ((n < config.min_matches)
                    | (state_t.frames_from_ref > config.max_frames_from_ref))
    # lax.cond (not a where-select): the reset branch re-runs Shi-Tomasi +
    # set_reference over max_features, which must only execute on actual
    # resets (measured: unconditional evaluation cost ~2x the whole init
    # frame at F=4000).
    state_new = jax.lax.cond(
        reset_needed,
        lambda: reset(pyramid, mask, state_t.next_track_id, klt_config,
                      config),
        lambda: state_t)
    result = _try_initialize_impl(cam_params, cam_kind, state_t, config, key)
    result = result._replace(success=result.success & ~reset_needed)
    return state_new, result


def try_initialize(cam, state: InitializerState, config: InitializerConfig,
                   key) -> InitializationResult:
    """Full rigid initialization attempt on the current track set.

    Jitted as one program (cam split into params + static kind): the init
    phase otherwise runs op-by-op, which on the remote-relay TPU backend
    costs a program dispatch per op (~2 s per init frame measured at
    max_features=4000 before jitting; ~25 ms after)."""
    return _try_initialize_impl(cam.params, cam.kind, state, config, key)


@partial(jax.jit, static_argnames=("cam_kind", "config"))
def _try_initialize_impl(cam_params, cam_kind, state: InitializerState,
                         config: InitializerConfig,
                         key) -> InitializationResult:
    cam = cameras.Camera(cam_params, cam_kind)
    tracked = state.valid & (state.status == klt.TRACKED)
    ref_rays = cameras.unit_rays(cam, state.ref_keypoints)
    cur_rays = cameras.unit_rays(cam, state.cur_keypoints)

    E, inliers = find_essential_ransac(ref_rays, cur_rays, tracked, config, key)
    Tcw = reconstruct_cameras(E, ref_rays, cur_rays, inliers)
    X, ok, low_par = reconstruct_points(cam, Tcw, state.ref_keypoints,
                                        state.cur_keypoints, inliers, config)

    n_ok = jnp.sum(ok.astype(jnp.int32))
    n_low = jnp.sum(low_par.astype(jnp.int32))
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    success = ((n_ok >= config.min_triangulated)
               & (n_low <= config.max_low_parallax_frac * jnp.maximum(n_inl, 1)))

    # Two-view refinement ON THE SUCCESS FRAME only (lax.cond, so the
    # per-attempt cost of the init loop is unchanged): alternate pose-only
    # LM against the triangulated structure with midpoint retriangulation.
    # Deviation from the reference (which maps the raw E-decomposition
    # geometry, essential_matrix_initialization.cc:284-410): the map
    # inherits the init triangulation error for its whole life — the
    # visco-elastic springs anchor the rest distances — and three
    # alternations cut the init depth error ~2x (measured on the synthetic
    # fisheye clip: scaled depth RMSE 0.108 -> 0.055).
    def refine(TX):
        T, Xi = TX
        from nrslam_tpu.solver import pose_only as po
        ok_r = ok
        for _ in range(3):
            T = po.camera_pose_optimization(cam, T, Xi,
                                            state.cur_keypoints, ok)
            Xi, ok_r, _ = reconstruct_points(cam, T, state.ref_keypoints,
                                             state.cur_keypoints, inliers,
                                             config)
        return T, Xi, ok & ok_r

    Tcw, X, ok = jax.lax.cond(success, refine,
                              lambda TX: (TX[0], TX[1], ok), (Tcw, X))
    return InitializationResult(
        success=success, Tcw=Tcw,
        ref_keypoints=state.ref_keypoints,
        cur_keypoints=state.cur_keypoints,
        landmarks=X, point_ok=ok, track_id=state.track_id)
