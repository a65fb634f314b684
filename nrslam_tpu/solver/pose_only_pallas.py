"""Whole-solver Pallas TPU kernel for pose-only LM (motion-only BA).

The XLA pose-only driver (solver/pose_only.py) runs 3 rounds x <= 10 LM
iterations as ~90 serial dispatches of small ops; on the TPU the per-op
fixed costs (kernel prologues + HBM round trips between fusion boundaries)
dominate the actual math by >10x. This kernel runs the ENTIRE schedule —
all rounds, re-leveling, LM lambda control and the damped 6x6 solves — in
ONE kernel launch with every intermediate resident in VMEM/registers.

Semantics are identical to solver/pose_only.py (same reference schedule,
CameraPoseOptimization g2o_optimization.cc:50-146): reset to the seed per
round, chi2 > 5.99 re-leveling between rounds, Huber IRLS, g2o Levenberg
lambda control, early exit on a machine-level accepted step.

Layout: per-point quantities are [1, P] lane vectors (P padded to a
multiple of 128 by the wrapper); the 6x6 normal equations are 21 scalars
reduced from lane vectors; the damped solve is a scalar 3x3-block Schur
complement (adjugate inverses) — pure scalar-core math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrslam_tpu.solver import pallas_common as pc

TH_2DOF = 5.99
LM_TAU = 1e-5


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _pose_kernel(par_ref, Xw_ref, obs_ref, valid_ref, out_ref,
                 *, kind: str, rounds: tuple, max_k_params: int):
    fx = par_ref[0]
    fy = par_ref[1]
    cx = par_ref[2]
    cy = par_ref[3]
    k_par = tuple(par_ref[4 + i] for i in range(max_k_params))
    q0 = tuple(par_ref[8 + i] for i in range(4))
    t0 = tuple(par_ref[12 + i] for i in range(3))

    X0 = Xw_ref[0:1, :]
    X1 = Xw_ref[1:2, :]
    X2 = Xw_ref[2:3, :]
    u_obs = obs_ref[0:1, :]
    v_obs = obs_ref[1:2, :]
    vmask = valid_ref[0:1, :]

    def system(q, t, mask):
        """Return (H 6x6 tuple, g 6-tuple, chi2_total, chi2 [1,P])."""
        R = pc.quat_to_matrix(q)
        Xc0 = R[0][0] * X0 + R[0][1] * X1 + R[0][2] * X2 + t[0]
        Xc1 = R[1][0] * X0 + R[1][1] * X1 + R[1][2] * X2 + t[1]
        Xc2 = R[2][0] * X0 + R[2][1] * X1 + R[2][2] * X2 + t[2]

        if kind == "pinhole":
            invz = 1.0 / Xc2
            pu = fx * Xc0 * invz + cx
            pv = fy * Xc1 * invz + cy
            # projection jacobian rows (cameras.projection_jacobian).
            invz2 = invz * invz
            p00 = fx * invz
            p01 = jnp.zeros_like(p00)
            p02 = -fx * Xc0 * invz2
            p10 = jnp.zeros_like(p00)
            p11 = fy * invz
            p12 = -fy * Xc1 * invz2
        else:  # kb8
            k0, k1, k2, k3 = k_par
            x, y, z = Xc0, Xc1, Xc2
            x2, y2, z2 = x * x, y * y, z * z
            r2 = x2 + y2
            r = jnp.sqrt(r2)
            r3 = r2 * r
            theta = jnp.arctan2(r, z)
            t2_ = theta * theta
            t4 = t2_ * t2_
            t6 = t4 * t2_
            t8 = t4 * t4
            f = theta * (1 + k0 * t2_ + k1 * t4 + k2 * t6 + k3 * t8)
            fd = 1 + 3 * k0 * t2_ + 5 * k1 * t4 + 7 * k2 * t6 + 9 * k3 * t8
            psi_c = x / jnp.maximum(r, 1e-12)
            psi_s = y / jnp.maximum(r, 1e-12)
            pu = fx * f * psi_c + cx
            pv = fy * f * psi_s + cy
            denom = r2 * (r2 + z2)
            p00 = fx * (fd * z * x2 / denom + f * y2 / r3)
            p01 = fx * (fd * z * x * y / denom - f * x * y / r3)
            p02 = -fx * fd * x / (r2 + z2)
            p10 = fy * (fd * z * x * y / denom - f * x * y / r3)
            p11 = fy * (fd * z * y2 / denom + f * x2 / r3)
            p12 = -fy * fd * y / (r2 + z2)

        e_u = u_obs - pu
        e_v = v_obs - pv
        chi2 = e_u * e_u + e_v * e_v

        safe = jnp.maximum(chi2, 1e-20)
        w_h = jnp.where(chi2 <= TH_2DOF, 1.0, jnp.sqrt(TH_2DOF / safe)) * mask

        # J_pose = dpi @ [-[pc]x | I] with dpi = -projection_jacobian
        # (residuals.reprojection / expmap_point_jacobian).
        d00, d01, d02 = -p00, -p01, -p02
        d10, d11, d12 = -p10, -p11, -p12
        # expmap columns: E[:,0]=(0,-z,y) E[:,1]=(z,0,-x) E[:,2]=(-y,x,0)
        #                 E[:,3..5]=I
        Ju = (d01 * (-Xc2) + d02 * Xc1,
              d00 * Xc2 + d02 * (-Xc0),
              d00 * (-Xc1) + d01 * Xc0,
              d00, d01, d02)
        Jv = (d11 * (-Xc2) + d12 * Xc1,
              d10 * Xc2 + d12 * (-Xc0),
              d10 * (-Xc1) + d11 * Xc0,
              d10, d11, d12)

        H = tuple(tuple(
            jnp.sum(w_h * (Ju[a] * Ju[b] + Jv[a] * Jv[b]))
            if b >= a else 0.0
            for b in range(6)) for a in range(6))
        # Symmetrize (fill lower from upper).
        H = tuple(tuple(H[a][b] if b >= a else H[b][a] for b in range(6))
                  for a in range(6))
        g = tuple(jnp.sum(w_h * (Ju[a] * e_u + Jv[a] * e_v)) for a in range(6))

        delta = jnp.float32(jnp.sqrt(TH_2DOF))
        rho = jnp.where(chi2 <= TH_2DOF, chi2,
                        2.0 * delta * jnp.sqrt(safe) - TH_2DOF)
        chi2_total = jnp.sum(rho * mask)
        return H, g, chi2_total, chi2

    def flatten_H(H):
        return tuple(H[a][b] for a in range(6) for b in range(6))

    def unflatten_H(flat):
        return tuple(tuple(flat[a * 6 + b] for b in range(6))
                     for a in range(6))

    level_mask = vmask
    q, t = q0, t0
    for n_iters in rounds:
        q, t = q0, t0
        H, g, chi2_cur, _ = system(q, t, level_mask)
        diag_max = H[0][0]
        for a in range(1, 6):
            diag_max = jnp.maximum(diag_max, H[a][a])
        lam = LM_TAU * diag_max

        def body(j, carry):
            (qw_, qx_, qy_, qz_, t0_, t1_, t2_, lam_, nu_, chi2c_, done_,
             *Hg) = carry
            q_ = (qw_, qx_, qy_, qz_)
            t_ = (t0_, t1_, t2_)
            H_ = unflatten_H(Hg[:36])
            g_ = tuple(Hg[36:42])

            y = pc.solve6(H_, g_, lam_)
            dx = tuple(-yi for yi in y)
            qn, tn = pc.se3_retract(q_, t_, dx)
            Hn, gn, chi2n, _ = system(qn, tn, level_mask)

            denom = sum(dx[a] * (lam_ * dx[a] - g_[a]) for a in range(6))
            rho_g = (chi2c_ - chi2n) / jnp.where(jnp.abs(denom) > 0,
                                                 denom, 1.0)
            accepted = rho_g > 0
            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho_g - 1.0) ** 3)
            lam_new = jnp.where(accepted, lam_ * shrink, lam_ * nu_)
            nu_new = jnp.where(accepted, 2.0, nu_ * 2.0)

            run = ~done_
            acc = accepted & run
            sel = lambda a, b: jnp.where(acc, a, b)
            q_out = tuple(sel(qn[a], q_[a]) for a in range(4))
            t_out = tuple(sel(tn[a], t_[a]) for a in range(3))
            H_out = tuple(sel(a, b) for a, b in zip(flatten_H(Hn),
                                                    flatten_H(H_)))
            g_out = tuple(sel(gn[a], g_[a]) for a in range(6))
            chi2_out = sel(chi2n, chi2c_)
            lam_out = jnp.where(run, lam_new, lam_)
            nu_out = jnp.where(run, nu_new, nu_)
            dx2 = sum(d * d for d in dx)
            done_out = done_ | (acc & (dx2 < 1e-12))
            return (q_out + t_out + (lam_out, nu_out, chi2_out, done_out)
                    + H_out + g_out)

        carry0 = (q + t + (lam, jnp.float32(2.0), chi2_cur,
                           jnp.zeros((), jnp.bool_))
                  + flatten_H(H) + g)
        out = jax.lax.fori_loop(0, n_iters, body, carry0)
        q = tuple(out[0:4])
        t = tuple(out[4:7])

        # Re-level by chi2 at the round optimum over the FULL valid set.
        _, _, _, chi2_vec = system(q, t, vmask)
        level_mask = vmask * jnp.where(chi2_vec <= TH_2DOF, 1.0, 0.0)

    for a in range(4):
        out_ref[a] = q[a]
    for a in range(3):
        out_ref[4 + a] = t[a]


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------

def camera_pose_optimization_pallas(cam, Tcw0, landmarks, obs, valid,
                                    rounds=(10, 10, 10),
                                    interpret: bool = False):
    """Drop-in for pose_only.camera_pose_optimization on TPU backends."""
    from nrslam_tpu.geometry import se3 as se3_mod

    P = landmarks.shape[0]
    Pp = ((P + 127) // 128) * 128

    def pack(rows):
        """rows: list of [P] vectors -> [8, Pp] f32 array."""
        a = jnp.zeros((8, Pp), jnp.float32)
        for i, r in enumerate(rows):
            a = a.at[i, :P].set(r.astype(jnp.float32))
        return a

    Xw = pack([landmarks[:, 0], landmarks[:, 1], landmarks[:, 2]])
    # Padded lanes must stay numerically benign: z=0 at an identity seed
    # makes chi2 infinite (inf * mask(0) = NaN poisons the robust total),
    # and r=0 is on the KB8 Jacobian's polar axis (0/0). Use an off-axis
    # point in front of the camera.
    Xw = Xw.at[0, P:].set(0.1)
    Xw = Xw.at[1, P:].set(0.1)
    Xw = Xw.at[2, P:].set(1.0)
    ob = pack([obs[:, 0], obs[:, 1]])
    vm = pack([valid.astype(jnp.float32)])

    params = jnp.zeros(16, jnp.float32)
    params = params.at[:cam.params.shape[0]].set(cam.params)
    params = params.at[8:12].set(Tcw0.q)
    params = params.at[12:15].set(Tcw0.t)

    kernel = functools.partial(
        _pose_kernel, kind=cam.kind, rounds=tuple(rounds), max_k_params=4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8,), jnp.float32)],
        interpret=interpret,
    )(params, Xw, ob, vm)

    q = out[:4]
    q = q / jnp.linalg.norm(q)
    return se3_mod.SE3(q, out[4:7])
