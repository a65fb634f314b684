"""Whole-solver Pallas TPU kernel for the local deformable bundle adjustment.

The XLA driver (solver/bundle_adjustment.py) runs 5 LM iterations, each with
a 32-trip block-preconditioned CG over [K*6 + K*P*3] variables — ~2500
serial dispatches re-streaming the [E, P] selector every product. At the
reference-scale point the BA window solve was the second-largest per-frame
cost (9.2 ms at P=768, 1-in-5 keyframe cadence — VERDICT r4 #5). This
kernel runs the ENTIRE schedule in ONE launch, with the same two selector
placements as the joint kernel (pose_deformation_pallas.py): resident bf16
in VMEM, or int8 streamed from HBM with double-buffered DMA. All edge work
of one pass — the K per-keyframe forward differences, spring terms,
consecutive-keyframe temporal dampers, gradient scatters and Jacobi-diagonal
endpoint sums — is fused into a single pass over the selector.

Factor math mirrors bundle_adjustment._system term by term (reference:
LocalDeformableBundleAdjustment, g2o_optimization.cc:880-1161):
- reprojection per (keyframe, observed landmark): info 1/0.5^2, Huber 5.99
- position springs per (keyframe, pair observed in that KF): no robust
  kernel (:1060-1070)
- 4-ary temporal dampers per (consecutive KF pair, pair observed in both):
  Huber 0.584 (:1110-1130)
- 5 LM iterations, re-linearized at the accepted point each iteration, no
  re-leveling (:1140-1143)

Unobserved (masked) landmark copies are sanitized to benign positions on
the host side and restored after the solve — they participate in no factor,
so their update is exactly zero in both paths.

Variables: K SE(3) twists (scalar cores) + per-KF landmark coordinates as K
[8, Pp] coordinate-row lane arrays. Mosaic constraint (see the joint
kernel): per-edge state lives in a VMEM scratch ref sliced with ``pl.ds``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrslam_tpu.solver import pallas_common as pcm

TH_2DOF = 5.99
TH_3DOF = 0.584
INFO_REPROJECTION = 1.0 / (0.5 ** 2)
INFO_POSITION = 1.0 / (0.1 ** 2)
SPRING_K = 1.1
LM_TAU = 1e-5
CG_TOL = 1e-8
STREAM_BLOCK = 512


def _huber_w(chi2, th):
    safe = jnp.maximum(chi2, 1e-20)
    return jnp.where(chi2 <= th, 1.0, jnp.sqrt(th / safe))


def _huber_rho(chi2, th):
    delta = th ** 0.5
    return jnp.where(chi2 <= th, chi2,
                     2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-20)) - th)


def _ba_kernel(par_ref, L_ref, obsm_ref, pair_ref, emask_ref, Sd_ref,
               out_pose_ref, out_L_ref, *scratch, kind: str, K: int,
               n_iters: int, cg_iters: int, max_k_params: int,
               sel_bf16: bool, stream: bool, n_blocks: int, be: int):
    if stream:
        es_ref, buf_ref, sem_ref = scratch
    else:
        (es_ref,) = scratch
        buf_ref = sem_ref = None

    fx = par_ref[0]
    fy = par_ref[1]
    cx = par_ref[2]
    cy = par_ref[3]
    k_par = tuple(par_ref[4 + i] for i in range(max_k_params))
    q0 = [tuple(par_ref[8 + 7 * k + i] for i in range(4)) for k in range(K)]
    t0 = [tuple(par_ref[8 + 7 * k + 4 + i] for i in range(3))
          for k in range(K)]
    info_s = par_ref[8 + 7 * K]

    Pp = L_ref.shape[1]

    L0 = [L_ref[8 * k:8 * k + 8, :] for k in range(K)]
    u_obs = [obsm_ref[8 * k:8 * k + 1, :] for k in range(K)]
    v_obs = [obsm_ref[8 * k + 1:8 * k + 2, :] for k in range(K)]
    omask = [obsm_ref[8 * k + 2:8 * k + 3, :] for k in range(K)]

    pw = pair_ref[0:1, :]
    pd0 = pair_ref[1:2, :]

    sel_comp = jnp.bfloat16 if sel_bf16 else jnp.float32
    dn_fwd = (((1,), (1,)), ((), ()))
    dn_bwd = (((1,), (0,)), ((), ()))

    def _dot(x8, S, dn):
        return jax.lax.dot_general(x8, S, dn,
                                   preferred_element_type=jnp.float32)

    if sel_bf16:
        def _split(x8):
            xh = x8.astype(jnp.bfloat16)
            xl = (x8 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return xh, xl

        def fwd_exact(xh_xl, blk):
            xh, xl = xh_xl
            return _dot(xh, blk, dn_fwd) + _dot(xl, blk, dn_fwd)

        def fwd_fast(x8, blk):
            return _dot(x8.astype(jnp.bfloat16), blk, dn_fwd)

        def bwd(y8, blk):
            return _dot(y8.astype(jnp.bfloat16), blk, dn_bwd)
    else:
        def _split(x8):
            return (x8, None)

        def fwd_exact(xh_xl, blk):
            return _dot(xh_xl[0], blk, dn_fwd)

        def fwd_fast(x8, blk):
            return _dot(x8, blk, dn_fwd)

        def bwd(y8, blk):
            return _dot(y8, blk, dn_bwd)

    def for_each_block(body, carry0):
        if not stream:
            if n_blocks == 1:
                return body(0, Sd_ref[...].astype(sel_comp), carry0)

            def rloop(i, carry):
                blk = Sd_ref[pl.ds(i * be, be), :].astype(sel_comp)
                return body(i * be, blk, carry)

            return jax.lax.fori_loop(0, n_blocks, rloop, carry0)

        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                Sd_ref.at[pl.ds(idx * be, be)], buf_ref.at[slot],
                sem_ref.at[slot])

        get_dma(0, 0).start()

        def loop(i, carry):
            slot = i % 2

            @pl.when(i + 1 < n_blocks)
            def _():
                get_dma((i + 1) % 2, i + 1).start()

            get_dma(slot, i).wait()
            blk = buf_ref[slot].astype(sel_comp)
            return body(i * be, blk, carry)

        return jax.lax.fori_loop(0, n_blocks, loop, carry0)

    zero_row = None  # set per block

    def _spring_damper_block(off, blk, L_list, with_derivs):
        """Shared per-block spring/damper math at (L_list). Returns
        (chi2_contrib, per_k gradient rows / pack rows if with_derivs,
        per_k (a rows, wd2) for the es write)."""
        xs = [_split(Lk) for Lk in L_list]
        dL = [fwd_exact(x, blk) for x in xs]                   # K x [8, be]
        pw_b = pair_ref[0:1, pl.ds(off, be)]
        d0_b = pair_ref[1:2, pl.ds(off, be)]
        sd0_b = jnp.maximum(d0_b, 1e-12)
        kd0_b = SPRING_K / sd0_b
        chi2_e = jnp.zeros((), jnp.float32)

        springs = []
        for k in range(K):
            sm = emask_ref[8 * k:8 * k + 1, pl.ds(off, be)]
            d0_, d1_, d2_ = dL[k][0:1], dL[k][1:2], dL[k][2:3]
            dist = jnp.sqrt(d0_ * d0_ + d1_ * d1_ + d2_ * d2_)
            e_p = SPRING_K * (dist - d0_b) / sd0_b
            chi2_e = chi2_e + jnp.sum(INFO_POSITION * e_p * e_p * sm)
            w_p = INFO_POSITION * sm
            inv_dist = 1.0 / jnp.maximum(dist, 1e-12)
            a0 = kd0_b * d0_ * inv_dist
            a1 = kd0_b * d1_ * inv_dist
            a2 = kd0_b * d2_ * inv_dist
            springs.append((w_p, e_p, a0, a1, a2))

        dampers = []
        for k in range(K - 1):
            dm = emask_ref[8 * k + 1:8 * k + 2, pl.ds(off, be)]
            dd0 = dL[k + 1][0:1] - dL[k][0:1]
            dd1 = dL[k + 1][1:2] - dL[k][1:2]
            dd2 = dL[k + 1][2:3] - dL[k][2:3]
            chi2_d = info_s * (pw_b * pw_b) * (dd0 * dd0 + dd1 * dd1
                                               + dd2 * dd2)
            chi2_e = chi2_e + jnp.sum(_huber_rho(chi2_d, TH_3DOF) * dm)
            w_d = info_s * _huber_w(chi2_d, TH_3DOF) * dm
            wd2 = w_d * pw_b * pw_b
            dampers.append((wd2, dd0, dd1, dd2))

        if not with_derivs:
            return chi2_e, None, None, springs, dampers
        grads, packs = [], []
        for k in range(K):
            w_p, e_p, a0, a1, a2 = springs[k]
            wpe = w_p * e_p
            g0, g1, g2 = wpe * a0, wpe * a1, wpe * a2
            if k < K - 1:
                wd2, dd0, dd1, dd2 = dampers[k]
                g0 = g0 - wd2 * dd0
                g1 = g1 - wd2 * dd1
                g2 = g2 - wd2 * dd2
            if k > 0:
                wd2, dd0, dd1, dd2 = dampers[k - 1]
                g0 = g0 + wd2 * dd0
                g1 = g1 + wd2 * dd1
                g2 = g2 + wd2 * dd2
            grads.append((g0, g1, g2))
            diag_extra = jnp.zeros_like(a0)
            if k < K - 1:
                diag_extra = diag_extra + dampers[k][0]
            if k > 0:
                diag_extra = diag_extra + dampers[k - 1][0]
            packs.append((w_p * a0 * a0 + diag_extra, w_p * a0 * a1,
                          w_p * a0 * a2, w_p * a1 * a1 + diag_extra,
                          w_p * a1 * a2, w_p * a2 * a2 + diag_extra))
        return chi2_e, grads, packs, springs, dampers

    def edge_terms(L_list):
        """Full edge pass: chi2 + gradient scatter + D endpoint sums; writes
        the per-edge Hv state (a rows + damper wd2) to es_ref."""
        def body(off, blk, carry):
            gsp, dsum, chi2_e = carry
            c, grads, packs, springs, dampers = _spring_damper_block(
                off, blk, L_list, True)
            chi2_e = chi2_e + c
            zero = jnp.zeros_like(springs[0][1])
            gsp_new, dsum_new = [], []
            for k in range(K):
                g0, g1, g2 = grads[k]
                gs8 = jnp.concatenate([g0, g1, g2, zero, zero, zero, zero,
                                       zero], axis=0)
                gsp_new.append(gsp[k] + bwd(gs8, blk))
                p = packs[k]
                pack8 = jnp.concatenate(list(p) + [zero, zero], axis=0)
                dsum_new.append(dsum[k] + bwd(pack8, jnp.abs(blk)))
                _, _, a0, a1, a2 = springs[k]
                wd2 = dampers[k][0] if k < K - 1 else zero
                es_ref[8 * k:8 * k + 8, pl.ds(off, be)] = jnp.concatenate(
                    [a0, a1, a2, wd2, zero, zero, zero, zero], axis=0)
            return gsp_new, dsum_new, chi2_e

        z = [jnp.zeros((8, Pp), jnp.float32) for _ in range(K)]
        return for_each_block(body, (list(z), list(z), jnp.zeros((), jnp.float32)))

    def edge_chi2(L_list):
        """chi2-only pass (gain-ratio evaluation at the trial point)."""
        def body(off, blk, chi2_e):
            c, *_ = _spring_damper_block(off, blk, L_list, False)
            return chi2_e + c

        return for_each_block(body, jnp.zeros((), jnp.float32))

    def edge_hv(v_list):
        """Hv pass using the es state written by the last edge_terms call."""
        def body(off, blk, evp):
            dv = [fwd_fast(vk, blk) for vk in v_list]
            sms = [emask_ref[8 * k:8 * k + 1, pl.ds(off, be)]
                   for k in range(K)]
            es = [es_ref[8 * k:8 * k + 8, pl.ds(off, be)] for k in range(K)]
            sv = []
            for k in range(K - 1):
                wd2 = es[k][3:4]
                sv.append((wd2 * (dv[k + 1][0:1] - dv[k][0:1]),
                           wd2 * (dv[k + 1][1:2] - dv[k][1:2]),
                           wd2 * (dv[k + 1][2:3] - dv[k][2:3])))
            out = []
            zero = jnp.zeros_like(dv[0][0:1])
            for k in range(K):
                a0, a1, a2 = es[k][0:1], es[k][1:2], es[k][2:3]
                adot = a0 * dv[k][0:1] + a1 * dv[k][1:2] + a2 * dv[k][2:3]
                wp_ad = INFO_POSITION * sms[k] * adot
                e0, e1, e2 = wp_ad * a0, wp_ad * a1, wp_ad * a2
                if k < K - 1:
                    e0 = e0 - sv[k][0]
                    e1 = e1 - sv[k][1]
                    e2 = e2 - sv[k][2]
                if k > 0:
                    e0 = e0 + sv[k - 1][0]
                    e1 = e1 + sv[k - 1][1]
                    e2 = e2 + sv[k - 1][2]
                ev8 = jnp.concatenate([e0, e1, e2, zero, zero, zero, zero,
                                       zero], axis=0)
                out.append(evp[k] + bwd(ev8, blk))
            return out

        z = [jnp.zeros((8, Pp), jnp.float32) for _ in range(K)]
        return for_each_block(body, list(z))

    # ---- point-side reprojection linearization per KF ----------------------

    def reproj_lin(q, t, Lk, k):
        Rm = pcm.quat_to_matrix(q)
        X0, X1, X2 = Lk[0:1, :], Lk[1:2, :], Lk[2:3, :]
        Xc0 = Rm[0][0] * X0 + Rm[0][1] * X1 + Rm[0][2] * X2 + t[0]
        Xc1 = Rm[1][0] * X0 + Rm[1][1] * X1 + Rm[1][2] * X2 + t[1]
        Xc2 = Rm[2][0] * X0 + Rm[2][1] * X1 + Rm[2][2] * X2 + t[2]
        pu, pv, (p00, p01, p02), (p10, p11, p12) = pcm.project_with_jacobian(
            kind, fx, fy, cx, cy, k_par, Xc0, Xc1, Xc2)
        e_u = u_obs[k] - pu
        e_v = v_obs[k] - pv
        chi2_r = INFO_REPROJECTION * (e_u * e_u + e_v * e_v)
        w_r = INFO_REPROJECTION * _huber_w(chi2_r, TH_2DOF) * omask[k]
        d00, d01, d02 = -p00, -p01, -p02
        d10, d11, d12 = -p10, -p11, -p12
        Jpu = (d01 * (-Xc2) + d02 * Xc1,
               d00 * Xc2 + d02 * (-Xc0),
               d00 * (-Xc1) + d01 * Xc0,
               d00, d01, d02)
        Jpv = (d11 * (-Xc2) + d12 * Xc1,
               d10 * Xc2 + d12 * (-Xc0),
               d10 * (-Xc1) + d11 * Xc0,
               d10, d11, d12)
        Jfu = tuple(d00 * Rm[0][c] + d01 * Rm[1][c] + d02 * Rm[2][c]
                    for c in range(3))
        Jfv = tuple(d10 * Rm[0][c] + d11 * Rm[1][c] + d12 * Rm[2][c]
                    for c in range(3))
        return dict(e_u=e_u, e_v=e_v, w_r=w_r, chi2_r=chi2_r,
                    Jpu=Jpu, Jpv=Jpv, Jfu=Jfu, Jfv=Jfv)

    def system(qs, ts, L_list):
        """Full linearization: per-KF reprojection + one fused edge pass.
        Returns (chi2, g_pose [K][6], g_land [K][8,Pp], H_pose [K],
        D [K][6 rows], reproj lins [K])."""
        lins = [reproj_lin(qs[k], ts[k], L_list[k], k) for k in range(K)]
        gsp, dsum, chi2_e = edge_terms(L_list)
        chi2 = chi2_e
        g_pose, g_land, H_pose, D = [], [], [], []
        for k in range(K):
            ln = lins[k]
            chi2 = chi2 + jnp.sum(_huber_rho(ln["chi2_r"], TH_2DOF)
                                  * omask[k])
            g_pose.append(tuple(
                jnp.sum(ln["w_r"] * (ln["Jpu"][c] * ln["e_u"]
                                     + ln["Jpv"][c] * ln["e_v"]))
                for c in range(6)))
            gf = [ln["w_r"] * (ln["Jfu"][c] * ln["e_u"]
                               + ln["Jfv"][c] * ln["e_v"]) for c in range(3)]
            zero = jnp.zeros_like(gf[0])
            g_land.append(jnp.concatenate(
                [gf[0] + gsp[k][0:1], gf[1] + gsp[k][1:2],
                 gf[2] + gsp[k][2:3], zero, zero, zero, zero, zero], axis=0))
            Hp = tuple(tuple(
                jnp.sum(ln["w_r"] * (ln["Jpu"][a] * ln["Jpu"][b]
                                     + ln["Jpv"][a] * ln["Jpv"][b]))
                if b >= a else 0.0 for b in range(6)) for a in range(6))
            Hp = tuple(tuple(Hp[a][b] if b >= a else Hp[b][a]
                             for b in range(6)) for a in range(6))
            H_pose.append(Hp)
            Dk = [ln["w_r"] * (ln["Jfu"][a] * ln["Jfu"][b]
                               + ln["Jfv"][a] * ln["Jfv"][b])
                  for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2),
                                 (2, 2))]
            D.append([Dk[i] + dsum[k][i:i + 1, :] for i in range(6)])
        return chi2, g_pose, g_land, H_pose, D, lins

    def chi2_at(qs, ts, L_list):
        chi2 = edge_chi2(L_list)
        for k in range(K):
            ln = reproj_lin(qs[k], ts[k], L_list[k], k)
            chi2 = chi2 + jnp.sum(_huber_rho(ln["chi2_r"], TH_2DOF)
                                  * omask[k])
        return chi2

    def hvp(lins, vp, vf, lam):
        """vp: [K][6 scalars], vf: [K][8,Pp]."""
        out_pose, out_land = [], []
        evp = edge_hv(vf)
        for k in range(K):
            ln = lins[k]
            r_u = sum(ln["Jpu"][c] * vp[k][c] for c in range(6)) \
                + sum(ln["Jfu"][i] * vf[k][i:i + 1, :] for i in range(3))
            r_v = sum(ln["Jpv"][c] * vp[k][c] for c in range(6)) \
                + sum(ln["Jfv"][i] * vf[k][i:i + 1, :] for i in range(3))
            wr = ln["w_r"]
            out_pose.append(tuple(
                jnp.sum(wr * (ln["Jpu"][c] * r_u + ln["Jpv"][c] * r_v))
                + lam * vp[k][c] for c in range(6)))
            of = [wr * (ln["Jfu"][i] * r_u + ln["Jfv"][i] * r_v)
                  for i in range(3)]
            o0 = of[0] + evp[k][0:1] + lam * vf[k][0:1]
            o1 = of[1] + evp[k][1:2] + lam * vf[k][1:2]
            o2 = of[2] + evp[k][2:3] + lam * vf[k][2:3]
            zero = jnp.zeros_like(o0)
            out_land.append(jnp.concatenate(
                [o0, o1, o2, zero, zero, zero, zero, zero], axis=0))
        return out_pose, out_land

    def dot(vp_a, vf_a, vp_b, vf_b):
        s = jnp.zeros((), jnp.float32)
        for k in range(K):
            s = s + sum(vp_a[k][c] * vp_b[k][c] for c in range(6))
            s = s + jnp.sum(vf_a[k][0:3, :] * vf_b[k][0:3, :])
        return s

    def precond(H_pose, D, lam, rp, rf):
        zp, zf = [], []
        for k in range(K):
            Hp_inv = pcm.inv6(H_pose[k], lam)
            zp.append(tuple(sum(Hp_inv[i][j] * rp[k][j] for j in range(6))
                            for i in range(6)))
            Dk = D[k]
            m = ((Dk[0] + lam, Dk[1], Dk[2]),
                 (Dk[1], Dk[3] + lam, Dk[4]),
                 (Dk[2], Dk[4], Dk[5] + lam))
            minv = pcm.inv3(m)
            z0 = (minv[0][0] * rf[k][0:1] + minv[0][1] * rf[k][1:2]
                  + minv[0][2] * rf[k][2:3])
            z1 = (minv[1][0] * rf[k][0:1] + minv[1][1] * rf[k][1:2]
                  + minv[1][2] * rf[k][2:3])
            z2 = (minv[2][0] * rf[k][0:1] + minv[2][1] * rf[k][1:2]
                  + minv[2][2] * rf[k][2:3])
            zero = jnp.zeros_like(z0)
            zf.append(jnp.concatenate([z0, z1, z2, zero, zero, zero, zero,
                                       zero], axis=0))
        return zp, zf

    def pcg(lins, g_pose, g_land, H_pose, D, lam):
        bp = [tuple(-g for g in g_pose[k]) for k in range(K)]
        bf = [-g_land[k] for k in range(K)]
        xp = [tuple(jnp.zeros(()) for _ in range(6)) for _ in range(K)]
        xf = [jnp.zeros_like(b) for b in bf]
        rp, rf = bp, bf
        zp, zf = precond(H_pose, D, lam, rp, rf)
        pp, pf = zp, zf
        rz = dot(rp, rf, zp, zf)
        b2 = dot(bp, bf, bp, bf)

        def body(_, carry):
            xp, xf, rp, rf, pp, pf, rz, done = carry
            hp, hf = hvp(lins, pp, pf, lam)
            denom = dot(pp, pf, hp, hf)
            alpha = jnp.where(jnp.abs(denom) > 0, rz / denom, 0.0)
            alpha = jnp.where(done, 0.0, alpha)
            xp = [tuple(xp[k][c] + alpha * pp[k][c] for c in range(6))
                  for k in range(K)]
            xf = [xf[k] + alpha * pf[k] for k in range(K)]
            rp = [tuple(rp[k][c] - alpha * hp[k][c] for c in range(6))
                  for k in range(K)]
            rf = [rf[k] - alpha * hf[k] for k in range(K)]
            zp, zf = precond(H_pose, D, lam, rp, rf)
            rz_new = dot(rp, rf, zp, zf)
            beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
            pp = [tuple(zp[k][c] + beta * pp[k][c] for c in range(6))
                  for k in range(K)]
            pf = [zf[k] + beta * pf[k] for k in range(K)]
            done = done | (dot(rp, rf, rp, rf) <= CG_TOL * CG_TOL * b2)
            return xp, xf, rp, rf, pp, pf, \
                jnp.where(done, rz, rz_new), done

        carry = (xp, xf, rp, rf, pp, pf, rz, jnp.zeros((), jnp.bool_))
        out = jax.lax.fori_loop(0, cg_iters, body, carry)
        return out[0], out[1]

    # ---- LM schedule (5 iterations, re-linearize at accepted point) --------

    chi0, g_pose0, g_land0, H_pose0, D0, _ = system(q0, t0, L0)
    diag_max = H_pose0[0][0][0]
    for k in range(K):
        for c in range(6):
            diag_max = jnp.maximum(diag_max, H_pose0[k][c][c])
        for idx in (0, 3, 5):
            diag_max = jnp.maximum(diag_max, jnp.max(D0[k][idx]))
    lam0 = LM_TAU * diag_max

    def lm_body(_, carry):
        qs_flat, ts_flat, L_flat, lam, nu, chi2_cur = carry
        qs = [tuple(qs_flat[4 * k + i] for i in range(4)) for k in range(K)]
        ts = [tuple(ts_flat[3 * k + i] for i in range(3)) for k in range(K)]
        L_list = [L_flat[k] for k in range(K)]
        _, g_pose, g_land, H_pose, D, lins = system(qs, ts, L_list)
        dxp, dxf = pcg(lins, g_pose, g_land, H_pose, D, lam)
        qn, tn = [], []
        for k in range(K):
            qk, tk = pcm.se3_retract(qs[k], ts[k], dxp[k])
            qn.append(qk)
            tn.append(tk)
        L_new = [L_list[k] + dxf[k] for k in range(K)]
        chi2_new = chi2_at(qn, tn, L_new)
        denom = jnp.zeros((), jnp.float32)
        for k in range(K):
            denom = denom + sum(
                dxp[k][c] * (lam * dxp[k][c] - g_pose[k][c])
                for c in range(6))
            denom = denom + jnp.sum(
                dxf[k][0:3] * (lam * dxf[k][0:3] - g_land[k][0:3]))
        rho = (chi2_cur - chi2_new) / jnp.where(jnp.abs(denom) > 0, denom,
                                                1.0)
        accepted = rho > 0
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accepted, lam * shrink, lam * nu)
        nu = jnp.where(accepted, 2.0, nu * 2.0)
        sel = lambda a, b: jnp.where(accepted, a, b)
        qs_out = tuple(sel(qn[k][i], qs[k][i])
                       for k in range(K) for i in range(4))
        ts_out = tuple(sel(tn[k][i], ts[k][i])
                       for k in range(K) for i in range(3))
        L_out = tuple(sel(L_new[k], L_list[k]) for k in range(K))
        chi2_cur = jnp.where(accepted, chi2_new, chi2_cur)
        return qs_out, ts_out, L_out, lam, nu, chi2_cur

    qs0_flat = tuple(q0[k][i] for k in range(K) for i in range(4))
    ts0_flat = tuple(t0[k][i] for k in range(K) for i in range(3))
    carry0 = (qs0_flat, ts0_flat, tuple(L0), lam0, jnp.float32(2.0), chi0)
    qs_f, ts_f, L_f, *_ = jax.lax.fori_loop(0, n_iters, lm_body, carry0)

    for k in range(K):
        for i in range(4):
            out_pose_ref[8 * k + i] = qs_f[4 * k + i]
        for i in range(3):
            out_pose_ref[8 * k + 4 + i] = ts_f[3 * k + i]
        out_L_ref[8 * k:8 * k + 8, :] = L_f[k]


def fits_vmem(P: int, E_raw: int, budget_bytes: int = 9 * 2 ** 20) -> bool:
    """Whether the RESIDENT BA kernel's selector fits VMEM (slightly lower
    threshold than the joint kernel: the per-KF linearization state is K
    times larger). ``E_raw`` is the table actually passed — the wrapper
    never re-truncates (compaction policy lives in compact_pairs
    upstream)."""
    Pp = ((P + 127) // 128) * 128
    E = ((E_raw + 127) // 128) * 128
    return E * Pp * 2 <= budget_bytes


def local_deformable_ba_pallas(cam, poses0, L0, problem, n_iters: int = 5,
                               cg_iters: int = 32, interpret: bool = False,
                               stream: bool | None = None):
    """Drop-in core for bundle_adjustment.local_deformable_ba.

    The edge table is consumed AS GIVEN (padded to whole blocks, never
    re-truncated). Returns (poses [K], landmarks [K, P, 3]); unobserved
    landmark copies keep their input values exactly (they participate in no
    factor).
    """
    from nrslam_tpu.geometry import se3 as se3_mod

    K, P, _ = L0.shape
    Pp = ((P + 127) // 128) * 128
    pairs = problem.pairs
    E_raw = pairs.i.shape[0]
    if stream is None:
        stream = not fits_vmem(P, E_raw)
    budget = ((E_raw + 127) // 128) * 128
    be = min(STREAM_BLOCK if stream else 2 * STREAM_BLOCK, budget)
    E_pad = ((budget + be - 1) // be) * be
    n_blocks = E_pad // be

    def _pad(x, fill):
        if E_raw < E_pad:
            pad = jnp.full((E_pad - E_raw,), fill, x.dtype)
            return jnp.concatenate([x, pad])
        return x

    pairs = pairs._replace(
        i=_pad(pairs.i, 0), j=_pad(pairs.j, 0),
        w=_pad(pairs.w, 0.0), d0=_pad(pairs.d0, 1.0),
        valid=_pad(pairs.valid, False))
    E = E_pad

    # Factor masks at the compacted table (bundle_adjustment._masks).
    obs_ok = problem.obs_valid & problem.kf_valid[:, None]       # [K, P]
    spring = (obs_ok[:, pairs.i] & obs_ok[:, pairs.j]
              & pairs.valid[None])                               # [K, E]
    damper = spring[:-1] & spring[1:]                            # [K-1, E]

    # Sanitize unobserved copies (invalid KF slots hold zeros whose
    # projection is NaN; masked factors would still be poisoned by NaN*0).
    benign = jnp.array([0.1, 0.1, 1.0], L0.dtype)
    L0_s = jnp.where(obs_ok[..., None], L0, benign)
    obs_s = jnp.where(obs_ok[..., None], problem.obs, 0.0)

    sigma_s = 0.1 * problem.scale
    info_s = 1.0 / (sigma_s * sigma_s)

    def pack_rows(rows_per_k, width):
        a = jnp.zeros((8 * K, width), jnp.float32)
        for k, rows in enumerate(rows_per_k):
            for i, r in enumerate(rows):
                a = a.at[8 * k + i, :r.shape[0]].set(r.astype(jnp.float32))
        return a

    L8 = pack_rows([[L0_s[k, :, 0], L0_s[k, :, 1], L0_s[k, :, 2]]
                    for k in range(K)], Pp)
    # Benign padded lanes.
    for k in range(K):
        L8 = L8.at[8 * k + 0, P:].set(0.1)
        L8 = L8.at[8 * k + 1, P:].set(0.1)
        L8 = L8.at[8 * k + 2, P:].set(1.0)
    obsm = pack_rows([[obs_s[k, :, 0], obs_s[k, :, 1],
                       obs_ok[k].astype(jnp.float32)] for k in range(K)], Pp)
    pair8 = pack_rows([[pairs.w, jnp.maximum(pairs.d0, 1e-12)]], E)[:8]
    emask_rows = []
    for k in range(K):
        dm = damper[k] if k < K - 1 else jnp.zeros(E, bool)
        emask_rows.append([spring[k].astype(jnp.float32),
                           dm.astype(jnp.float32)])
    emask = pack_rows(emask_rows, E)

    keep = pairs.valid
    if interpret:
        sel_dtype = jnp.float32
    else:
        sel_dtype = jnp.int8 if stream else jnp.bfloat16
    Si = jax.nn.one_hot(jnp.where(keep, pairs.i, -1), Pp, dtype=jnp.float32)
    Sj = jax.nn.one_hot(jnp.where(keep, pairs.j, -1), Pp, dtype=jnp.float32)
    Sd = (Si - Sj).astype(sel_dtype)

    params = jnp.zeros(8 + 7 * K + 8, jnp.float32)
    params = params.at[:cam.params.shape[0]].set(cam.params)
    for k in range(K):
        params = params.at[8 + 7 * k:8 + 7 * k + 4].set(poses0.q[k])
        params = params.at[8 + 7 * k + 4:8 + 7 * k + 7].set(poses0.t[k])
    params = params.at[8 + 7 * K].set(info_s)

    kernel = functools.partial(
        _ba_kernel, kind=cam.kind, K=K, n_iters=n_iters, cg_iters=cg_iters,
        max_k_params=4, sel_bf16=not interpret, stream=bool(stream),
        n_blocks=n_blocks, be=be)

    sd_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream
               else pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((8 * K, E), jnp.float32)]   # per-edge Hv state
    if stream:
        scratch += [pltpu.VMEM((2, be, Pp), sel_dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [sd_spec],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
    )
    out_pose, out_L = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8 * K,), jnp.float32),
                   jax.ShapeDtypeStruct((8 * K, Pp), jnp.float32)],
        interpret=interpret,
    )(params, L8, obsm, pair8, emask, Sd)

    qs = out_pose.reshape(K, 8)[:, :4]
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    poses = se3_mod.SE3(qs, out_pose.reshape(K, 8)[:, 4:7])
    L_out = jnp.stack([out_L[8 * k:8 * k + 3, :P].T for k in range(K)])
    # Unobserved copies keep their inputs (their update is exactly zero in
    # the XLA driver; here they were sanitized for NaN safety).
    L_out = jnp.where(obs_ok[..., None], L_out, L0)
    return poses, L_out
