"""Whole-solver Pallas TPU kernel for the joint pose+deformation LM.

The XLA driver (solver/pose_deformation.py) runs 2 rounds x <= 10 LM
iterations, each with a 10-trip block-preconditioned CG — ~3800 serial
dispatches whose fixed costs and repeated HBM streaming of the [E, P]
selector matrices dominate device time (~4 ms at P=384). This kernel runs
the ENTIRE schedule in ONE launch.

Two selector placements, one code path (the kernel is written as a loop
over edge blocks; resident mode is the single-block case):

- **resident** — the [E, Pp] bf16 difference selector lives in VMEM for the
  whole schedule. Fastest; fits up to P ~ 900 at the production K=11 (the
  endpoint-sum selector |Sd| is derived per use on the VPU instead of being
  stored, which halved the old two-selector VMEM footprint).
- **streaming** — the selector lives in HBM as int8 (entries 0/+-1) and
  every edge pass streams it block-by-block with double-buffered DMA,
  converting blocks to bf16 in VMEM. All edge products of one pass (the
  hi/lo-split forward difference, the gradient scatter, the Jacobi-diagonal
  endpoint sums) are fused into the SAME stream, so a full linearization or
  Hessian-vector product costs ONE pass over the int8 table (~E*P bytes).
  This removes the VMEM ceiling entirely — the reference-scale P >= 768
  points run the whole 2x10-iteration schedule in one launch instead of
  falling back to the XLA driver.

Mosaic constraint that shapes the code: values (loop-carried arrays) cannot
be sliced at dynamic offsets on TPU (no dynamic_slice/dynamic_update_slice
lowering), but VMEM *refs* can. All per-edge [_, E] state therefore lives
in scratch refs — the cached rest-position differences, the packed per-edge
linearization state (double-buffered: trial writes + copy-on-accept), and
the releveled spatial mask — and each block slices them with ``pl.ds``.

Numerics vs the XLA driver (TPU): selector entries 0/+-1 are exact in bf16
and int8. Residual-grade products (flow differences, spring distances) use
a two-term hi/lo split of x — ~2^-17 relative accuracy vs core.selmm_exact's
exact f32; direction-grade products (gradient scatter, Hessian-vector) cast
x to bf16 outright, exactly like core.selmm. Under interpret/CPU everything
is f32, matching core.selmm's CPU fallback.

Variables: one SE(3) twist (scalar core) + per-point 3D flows as [8, P]
coordinate-row lane arrays. Factor math mirrors pose_deformation._system
term by term (reference: CameraPoseAndDeformationOptimization,
g2o_optimization.cc:148-557).
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
SPRING_K = 1.1
LM_TAU = 1e-5
CG_TOL = 1e-8

# Streaming edge-block size (sublane extent of the DMA'd selector block;
# multiple of 32 for int8 tiling). 512 rows x Pp lanes keeps each DMA large
# enough to hit HBM streaming bandwidth while the two scratch buffers stay
# ~1 MB at P=1024.
STREAM_BLOCK = 512


def _huber_w(chi2, th):
    safe = jnp.maximum(chi2, 1e-20)
    return jnp.where(chi2 <= th, 1.0, jnp.sqrt(th / safe))


def _huber_rho(chi2, th):
    delta = th ** 0.5
    return jnp.where(chi2 <= th, chi2,
                     2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-20)) - th)


def _joint_kernel(par_ref, rest_ref, obs_ref, pmask_ref, pair_ref, Sd_ref,
                  out_pose_ref, out_arr_ref, *scratch, kind: str,
                  rounds: tuple, cg_iters: int, max_k_params: int,
                  sel_bf16: bool, stream: bool, n_blocks: int, be: int):
    if stream:
        drest_ref, es_cur_ref, es_trial_ref, smask_ref, buf_ref, sem_ref = \
            scratch
    else:
        drest_ref, es_cur_ref, es_trial_ref, smask_ref = scratch
        buf_ref = sem_ref = None

    fx = par_ref[0]
    fy = par_ref[1]
    cx = par_ref[2]
    cy = par_ref[3]
    k_par = tuple(par_ref[4 + i] for i in range(max_k_params))
    q0 = tuple(par_ref[8 + i] for i in range(4))
    t0 = tuple(par_ref[12 + i] for i in range(3))
    info_r = par_ref[15]
    info_s = par_ref[16]
    info_p = par_ref[17]

    Pp = rest_ref.shape[1]

    R0 = rest_ref[0:1, :]
    R1 = rest_ref[1:2, :]
    R2 = rest_ref[2:3, :]
    rest8 = rest_ref[...]
    u_obs = obs_ref[0:1, :]
    v_obs = obs_ref[1:2, :]
    pmask = pmask_ref[0:1, :]

    sel_comp = jnp.bfloat16 if sel_bf16 else jnp.float32
    dn_fwd = (((1,), (1,)), ((), ()))   # [8,Pp] x [be,Pp] -> [8,be]
    dn_bwd = (((1,), (0,)), ((), ()))   # [8,be] x [be,Pp] -> [8,Pp]

    def _dot(x8, S, dn):
        return jax.lax.dot_general(x8, S, dn,
                                   preferred_element_type=jnp.float32)

    # Selector dtype strategy: on TPU the streamed/resident selector is
    # int8/bf16 (0/+-1 entries exact). Residual-grade forward products use a
    # two-term hi/lo split of x (each bf16 product exact => ~2^-17 relative
    # accuracy vs exact f32); direction-grade products cast x to bf16
    # outright, like core.selmm. Under interpret/CPU everything stays f32.
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

    # ---- block sourcing: resident = one VMEM block; streaming = DMA ----

    def for_each_block(body, carry0):
        """body(off, sd_blk [be, Pp] compute-dtype, carry) -> carry.

        Resident mode reads blocks straight from the VMEM selector (still
        blocked: per-block |Sd| / cast temporaries stay small — a full-width
        abs would re-materialize the old second selector and blow VMEM);
        streaming mode double-buffers DMA'd blocks from the HBM selector."""
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

    # Rest-position edge differences (exact): one pass, cached in scratch
    # for the whole schedule.
    rest_split = _split(rest8)

    def _drest_body(off, blk, carry):
        drest_ref[:, pl.ds(off, be)] = fwd_exact(rest_split, blk)
        return carry

    for_each_block(_drest_body, 0)

    # Spatial-damper mask starts as the base pair mask; relevels between
    # rounds (row 0 of the scratch is the live mask).
    smask_ref[0:1, :] = pair_ref[2:3, :]

    # ---- fused edge passes -------------------------------------------------

    def edge_terms(flows8, releveled: bool, es_out_ref):
        """One pass over the selector: forward flow differences, per-edge
        robust weights, gradient scatter and Jacobi-diagonal endpoint sums.

        Writes packed per-edge state to ``es_out_ref`` (rows 0=ws 1=w_p
        2..4=a 5=chi2_s) and returns (gsp [8,Pp] edge gradient rows,
        dsum [8,Pp] D-pack rows, chi2_edge scalar). ``releveled`` (static)
        selects the releveled spatial mask vs the base mask; the spring
        mask is always the base mask (springs never relevel).
        """
        xs = _split(flows8)

        def body(off, blk, carry):
            gsp, dsum, chi2_e = carry
            dfl = fwd_exact(xs, blk)                    # [8, be]
            df0 = dfl[0:1]
            df1 = dfl[1:2]
            df2 = dfl[2:3]
            dr = drest_ref[:, pl.ds(off, be)]
            pw_b = pair_ref[0:1, pl.ds(off, be)]
            d0_b = pair_ref[1:2, pl.ds(off, be)]
            pm_b = pair_ref[2:3, pl.ds(off, be)]        # spring mask = base
            if releveled:
                sm_b = smask_ref[0:1, pl.ds(off, be)]
            else:
                sm_b = pm_b
            sd0_b = jnp.maximum(d0_b, 1e-12)
            kd0_b = SPRING_K / sd0_b

            chi2_s = info_s * (pw_b * pw_b) * (df0 * df0 + df1 * df1
                                               + df2 * df2)
            w_s = info_s * _huber_w(chi2_s, TH_3DOF) * sm_b

            diff0 = dr[0:1] + df0
            diff1 = dr[1:2] + df1
            diff2 = dr[2:3] + df2
            dist = jnp.sqrt(diff0 * diff0 + diff1 * diff1 + diff2 * diff2)
            e_p = SPRING_K * (dist - d0_b) / sd0_b
            chi2_p = info_p * e_p * e_p
            w_p = info_p * _huber_w(chi2_p, TH_3DOF) * pm_b

            chi2_e = (chi2_e
                      + jnp.sum(_huber_rho(chi2_s, TH_3DOF) * sm_b)
                      + jnp.sum(_huber_rho(chi2_p, TH_3DOF) * pm_b))

            ws = pw_b * pw_b * w_s
            inv_dist = 1.0 / jnp.maximum(dist, 1e-12)
            a0 = kd0_b * diff0 * inv_dist
            a1 = kd0_b * diff1 * inv_dist
            a2 = kd0_b * diff2 * inv_dist

            # Spatial gradient coefficient on dflow is ws = w_s * pw^2 (the
            # XLA driver's (w_s*pw) e_s with e_s = pw*dflow), keeping
            # gradient and Hv operator consistent.
            wpe = w_p * e_p
            zero = jnp.zeros_like(df0)
            gs8 = jnp.concatenate(
                [ws * df0 + wpe * a0, ws * df1 + wpe * a1,
                 ws * df2 + wpe * a2, zero, zero, zero, zero, zero], axis=0)
            gsp = gsp + bwd(gs8, blk)

            # D endpoint sums against |Sd|: ws on the diagonal, w_p a a^T
            # everywhere (rows map to D entries 00,01,02,11,12,22).
            pack = jnp.concatenate(
                [ws + w_p * a0 * a0, w_p * a0 * a1, w_p * a0 * a2,
                 ws + w_p * a1 * a1, w_p * a1 * a2, ws + w_p * a2 * a2,
                 zero, zero], axis=0)
            dsum = dsum + bwd(pack, jnp.abs(blk))

            es_out_ref[:, pl.ds(off, be)] = jnp.concatenate(
                [ws, w_p, a0, a1, a2, chi2_s, zero, zero], axis=0)
            return gsp, dsum, chi2_e

        carry0 = (jnp.zeros((8, Pp), jnp.float32),
                  jnp.zeros((8, Pp), jnp.float32),
                  jnp.zeros((), jnp.float32))
        return for_each_block(body, carry0)

    def edge_hv(vf8):
        """One pass: evp = Sd^T (ws * Sd v + w_p a (a . Sd v)), reading the
        ACCEPTED per-edge state (es_cur)."""
        def body(off, blk, evp):
            dv = fwd_fast(vf8, blk)
            es_b = es_cur_ref[:, pl.ds(off, be)]
            ws = es_b[0:1]
            w_p = es_b[1:2]
            a0 = es_b[2:3]
            a1 = es_b[3:4]
            a2 = es_b[4:5]
            adot = a0 * dv[0:1] + a1 * dv[1:2] + a2 * dv[2:3]
            wp_ad = w_p * adot
            zero = jnp.zeros_like(adot)
            ev8 = jnp.concatenate(
                [ws * dv[0:1] + wp_ad * a0, ws * dv[1:2] + wp_ad * a1,
                 ws * dv[2:3] + wp_ad * a2, zero, zero, zero, zero, zero],
                axis=0)
            return evp + bwd(ev8, blk)

        return for_each_block(body, jnp.zeros((8, Pp), jnp.float32))

    # ---- system linearization ---------------------------------------------

    def system(q, t, flows8, point_mask, releveled: bool, es_out_ref):
        """Linearize at (q, t, flows). Mirrors pose_deformation._system."""
        Rm = pcm.quat_to_matrix(q)
        F0 = flows8[0:1, :]
        F1 = flows8[1:2, :]
        F2 = flows8[2:3, :]
        X0 = R0 + F0
        X1 = R1 + F1
        X2 = R2 + F2
        Xc0 = Rm[0][0] * X0 + Rm[0][1] * X1 + Rm[0][2] * X2 + t[0]
        Xc1 = Rm[1][0] * X0 + Rm[1][1] * X1 + Rm[1][2] * X2 + t[1]
        Xc2 = Rm[2][0] * X0 + Rm[2][1] * X1 + Rm[2][2] * X2 + t[2]

        pu, pv, (p00, p01, p02), (p10, p11, p12) = pcm.project_with_jacobian(
            kind, fx, fy, cx, cy, k_par, Xc0, Xc1, Xc2)

        e_u = u_obs - pu
        e_v = v_obs - pv
        chi2_r = info_r * (e_u * e_u + e_v * e_v)
        w_r = info_r * _huber_w(chi2_r, TH_2DOF) * point_mask

        d00, d01, d02 = -p00, -p01, -p02
        d10, d11, d12 = -p10, -p11, -p12
        # J_pose columns (expmap [-[pc]x | I]).
        Jpu = (d01 * (-Xc2) + d02 * Xc1,
               d00 * Xc2 + d02 * (-Xc0),
               d00 * (-Xc1) + d01 * Xc0,
               d00, d01, d02)
        Jpv = (d11 * (-Xc2) + d12 * Xc1,
               d10 * Xc2 + d12 * (-Xc0),
               d10 * (-Xc1) + d11 * Xc0,
               d10, d11, d12)
        # J_flow = dpi @ R (rows of the world-point Jacobian).
        Jfu = tuple(d00 * Rm[0][c] + d01 * Rm[1][c] + d02 * Rm[2][c]
                    for c in range(3))
        Jfv = tuple(d10 * Rm[0][c] + d11 * Rm[1][c] + d12 * Rm[2][c]
                    for c in range(3))

        # Edge terms: one fused pass over the selector.
        gsp, dsum, chi2_edge = edge_terms(flows8, releveled, es_out_ref)

        chi2_total = (jnp.sum(_huber_rho(chi2_r, TH_2DOF) * point_mask)
                      + chi2_edge)

        # Gradient.
        g_pose = tuple(jnp.sum(w_r * (Jpu[c] * e_u + Jpv[c] * e_v))
                       for c in range(6))
        gf = [w_r * (Jfu[c] * e_u + Jfv[c] * e_v) for c in range(3)]
        g_flow8 = jnp.concatenate(
            [gf[0] + gsp[0:1], gf[1] + gsp[1:2], gf[2] + gsp[2:3],
             jnp.zeros_like(gf[0]), jnp.zeros_like(gf[0]),
             jnp.zeros_like(gf[0]), jnp.zeros_like(gf[0]),
             jnp.zeros_like(gf[0])], axis=0)

        # Block diagonal for the preconditioner.
        H_pose = tuple(tuple(
            jnp.sum(w_r * (Jpu[a] * Jpu[b] + Jpv[a] * Jpv[b]))
            if b >= a else 0.0 for b in range(6)) for a in range(6))
        H_pose = tuple(tuple(H_pose[a][b] if b >= a else H_pose[b][a]
                             for b in range(6)) for a in range(6))
        # D entries (symmetric 3x3 per point): reprojection part + the edge
        # endpoint sums streamed in edge_terms.
        D = [w_r * (Jfu[a] * Jfu[b] + Jfv[a] * Jfv[b])
             for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))]
        D = [D[i] + dsum[i:i + 1, :] for i in range(6)]

        return dict(q=q, t=t, g_pose=g_pose, g_flow8=g_flow8,
                    chi2=chi2_total, H_pose=H_pose, D=D,
                    Jpu=Jpu, Jpv=Jpv, Jfu=Jfu, Jfv=Jfv, w_r=w_r,
                    chi2_r=chi2_r)

    def hvp(lin, vp, vf8, lam):
        """Gauss-Newton H @ v (+ lam v). Mirrors pose_deformation._make_hvp."""
        r_u = sum(lin["Jpu"][c] * vp[c] for c in range(6)) \
            + sum(lin["Jfu"][k] * vf8[k:k + 1, :] for k in range(3))
        r_v = sum(lin["Jpv"][c] * vp[c] for c in range(6)) \
            + sum(lin["Jfv"][k] * vf8[k:k + 1, :] for k in range(3))
        wr = lin["w_r"]
        out_pose = tuple(
            jnp.sum(wr * (lin["Jpu"][c] * r_u + lin["Jpv"][c] * r_v))
            + lam * vp[c] for c in range(6))
        of = [wr * (lin["Jfu"][k] * r_u + lin["Jfv"][k] * r_v)
              for k in range(3)]
        evp = edge_hv(vf8)
        out0 = of[0] + evp[0:1] + lam * vf8[0:1]
        out1 = of[1] + evp[1:2] + lam * vf8[1:2]
        out2 = of[2] + evp[2:3] + lam * vf8[2:3]
        zero = jnp.zeros_like(out0)
        out_f8 = jnp.concatenate([out0, out1, out2, zero, zero, zero,
                                  zero, zero], axis=0)
        return out_pose, out_f8

    def dot(vp_a, vf_a, vp_b, vf_b):
        s = sum(vp_a[c] * vp_b[c] for c in range(6))
        s = s + jnp.sum(vf_a[0:3, :] * vf_b[0:3, :])
        return s

    def precond(lin, lam, rp, rf8):
        """Block-Jacobi: 6x6 pose block + per-point 3x3 flow blocks."""
        Hp_inv = pcm.inv6(lin["H_pose"], lam)
        zp = tuple(sum(Hp_inv[i][j] * rp[j] for j in range(6))
                   for i in range(6))
        D = lin["D"]
        m = ((D[0] + lam, D[1], D[2]),
             (D[1], D[3] + lam, D[4]),
             (D[2], D[4], D[5] + lam))
        minv = pcm.inv3(m)
        z0 = minv[0][0] * rf8[0:1] + minv[0][1] * rf8[1:2] + minv[0][2] * rf8[2:3]
        z1 = minv[1][0] * rf8[0:1] + minv[1][1] * rf8[1:2] + minv[1][2] * rf8[2:3]
        z2 = minv[2][0] * rf8[0:1] + minv[2][1] * rf8[1:2] + minv[2][2] * rf8[2:3]
        zero = jnp.zeros_like(z0)
        return zp, jnp.concatenate([z0, z1, z2, zero, zero, zero, zero, zero],
                                   axis=0)

    def pcg(lin, lam):
        """Fixed-trip preconditioned CG for (H + lam) dx = -g (core.pcg)."""
        bp = tuple(-g for g in lin["g_pose"])
        bf8 = -lin["g_flow8"]
        xp = tuple(jnp.zeros(()) for _ in range(6))
        xf8 = jnp.zeros_like(bf8)
        rp, rf8 = bp, bf8
        zp, zf8 = precond(lin, lam, rp, rf8)
        pp, pf8 = zp, zf8
        rz = dot(rp, rf8, zp, zf8)
        b2 = dot(bp, bf8, bp, bf8)

        def body(_, carry):
            xp, xf8, rp, rf8, pp, pf8, rz, done = carry
            hp, hf8 = hvp(lin, pp, pf8, lam)
            denom = dot(pp, pf8, hp, hf8)
            alpha = jnp.where(jnp.abs(denom) > 0, rz / denom, 0.0)
            alpha = jnp.where(done, 0.0, alpha)
            xp = tuple(xp[c] + alpha * pp[c] for c in range(6))
            xf8 = xf8 + alpha * pf8
            rp = tuple(rp[c] - alpha * hp[c] for c in range(6))
            rf8 = rf8 - alpha * hf8
            zp, zf8 = precond(lin, lam, rp, rf8)
            rz_new = dot(rp, rf8, zp, zf8)
            beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
            pp = tuple(zp[c] + beta * pp[c] for c in range(6))
            pf8 = zf8 + beta * pf8
            done = done | (dot(rp, rf8, rp, rf8) <= CG_TOL * CG_TOL * b2)
            return xp, xf8, rp, rf8, pp, pf8, \
                jnp.where(done, rz, rz_new), done

        carry = (xp, xf8, rp, rf8, pp, pf8, rz, jnp.zeros((), jnp.bool_))
        xp, xf8, *_ = jax.lax.fori_loop(0, cg_iters, body, carry)
        return xp, xf8

    # ---- schedule: 2 rounds with reset + chi2 re-leveling ----
    point_mask = pmask
    q, t = q0, t0
    flows8 = jnp.zeros_like(rest8)

    for round_idx, n_iters in enumerate(rounds):
        releveled = round_idx > 0
        q, t = q0, t0
        flows8 = jnp.zeros_like(rest8)
        lin = system(q, t, flows8, point_mask, releveled, es_cur_ref)
        diag_max = lin["H_pose"][0][0]
        for c in range(1, 6):
            diag_max = jnp.maximum(diag_max, lin["H_pose"][c][c])
        for idx in (0, 3, 5):
            diag_max = jnp.maximum(diag_max, jnp.max(lin["D"][idx]))
        lam = LM_TAU * diag_max

        def lm_body(j, carry, releveled=releveled):
            (qw_, qx_, qy_, qz_, t0_, t1_, t2_, flows_, lam_, nu_, done_,
             lin_) = carry
            q_ = (qw_, qx_, qy_, qz_)
            t_ = (t0_, t1_, t2_)
            dxp, dxf8 = pcg(lin_, lam_)
            qn, tn = pcm.se3_retract(q_, t_, dxp)
            flows_n = flows_ + dxf8
            lin_n = system(qn, tn, flows_n, point_mask, releveled,
                           es_trial_ref)

            gp = lin_["g_pose"]
            denom = sum(dxp[c] * (lam_ * dxp[c] - gp[c]) for c in range(6)) \
                + jnp.sum(dxf8[0:3] * (lam_ * dxf8[0:3]
                                       - lin_["g_flow8"][0:3]))
            rho = (lin_["chi2"] - lin_n["chi2"]) / jnp.where(
                jnp.abs(denom) > 0, denom, 1.0)
            accepted = rho > 0
            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            run = ~done_
            acc = accepted & run
            lam_out = jnp.where(run,
                                jnp.where(accepted, lam_ * shrink,
                                          lam_ * nu_), lam_)
            nu_out = jnp.where(run, jnp.where(accepted, 2.0, nu_ * 2.0), nu_)

            # Accepted trial => its per-edge state becomes current.
            @pl.when(acc)
            def _():
                es_cur_ref[...] = es_trial_ref[...]

            sel = lambda a, b: jnp.where(acc, a, b)
            q_out = tuple(sel(qn[c], q_[c]) for c in range(4))
            t_out = tuple(sel(tn[c], t_[c]) for c in range(3))
            flows_out = jnp.where(acc, flows_n, flows_)
            lin_out = jax.tree.map(lambda a, b: jnp.where(acc, a, b),
                                   lin_n, lin_)
            dx2 = sum(d * d for d in dxp) + jnp.sum(dxf8[0:3] * dxf8[0:3])
            done_out = done_ | (acc & (dx2 < 1e-12))
            return q_out + t_out + (flows_out, lam_out, nu_out, done_out,
                                    lin_out)

        carry0 = q + t + (flows8, lam, jnp.float32(2.0),
                          jnp.zeros((), jnp.bool_), lin)
        out = jax.lax.fori_loop(0, n_iters, lm_body, carry0)
        q = tuple(out[0:4])
        t = tuple(out[4:7])
        flows8 = out[7]

        # Re-level by chi2 at the round optimum (full base masks). chi2_s
        # comes back in the trial edge-state scratch (row 5).
        lin_r = system(q, t, flows8, pmask, False, es_trial_ref)
        point_mask = pmask * jnp.where(lin_r["chi2_r"] <= TH_2DOF, 1.0, 0.0)
        smask_ref[0:1, :] = pair_ref[2:3, :] * jnp.where(
            es_trial_ref[5:6, :] <= TH_3DOF, 1.0, 0.0)

    # Final linearization for the gates (full masks).
    lin_f = system(q, t, flows8, pmask, False, es_trial_ref)

    for c in range(4):
        out_pose_ref[c] = q[c]
    for c in range(3):
        out_pose_ref[4 + c] = t[c]
    out = jnp.concatenate(
        [flows8[0:3, :], lin_f["chi2_r"],
         jnp.zeros_like(flows8[0:4, :])], axis=0)
    out_arr_ref[...] = out


def fits_vmem(P: int, E_raw: int, budget_bytes: int = 10 * 2 ** 20) -> bool:
    """Whether the RESIDENT kernel's selector fits VMEM.

    ``E_raw`` is the edge table actually passed to the kernel — the wrapper
    never re-truncates it (edge compaction is the caller's policy, applied
    once in pose_deformation.compact_pairs; a second wrapper-level top-k
    could silently drop live edges and break XLA parity). The dominant VMEM
    resident is the single [E, Pp] bf16 difference selector (the
    endpoint-sum selector is derived per block as |Sd| on the VPU);
    everything else (the [8, E] edge-state scratches, per-block temporaries,
    [8, Pp] lane arrays) is ~2-3 MB. 10 MB leaves headroom for those under
    the 16 MB scoped limit (measured: P=768 = 7.1 MB selector compiles at
    ~10 MB total). Above the ceiling the STREAMING kernel (int8 selector in
    HBM, double-buffered DMA) takes over — same schedule, no size limit."""
    Pp = ((P + 127) // 128) * 128
    E = ((E_raw + 127) // 128) * 128
    return E * Pp * 2 <= budget_bytes


def pose_deformation_optimization_pallas(
        cam, Tcw0, rest, obs, point_valid, pairs, scale,
        rounds=(10, 10), cg_iters: int = 10, interpret: bool = False,
        stream: bool | None = None):
    """Drop-in core for pose_deformation.pose_deformation_optimization.

    The edge table is consumed AS GIVEN (padded to whole blocks, never
    re-truncated — compaction policy lives in compact_pairs upstream).
    ``stream=None`` picks resident vs HBM-streaming automatically by the
    VMEM fit. Returns (Tcw, flows [P, 3], chi2_r [P]) — the wrapper in
    pose_deformation.py applies the IQR/median post-gating.
    """
    from nrslam_tpu.geometry import se3 as se3_mod

    P = rest.shape[0]
    Pp = ((P + 127) // 128) * 128

    E_raw = pairs.i.shape[0]
    if stream is None:
        stream = not fits_vmem(P, E_raw)

    # Pad the edge table to a whole number of blocks (streaming: DMA block;
    # resident: in-VMEM read block bounding the per-block temporaries).
    budget = ((E_raw + 127) // 128) * 128
    be = min(STREAM_BLOCK if stream else 2 * STREAM_BLOCK, budget)
    E_pad = ((budget + be - 1) // be) * be
    n_blocks = E_pad // be

    pair_base_full = pairs.valid & point_valid[pairs.i] & point_valid[pairs.j]

    def _pad(x, fill):
        if E_raw < E_pad:
            pad = jnp.full((E_pad - E_raw,), fill, x.dtype)
            return jnp.concatenate([x, pad])
        return x

    pairs = pairs._replace(
        i=_pad(pairs.i, 0), j=_pad(pairs.j, 0),
        w=_pad(pairs.w, 0.0), d0=_pad(pairs.d0, 1.0),
        valid=_pad(pair_base_full, False))
    E = E_pad

    sigma_s = 0.1 * scale
    info_s = 1.0 / (sigma_s * sigma_s)

    def pack_p(rows):
        a = jnp.zeros((8, Pp), jnp.float32)
        for i, r in enumerate(rows):
            a = a.at[i, :P].set(r.astype(jnp.float32))
        return a

    def pack_e(rows):
        a = jnp.zeros((8, E), jnp.float32)
        for i, r in enumerate(rows):
            a = a.at[i, :].set(r.astype(jnp.float32))
        return a

    rest8 = pack_p([rest[:, 0], rest[:, 1], rest[:, 2]])
    # Benign padded lanes (z=0 or on-axis r=0 NaN-poisons robust sums).
    rest8 = rest8.at[0, P:].set(0.1)
    rest8 = rest8.at[1, P:].set(0.1)
    rest8 = rest8.at[2, P:].set(1.0)
    obs8 = pack_p([obs[:, 0], obs[:, 1]])
    pmask8 = pack_p([point_valid.astype(jnp.float32)])

    pair_base = pairs.valid & point_valid[pairs.i] & point_valid[pairs.j]
    pair8 = pack_e([pairs.w, jnp.maximum(pairs.d0, 1e-12),
                    pair_base.astype(jnp.float32)])

    # Difference selector; invalid/padded edges get all-zero rows so they
    # vanish from every product regardless of masks. The endpoint-sum
    # selector is |Sd| (derived in-kernel).
    keep = pair_base
    if interpret:
        sel_dtype = jnp.float32
    else:
        sel_dtype = jnp.int8 if stream else jnp.bfloat16
    Si = jax.nn.one_hot(jnp.where(keep, pairs.i, -1), Pp, dtype=jnp.float32)
    Sj = jax.nn.one_hot(jnp.where(keep, pairs.j, -1), Pp, dtype=jnp.float32)
    Sd = (Si - Sj).astype(sel_dtype)

    from nrslam_tpu.solver.pose_deformation import (SIGMA_POSITION,
                                                    SIGMA_REPROJECTION)
    params = jnp.zeros(18, jnp.float32)
    params = params.at[:cam.params.shape[0]].set(cam.params)
    params = params.at[8:12].set(Tcw0.q)
    params = params.at[12:15].set(Tcw0.t)
    params = params.at[15].set(1.0 / SIGMA_REPROJECTION ** 2)  # info_r
    params = params.at[16].set(info_s)
    params = params.at[17].set(1.0 / SIGMA_POSITION ** 2)      # info_p

    kernel = functools.partial(
        _joint_kernel, kind=cam.kind, rounds=tuple(rounds),
        cg_iters=cg_iters, max_k_params=4, sel_bf16=not interpret,
        stream=bool(stream), n_blocks=n_blocks, be=be)

    sd_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream
               else pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((8, E), jnp.float32),   # drest
               pltpu.VMEM((8, E), jnp.float32),   # es (accepted)
               pltpu.VMEM((8, E), jnp.float32),   # es (trial)
               pltpu.VMEM((8, E), jnp.float32)]   # releveled spatial mask
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
    out_pose, out_arr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8,), jnp.float32),
                   jax.ShapeDtypeStruct((8, Pp), jnp.float32)],
        interpret=interpret,
    )(params, rest8, obs8, pmask8, pair8, Sd)

    q = out_pose[:4]
    q = q / jnp.linalg.norm(q)
    Tcw = se3_mod.SE3(q, out_pose[4:7])
    flows = out_arr[0:3, :P].T
    chi2_r = out_arr[3, :P]
    return Tcw, flows, chi2_r
