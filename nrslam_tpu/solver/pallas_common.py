"""Shared scalar-core math for the whole-solver Pallas TPU kernels.

Scalar SE(3)/quaternion algebra (tuples of jnp scalars — runs on the TPU
scalar unit), small dense solves (3x3 adjugate, 6x6 block Schur), and the
per-point camera projection/Jacobian math on [1, P] lane vectors. These
mirror geometry/se3.py, geometry/cameras.py and solver/core.py exactly so
kernel results match the XLA drivers to float tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Scalar quaternion / SE(3)
# ---------------------------------------------------------------------------

def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def quat_normalize(q):
    w, x, y, z = q
    inv = 1.0 / jnp.sqrt(w * w + x * x + y * y + z * z)
    return (w * inv, x * inv, y * inv, z * inv)


def quat_rotate(q, v):
    """v + 2*w*(u x v) + 2*(u x (u x v)) — scalar or lane-vector v."""
    w, ux, uy, uz = q
    vx, vy, vz = v
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return (vx + 2.0 * (w * cx + dx),
            vy + 2.0 * (w * cy + dy),
            vz + 2.0 * (w * cz + dz))


def quat_to_matrix(q):
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def se3_exp(omega, v):
    """Scalar SE(3) exp: returns (q tuple, t tuple). Mirrors se3.exp."""
    w0, w1, w2 = omega
    v0, v1, v2 = v
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    small = theta2 < 1e-12
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe_t2)
    theta = jnp.where(small, 0.0, safe_t)

    half = 0.5 * safe_t
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / safe_t)
    qw = jnp.cos(0.5 * theta)
    q = (qw, w0 * sinc_half, w1 * sinc_half, w2 * sinc_half)

    A = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(safe_t)) / safe_t2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (safe_t - jnp.sin(safe_t)) / (safe_t2 * safe_t))
    cx = w1 * v2 - w2 * v1
    cy = w2 * v0 - w0 * v2
    cz = w0 * v1 - w1 * v0
    dx = w1 * cz - w2 * cy
    dy = w2 * cx - w0 * cz
    dz = w0 * cy - w1 * cx
    t = (v0 + A * cx + B * dx, v1 + A * cy + B * dy, v2 + A * cz + B * dz)
    return quat_normalize(q), t


def se3_retract(q, t, dx):
    """exp(dx) * T for twist dx = (omega..., v...) — g2o left-mult update."""
    qe, te = se3_exp(dx[:3], dx[3:])
    q_new = quat_normalize(quat_mul(qe, q))
    rt = quat_rotate(qe, t)
    return q_new, (rt[0] + te[0], rt[1] + te[1], rt[2] + te[2])


# ---------------------------------------------------------------------------
# Small dense solves (scalar tuples)
# ---------------------------------------------------------------------------

def inv3(m):
    """Adjugate inverse of a 3x3 (tuple rows of scalars or lane vectors)."""
    (a, b, c), (d, e, f), (g, h, i) = m
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    s = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
    return ((A11 * s, A12 * s, A13 * s),
            (A21 * s, A22 * s, A23 * s),
            (A31 * s, A32 * s, A33 * s))


def mat3_mul(a, b):
    return tuple(tuple(sum(a[i][k] * b[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def mat3_vec(a, v):
    return tuple(sum(a[i][k] * v[k] for k in range(3)) for i in range(3))


def mat3_T(a):
    return tuple(tuple(a[j][i] for j in range(3)) for i in range(3))


def mat3_sub(a, b):
    return tuple(tuple(a[i][j] - b[i][j] for j in range(3)) for i in range(3))


def solve6(H, g, lam):
    """Solve (H + lam I) y = g via the 3x3-block Schur complement
    (mirrors core.solve_spd6). H: 6x6 tuple-of-tuples."""
    A = tuple(tuple(H[i][j] + (lam if i == j else 0.0) for j in range(3))
              for i in range(3))
    B = tuple(tuple(H[i][j + 3] for j in range(3)) for i in range(3))
    C = tuple(tuple(H[i + 3][j + 3] + (lam if i == j else 0.0)
                    for j in range(3)) for i in range(3))
    g1, g2 = g[:3], g[3:]
    Ainv = inv3(A)
    AinvB = mat3_mul(Ainv, B)
    S = mat3_sub(C, mat3_mul(mat3_T(B), AinvB))
    Sinv = inv3(S)
    Ainv_g1 = mat3_vec(Ainv, g1)
    Bt_Ag1 = mat3_vec(mat3_T(B), Ainv_g1)
    rhs2 = tuple(g2[i] - Bt_Ag1[i] for i in range(3))
    y2 = mat3_vec(Sinv, rhs2)
    y1_corr = mat3_vec(AinvB, y2)
    y1 = tuple(Ainv_g1[i] - y1_corr[i] for i in range(3))
    return y1 + y2


def inv6(H, lam):
    """Full inverse of (H + lam I) via the 3x3 block Schur complement
    (mirrors core.inv_spd6). Returns a 6x6 tuple-of-tuples."""
    A = tuple(tuple(H[i][j] + (lam if i == j else 0.0) for j in range(3))
              for i in range(3))
    B = tuple(tuple(H[i][j + 3] for j in range(3)) for i in range(3))
    C = tuple(tuple(H[i + 3][j + 3] + (lam if i == j else 0.0)
                    for j in range(3)) for i in range(3))
    Ainv = inv3(A)
    AinvB = mat3_mul(Ainv, B)
    S = mat3_sub(C, mat3_mul(mat3_T(B), AinvB))
    Sinv = inv3(S)
    TL_corr = mat3_mul(mat3_mul(AinvB, Sinv), mat3_T(AinvB))
    TL = tuple(tuple(Ainv[i][j] + TL_corr[i][j] for j in range(3))
               for i in range(3))
    TR = tuple(tuple(-sum(AinvB[i][k] * Sinv[k][j] for k in range(3))
                     for j in range(3)) for i in range(3))
    BL = mat3_T(TR)
    return tuple(
        tuple((TL[i][j] if j < 3 else TR[i][j - 3]) if i < 3
              else (BL[i - 3][j] if j < 3 else Sinv[i - 3][j - 3])
              for j in range(6))
        for i in range(6))


# ---------------------------------------------------------------------------
# Camera projection on lane vectors
# ---------------------------------------------------------------------------

def project_with_jacobian(kind, fx, fy, cx, cy, k_par, Xc0, Xc1, Xc2):
    """Pixel projection + 2x3 Jacobian rows for camera-frame lane vectors.

    Returns (pu, pv, (p00, p01, p02), (p10, p11, p12)) matching
    cameras.project / cameras.projection_jacobian.
    """
    if kind == "pinhole":
        invz = 1.0 / Xc2
        pu = fx * Xc0 * invz + cx
        pv = fy * Xc1 * invz + cy
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
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t4 * t4
        f = theta * (1 + k0 * t2 + k1 * t4 + k2 * t6 + k3 * t8)
        fd = 1 + 3 * k0 * t2 + 5 * k1 * t4 + 7 * k2 * t6 + 9 * k3 * t8
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
    return pu, pv, (p00, p01, p02), (p10, p11, p12)
