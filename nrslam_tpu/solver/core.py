"""Core nonlinear least-squares machinery: Huber IRLS + Levenberg-Marquardt.

JAX-native replacement for g2o's OptimizationAlgorithmLevenberg +
RobustKernelHuber (used by every driver in
/root/reference/modules/optimization/g2o_optimization.cc). The drivers build
batched edge arrays and per-edge analytic Jacobian blocks; this module
provides the shared scalar pieces and a matrix-free preconditioned CG for the
large coupled systems (pose+deformation, bundle adjustment) where g2o used
sparse Cholesky.

LM schedule follows g2o's Levenberg implementation: lambda0 = tau * max
diag(H) with tau = 1e-5, gain-ratio-based lambda update
``lambda *= max(1/3, 1 - (2*rho - 1)^3)`` on success, ``lambda *= nu; nu *= 2``
on failure.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

LM_TAU = 1e-5


def huber_weight(chi2: jnp.ndarray, delta2: float | jnp.ndarray) -> jnp.ndarray:
    """IRLS weight rho'(e2) of the Huber kernel with squared threshold delta2.

    Matches g2o::RobustKernelHuber::robustify: 1 inside the inlier region,
    delta/sqrt(e2) outside.
    """
    safe = jnp.maximum(chi2, 1e-20)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def huber_rho(chi2: jnp.ndarray, delta2: float | jnp.ndarray) -> jnp.ndarray:
    """Robustified chi2 contribution rho(e2)."""
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2,
                     chi2, 2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-20)) - delta2)


def lm_lambda_init(h_diag: jnp.ndarray) -> jnp.ndarray:
    return LM_TAU * jnp.max(h_diag)


def lm_lambda_update(lam, nu, rho_gain):
    """(new_lambda, new_nu, accepted) from the gain ratio."""
    accepted = rho_gain > 0
    shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho_gain - 1.0) ** 3)
    new_lam = jnp.where(accepted, lam * shrink, lam * nu)
    new_nu = jnp.where(accepted, 2.0, nu * 2.0)
    return new_lam, new_nu, accepted


def pcg(hvp: Callable[[jnp.ndarray], jnp.ndarray], b: jnp.ndarray,
        m_inv, iters: int, tol: float = 1e-8) -> jnp.ndarray:
    """Preconditioned conjugate gradient for H x = b.

    ``hvp`` must include any LM damping. ``m_inv`` is either a diagonal
    array or a callable applying a (block-)preconditioner. Fixed iteration
    count with an early-exit mask (static control flow for XLA). Replaces
    g2o's LinearSolverEigen/Dense for the coupled systems — on TPU the
    Hessian-vector products are batched einsums, which map far better to the
    hardware than sparse factorization.
    """
    if not callable(m_inv):
        m_inv_arr = m_inv
        m_inv = lambda r: m_inv_arr * r
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = m_inv(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    b2 = jnp.vdot(b, b)

    def body(_, state):
        x, r, p, rz, done = state
        hp = hvp(p)
        denom = jnp.vdot(p, hp)
        alpha = jnp.where(jnp.abs(denom) > 0, rz / denom, 0.0)
        alpha = jnp.where(done, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * hp
        z = m_inv(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
        p = z + beta * p
        done = done | (jnp.vdot(r, r) <= tol * tol * b2)
        return x, r, p, jnp.where(done, rz, rz_new), done

    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0, jnp.array(False)))
    return x


def solve_dense(H: jnp.ndarray, g: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Solve (H + lam*I) dx = -g for small dense systems (pose-only driver)."""
    n = H.shape[-1]
    Hd = H + lam * jnp.eye(n, dtype=H.dtype)
    return -jnp.linalg.solve(Hd, g)
