"""Masked robust statistics used across the pipeline.

Device-friendly replacements for the reference's statistics toolbox
(/root/reference/modules/utilities/statistics_toolbox.cc) and the quartile
logic embedded in its optimizers and evaluator. Every function takes an
explicit validity mask so fixed-capacity arrays can be used under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# Chi-squared 95% critical values, 1..10 dof
# (statistics_toolbox.cc:52-90 hardcodes the same table).
CHI2_95 = jnp.array(
    [3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507, 16.919, 18.307],
    jnp.float32,
)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def masked_sigma(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    mu = masked_mean(x, mask, axis=axis)
    if axis is not None:
        mu = jnp.expand_dims(mu, axis)
    var = masked_mean((x - mu) ** 2, mask, axis=axis)
    return jnp.sqrt(var)


def masked_quantile_sorted(x: jnp.ndarray, mask: jnp.ndarray, frac: float) -> jnp.ndarray:
    """Value at index floor(frac * n_valid) of the sorted valid entries.

    Matches the reference's quartile convention
    (e.g. g2o_optimization.cc:393-399 `sorted[(int)(size * 0.75)]`): an
    index lookup rather than an interpolated quantile. Invalid entries are
    pushed to +inf before sorting so the first n_valid slots hold the data.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n_valid = jnp.sum(mask.astype(jnp.int32), axis=-1)
    idx = jnp.clip((n_valid.astype(jnp.float32) * frac).astype(jnp.int32), 0,
                   jnp.maximum(n_valid - 1, 0))
    return jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """nth_element(n/2) median (reference convention: index n//2 of sorted)."""
    return masked_quantile_sorted(x, mask, 0.5)


def iqr_upper_threshold(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """q3 + 1.5*IQR outlier threshold over the valid entries.

    Mirrors the IQR demotion used on deformation magnitudes
    (g2o_optimization.cc:393-404) and the evaluator's outlier trim
    (frame_evaluator.cc:148-160).
    """
    q1 = masked_quantile_sorted(x, mask, 0.25)
    q3 = masked_quantile_sorted(x, mask, 0.75)
    return q3 + 1.5 * (q3 - q1)
