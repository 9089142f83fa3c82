"""Quintic 3-D polynomial trajectories as coefficient arrays.

The reference represents a trajectory as 6 Vec3d coefficients
c[0] t^5 + ... + c[5] on [t0, t1] (Common/Common/Math/Trajectory.hpp:33-171).
Here a trajectory is simply an array of shape (..., 6, 3) plus (t0, t1)
scalars carried alongside; evaluation is Horner's rule so thousands of
candidates evaluate in one fused elementwise pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def polyval(coeffs, t):
    """Evaluate sum_k coeffs[..., k, :] * t^(K-1-k) with Horner.

    coeffs: (..., K, 3); t: scalar or (...,) broadcastable. Returns (..., 3).
    """
    t = jnp.asarray(t)[..., None]
    K = coeffs.shape[-2]
    out = coeffs[..., 0, :]
    for k in range(1, K):
        out = out * t + coeffs[..., k, :]
    return out


def deriv_coeffs(coeffs):
    """Coefficients of d/dt of the polynomial (Trajectory.hpp:137-144)."""
    K = coeffs.shape[-2]
    powers = jnp.arange(K - 1, 0, -1, dtype=coeffs.dtype)  # [K-1, ..., 1]
    return coeffs[..., :-1, :] * powers[:, None]


def position(coeffs, t):
    return polyval(coeffs, t)


def velocity(coeffs, t):
    return polyval(deriv_coeffs(coeffs), t)


def acceleration(coeffs, t):
    return polyval(deriv_coeffs(deriv_coeffs(coeffs)), t)


def jerk(coeffs, t):
    return polyval(deriv_coeffs(deriv_coeffs(deriv_coeffs(coeffs))), t)


def axis_polyval(axis_coeffs, t):
    """Scalar Horner over (..., K) coefficient arrays."""
    K = axis_coeffs.shape[-1]
    out = axis_coeffs[..., 0]
    for k in range(1, K):
        out = out * t + axis_coeffs[..., k]
    return out
