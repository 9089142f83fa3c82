"""Closed-form small-matrix linear algebra.

jnp.linalg.det/inv on 3x3 matrices lower to LU factorizations with
data-dependent pivoting; under vmap over thousands of envs that path is
dramatically slower on TPU than the cofactor closed form (pure elementwise
VPU math, fuses into the surrounding kernel). The estimators' 3x3 innovation
covariances use these instead (Offboard/GPSIMUStateEstimator.cpp:230-244
uses Eigen's closed-form .inverse() for fixed 3x3 too).
"""

from __future__ import annotations

import jax.numpy as jnp


def mv3(m, v):
    """Matrix-vector product (..., N, M) @ (..., M) as a broadcast-sum.

    Tiny dot_generals lower to padded bf16 MXU passes on TPU (silent value
    truncation) and fail to lower inside Pallas kernels; the broadcast-sum
    form stays full-f32 on the VPU and fuses. Used for every 3x3/4x3 matvec
    on the hot tick path."""
    return (m * v[..., None, :]).sum(-1)


def mv3t(m, v):
    """Transposed matvec (..., M, N)^T applied to v: m.T @ v."""
    return (m * v[..., :, None]).sum(-2)


def det3(m):
    """Determinant of (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3(m, det=None):
    """Cofactor inverse of (..., 3, 3). Caller guarantees invertibility
    (the estimators pre-substitute identity for singular S)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    if det is None:
        det = det3(m)
    inv_det = 1.0 / det
    cof = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof * inv_det[..., None, None]
