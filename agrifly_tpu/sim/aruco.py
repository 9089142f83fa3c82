"""Aruco-style camera pose sensor: rate-limited pose measurements.

Port of Components/Components/Simulation/ArucoCamera.{hpp,cpp}: a trivial
sensor that re-emits a stored marker pose every `fake_run_time` seconds —
a stand-in for a camera-marker pose pipeline. Kept as a pytree so it
composes into the fused step like the other sensors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ArucoParams(NamedTuple):
    period_us: jnp.ndarray  # int32 measurement period ("fakeRunTime")
    noise_std_pos: jnp.ndarray  # [m]


class ArucoState(NamedTuple):
    acc_us: jnp.ndarray  # int32
    meas_pos: jnp.ndarray  # (3,) latest measurement
    meas_att: jnp.ndarray  # (4,)
    has_new: jnp.ndarray  # bool


def make_params(period=0.1, noise_std_pos=0.0) -> ArucoParams:
    return ArucoParams(
        period_us=jnp.int32(round(period * 1e6)),
        noise_std_pos=jnp.float32(noise_std_pos),
    )


def init_state() -> ArucoState:
    return ArucoState(
        acc_us=jnp.int32(0),
        meas_pos=jnp.zeros(3, jnp.float32),
        meas_att=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        has_new=jnp.bool_(False),
    )


def step(p: ArucoParams, s: ArucoState, true_pos, true_att, dt_us, key=None):
    """Advance; emits the pose every period (with optional position noise)."""
    import jax

    acc = s.acc_us + dt_us
    fire = acc > p.period_us
    acc = jnp.where(fire, acc - p.period_us, acc)
    pos = jnp.asarray(true_pos, jnp.float32)
    if key is not None:
        pos = pos + jax.random.normal(key, (3,), jnp.float32) * p.noise_std_pos
    return ArucoState(
        acc_us=acc,
        meas_pos=jnp.where(fire, pos, s.meas_pos),
        meas_att=jnp.where(fire, jnp.asarray(true_att, jnp.float32), s.meas_att),
        has_new=fire,
    )
