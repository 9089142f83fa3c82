"""Offboard safety rules (Components/Offboard/SafetyNet.hpp:30-141).

Pure-jnp checks over an estimated state: geofence box, vehicle-not-seen
timeout (0.5 s), upside-down-while-low, and a user-set unsafe latch.
Default corners are the reference's lab volume; the RAPPIDS node widens
them to +-100 m (ExampleVehicleStateMachine.cpp:426).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from agrifly_tpu.ops import rotation as rot

VEHICLE_NOT_SEEN_TIMEOUT_US = 500_000


class SafetyNetParams(NamedTuple):
    min_corner: jnp.ndarray  # (3,)
    max_corner: jnp.ndarray  # (3,)
    min_normal_height: jnp.ndarray  # scalar


def lab_params() -> SafetyNetParams:
    return SafetyNetParams(
        min_corner=jnp.array([-2.4, -3.1, -0.5], jnp.float32),
        max_corner=jnp.array([+1.8, +3.1, 4.5], jnp.float32),
        min_normal_height=jnp.float32(1.0),
    )


def wide_params(half_extent=100.0) -> SafetyNetParams:
    return SafetyNetParams(
        min_corner=jnp.array([-half_extent, -half_extent, -half_extent], jnp.float32),
        max_corner=jnp.array([half_extent, half_extent, half_extent], jnp.float32),
        min_normal_height=jnp.float32(1.0),
    )


class SafetyState(NamedTuple):
    vehicle_not_seen: jnp.ndarray
    unsafe_position: jnp.ndarray
    upside_down_and_low: jnp.ndarray
    user_unsafe: jnp.ndarray

    @property
    def is_safe(self):
        return ~(
            self.vehicle_not_seen | self.unsafe_position
            | self.upside_down_and_low | self.user_unsafe
        )


def init_state() -> SafetyState:
    return SafetyState(
        vehicle_not_seen=jnp.bool_(True),
        unsafe_position=jnp.bool_(False),
        upside_down_and_low=jnp.bool_(False),
        user_unsafe=jnp.bool_(False),
    )


def update(p: SafetyNetParams, s: SafetyState, est_pos, est_att,
           us_since_good_meas) -> SafetyState:
    not_seen = us_since_good_meas > VEHICLE_NOT_SEEN_TIMEOUT_US
    out_of_box = jnp.any(est_pos < p.min_corner) | jnp.any(est_pos > p.max_corner)
    up_z = rot.rotate(est_att, jnp.array([0.0, 0.0, 1.0], jnp.float32))[2]
    upside_low = (est_pos[2] < p.min_normal_height) & (up_z < 0)
    return SafetyState(
        vehicle_not_seen=not_seen,
        unsafe_position=out_of_box,
        upside_down_and_low=upside_low,
        user_unsafe=s.user_unsafe,
    )
