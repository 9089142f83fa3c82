"""Built-in test trajectory library for controller validation.

Port of the QuadMocapRatesControl node's command-trajectory menu
(AIFS_ROS/hiperlab_rostools/src/QuadMocapRatesControl/
ExampleVehicleStateMachine.cpp:206-296): fixed point, circle, SHM,
fixed-height circle, circle with sinusoidal height + yaw, and yaw spin —
each returning (pos, vel, acc, yaw) as functions of stage time, with the
2 s get-into-action blend.

Bug-compatible detail: trajectory 4's z velocity/acceleration keep the
reference's missing 4x chain-rule factor on the 4-omega height sinusoid.
"""

from __future__ import annotations

import jax.numpy as jnp

TRAJ_FIXED_POINT = 0
TRAJ_CIRCLE = 1
TRAJ_SHM = 2
TRAJ_CIRCLE_LINE = 3
TRAJ_CIRCLE_SIN_HEIGHT_YAW = 4
TRAJ_YAW_SPIN = 5

GET_INTO_ACTION_TIME = 2.0  # [s]


def evaluate(traj_id: int, t, desired_position, desired_yaw=0.0):
    """Command state for test trajectory `traj_id` (static int) at time t.

    Returns (cmd_pos (3,), cmd_vel (3,), cmd_acc (3,), cmd_yaw) after the
    get-into-action blend from the hover setpoint.
    """
    t = jnp.asarray(t, jnp.float32)
    des = jnp.asarray(desired_position, jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    if traj_id == TRAJ_FIXED_POINT:
        pos, vel, acc, yaw = des, z3, z3, jnp.float32(0.0)

    elif traj_id == TRAJ_CIRCLE:
        center = jnp.stack([jnp.float32(0.0), jnp.float32(-2.0), des[2]])
        r, w = 1.0, 0.5
        pos = center + r * jnp.stack([jnp.cos(w * t), jnp.sin(w * t), jnp.float32(0.0)])
        vel = r * w * jnp.stack([-jnp.sin(w * t), jnp.cos(w * t), jnp.float32(0.0)])
        acc = r * w * w * jnp.stack([-jnp.cos(w * t), -jnp.sin(w * t), jnp.float32(0.0)])
        yaw = jnp.asarray(desired_yaw, jnp.float32) + w * t

    elif traj_id == TRAJ_SHM:
        a, w = 1.0, 2.0
        pos = des + a * jnp.stack([jnp.float32(0.0), jnp.sin(w * t), jnp.float32(0.0)])
        vel = a * w * jnp.stack([jnp.float32(0.0), jnp.cos(w * t), jnp.float32(0.0)])
        acc = a * w * w * jnp.stack([jnp.float32(0.0), -jnp.sin(w * t), jnp.float32(0.0)])
        yaw = jnp.asarray(desired_yaw, jnp.float32)

    elif traj_id == TRAJ_CIRCLE_LINE:
        center = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), des[2]])
        r, w = 0.5, 1.0
        pos = center + r * jnp.stack([jnp.cos(w * t), jnp.sin(w * t), jnp.float32(0.0)])
        vel = r * w * jnp.stack([-jnp.sin(w * t), jnp.cos(w * t), jnp.float32(0.0)])
        acc = r * w * w * jnp.stack([-jnp.cos(w * t), -jnp.sin(w * t), jnp.float32(0.0)])
        yaw = jnp.float32(0.0)

    elif traj_id == TRAJ_CIRCLE_SIN_HEIGHT_YAW:
        center = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), des[2]])
        r, w = 0.5, 0.5
        pos = center + r * jnp.stack([jnp.cos(w * t), jnp.sin(w * t), jnp.cos(w * t * 4)])
        # NB: reference omits the 4x chain-rule factor on z (kept)
        vel = r * w * jnp.stack([-jnp.sin(w * t), jnp.cos(w * t), -jnp.sin(w * t * 4)])
        acc = r * w * w * jnp.stack([-jnp.cos(w * t), -jnp.sin(w * t), -jnp.cos(w * t * 4)])
        yaw = w * t

    elif traj_id == TRAJ_YAW_SPIN:
        pos, vel, acc = des, z3, z3
        yaw = 0.2 * t

    else:
        raise ValueError(f"unknown trajectory id {traj_id}")

    frac = jnp.clip(t / GET_INTO_ACTION_TIME, 0.0, 1.0)
    cmd_pos = (1.0 - frac) * des + frac * pos
    cmd_vel = frac * vel
    cmd_acc = frac * acc
    return cmd_pos, cmd_vel, cmd_acc, yaw
