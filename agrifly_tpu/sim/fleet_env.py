"""Config #5 core: multi-drone fleet with wind disturbance.

The reference structures multi-vehicle support as vectors of SimVehicle
(SyncSimulator/main.cpp:122,374-376) and exposes wind through
SetExternalForce (Quadcopter_T.hpp:45-51) without ever modeling the wind
itself. Here the fleet is the vmapped env axis and the wind is an
Ornstein-Uhlenbeck gust process per vehicle on top of a mean field; the
force applied is aerodynamic-style, proportional to the relative wind:

    w' = w + dt/tau (mean - w) + sqrt(2 dt / tau) sigma N(0,1)
    F  = gain * (w - v_vehicle)

The env axis shards over a device mesh exactly like parallel/sharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from agrifly_tpu.sim import env as env_mod


class WindParams(NamedTuple):
    mean: jnp.ndarray  # (3,) mean wind velocity [m/s]
    gust_std: jnp.ndarray  # [m/s]
    gust_tau: jnp.ndarray  # [s]
    force_gain: jnp.ndarray  # [N/(m/s)] force per unit relative wind


def make_wind(mean=(2.0, 0.5, 0.0), gust_std=1.0, gust_tau=2.0,
              force_gain=0.02) -> WindParams:
    f32 = jnp.float32
    return WindParams(
        mean=jnp.asarray(mean, jnp.float32), gust_std=f32(gust_std),
        gust_tau=f32(gust_tau), force_gain=f32(force_gain),
    )


class FleetParams(NamedTuple):
    base: env_mod.EnvParams
    wind: WindParams


class FleetState(NamedTuple):
    envs: env_mod.EnvState  # leading axis = vehicle
    wind_vel: jnp.ndarray  # (N, 3)
    key: jnp.ndarray


def init_fleet(params: FleetParams, n, base_seed=0, spacing=2.0) -> FleetState:
    """N vehicles on a line, 'spacing' apart."""
    keys = jax.random.split(jax.random.PRNGKey(base_seed), n + 1)
    xs = jnp.arange(n, dtype=jnp.float32) * spacing

    def one(i, k):
        return env_mod.init_state(
            params.base, k, pos=jnp.stack([jnp.float32(0.0), xs[i], jnp.float32(0.0)])
        )

    envs = jax.vmap(one)(jnp.arange(n), keys[:n])
    return FleetState(
        envs=envs,
        wind_vel=jnp.broadcast_to(params.wind.mean, (n, 3)),
        key=keys[n],
    )


def fleet_step(params: FleetParams, s: FleetState, des_pos,
               use_estimator: bool = True):
    """One 2 ms tick of the whole fleet. des_pos: (N, 3) per-vehicle
    setpoints. Returns (state, outputs) with leading vehicle axis."""
    n = s.wind_vel.shape[0]
    dt = params.base.dt_us.astype(jnp.float32) * 1e-6
    w = params.wind

    key, sub = jax.random.split(s.key)
    noise = jax.random.normal(sub, (n, 3), jnp.float32)
    wind_vel = (
        s.wind_vel
        + dt / w.gust_tau * (w.mean - s.wind_vel)
        + jnp.sqrt(2.0 * dt / w.gust_tau) * w.gust_std * noise
    )
    ext_force = w.force_gain * (wind_vel - s.envs.plant.vel)

    z3 = jnp.zeros((n, 3), jnp.float32)
    cmds = env_mod.Command(
        des_pos=jnp.asarray(des_pos, jnp.float32), des_vel=z3, des_acc=z3,
        des_yaw=jnp.zeros(n, jnp.float32), ext_force=ext_force, ext_torque=z3,
    )
    envs, outs = jax.vmap(
        lambda st, c: env_mod.step(params.base, st, c, use_estimator)
    )(s.envs, cmds)
    return FleetState(envs=envs, wind_vel=wind_vel, key=key), outs


def fleet_rollout(params: FleetParams, s: FleetState, des_pos, n_steps: int,
                  use_estimator: bool = True):
    def body(carry, _):
        new, outs = fleet_step(params, carry, des_pos, use_estimator)
        return new, None

    return jax.lax.scan(body, s, None, length=n_steps)
