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


# =============================================================================
# Fleet with a shared UWB ranging network (vehicle-to-vehicle + anchors)
# =============================================================================
#
# The reference's UWBNetwork round-robins ONE ranging transaction per period
# over all radios (UWBNetwork.cpp:31-90) — vehicles and anchors share the
# channel, and every radio hears every measurement. Here the network is a
# single shared state stepped between the fleet's plant integration
# (phase A) and the onboard logic ticks, exactly matching the reference's
# update ordering. Deviation (documented): the reference latches the *first*
# radio that wants to range, which starves all vehicles but the first when
# several fly at once; we rotate the latch start index for fairness.

from agrifly_tpu.models import logic as onboard_mod
from agrifly_tpu.sim import uwb as uwb_mod


class UwbFleetParams(NamedTuple):
    base: env_mod.EnvParams  # logic carries the anchor target DB
    wind: WindParams
    uwb: uwb_mod.UwbParams  # radio table: vehicles first, then anchors
    vehicle_ids: jnp.ndarray  # (N,) int32
    anchor_positions: jnp.ndarray  # (A, 3)


class UwbFleetState(NamedTuple):
    envs: env_mod.EnvState  # leading axis = vehicle (uwb=None inside)
    wind_vel: jnp.ndarray  # (N, 3)
    uwb: uwb_mod.UwbState  # shared network
    latch_start: jnp.ndarray  # int32 fairness rotation
    key: jnp.ndarray


def make_uwb_fleet_params(n_vehicles, anchor_ids, anchor_positions,
                          wind=None, comm_period=0.01, noise_std=0.05,
                          **env_kw) -> UwbFleetParams:
    import numpy as np

    base = env_mod.make_params(**env_kw)
    base = base._replace(
        logic=onboard_mod.with_ranging_targets(base.logic, anchor_ids, anchor_positions)
    )
    vehicle_ids = list(range(1, n_vehicles + 1))
    uwb_p = uwb_mod.make_params(
        vehicle_ids + list(anchor_ids), comm_period=comm_period,
        noise_std=noise_std,
    )
    return UwbFleetParams(
        base=base,
        wind=wind if wind is not None else make_wind((0.0, 0.0, 0.0), 0.0, 2.0, 0.0),
        uwb=uwb_p,
        vehicle_ids=jnp.asarray(vehicle_ids, jnp.int32),
        anchor_positions=jnp.asarray(np.asarray(anchor_positions, np.float32)),
    )


def init_uwb_fleet(params: UwbFleetParams, base_seed=0, spacing=2.0) -> UwbFleetState:
    n = params.vehicle_ids.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(base_seed), n + 2)
    xs = jnp.arange(n, dtype=jnp.float32) * spacing

    def one(i, k):
        return env_mod.init_state(
            params.base, k, pos=jnp.stack([jnp.float32(0.0), xs[i], jnp.float32(0.0)])
        )

    envs = jax.vmap(one)(jnp.arange(n), keys[:n])
    return UwbFleetState(
        envs=envs,
        wind_vel=jnp.broadcast_to(params.wind.mean, (n, 3)),
        uwb=uwb_mod.init_state(keys[n]),
        latch_start=jnp.int32(0),
        key=keys[n + 1],
    )


def uwb_fleet_step(params: UwbFleetParams, s: UwbFleetState, des_pos,
                   ctrl_mode: str = "position"):
    """One 2 ms tick: plants move, ONE shared ranging transaction advances,
    every onboard logic hears the broadcast, offboard sends per-vehicle
    position commands (onboard-UWB autonomy)."""
    n = s.wind_vel.shape[0]
    p = params.base
    dt = p.dt_us.astype(jnp.float32) * 1e-6
    w = params.wind

    key, sub = jax.random.split(s.key)
    noise = jax.random.normal(sub, (n, 3), jnp.float32)
    wind_vel = (
        s.wind_vel + dt / w.gust_tau * (w.mean - s.wind_vel)
        + jnp.sqrt(2.0 * dt / w.gust_tau) * w.gust_std * noise
    )
    ext_force = w.force_gain * (wind_vel - s.envs.plant.vel)

    # phase A: all plants integrate
    phase_a = jax.vmap(
        lambda st, f: env_mod.physics_phase_a(st, p, f, jnp.zeros(3, jnp.float32))
    )(s.envs, ext_force)

    # shared network over [vehicles..., anchors...]
    positions = jnp.concatenate([phase_a["plant"].pos, params.anchor_positions], axis=0)
    has_targets = p.logic.num_targets > 0
    veh_targets = jnp.where(
        has_targets,
        p.logic.target_ids[s.envs.logic.next_target_idx],
        jnp.zeros(n, jnp.int32),
    )
    n_radios = params.uwb.radio_ids.shape[0]
    next_ids = jnp.zeros(n_radios, jnp.int32).at[:n].set(veh_targets)
    # fairness rotation (see module comment): rotate whose request is seen
    # first by rolling the radio table by latch_start
    roll = s.latch_start % jnp.int32(n)
    next_ids_rot = jnp.roll(next_ids[:n], -roll, axis=0)
    ids_rot = jnp.roll(params.uwb.radio_ids[:n], -roll, axis=0)
    uwb_params_rot = params.uwb._replace(
        radio_ids=jnp.concatenate([ids_rot, params.uwb.radio_ids[n:]])
    )
    positions_rot = jnp.concatenate(
        [jnp.roll(positions[:n], -roll, axis=0), positions[n:]], axis=0
    )
    next_all = jnp.concatenate([next_ids_rot, next_ids[n:]])
    new_uwb, meas = uwb_mod.step(uwb_params_rot, s.uwb, positions_rot, next_all, p.dt_us)
    latch_start = jnp.where(meas.valid, s.latch_start + 1, s.latch_start)

    # deliver to the REQUESTER only. (The reference broadcasts to every
    # radio — harmless with one vehicle, but a second vehicle would fuse
    # ranges it never initiated and diverge; two-way ranging physically
    # yields the range only at the requester, so we deliver there.)
    mine = params.vehicle_ids == meas.requester_id
    uwb_override = (
        mine & meas.valid,
        jnp.broadcast_to(meas.range, (n,)),
        jnp.broadcast_to(meas.responder_id, (n,)),
        jnp.broadcast_to(meas.failure, (n,)),
    )

    half = jax.vmap(
        lambda st, a, ov: env_mod.physics_tick(
            st, p, jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            use_estimator=False, uwb_override=ov, phase_a=a,
        )
    )(s.envs, phase_a, uwb_override)

    z3 = jnp.zeros((n, 3), jnp.float32)
    cmds = env_mod.Command(
        des_pos=jnp.asarray(des_pos, jnp.float32), des_vel=z3, des_acc=z3,
        des_yaw=jnp.zeros(n, jnp.float32), ext_force=ext_force, ext_torque=z3,
    )
    envs, outs = jax.vmap(
        lambda st, c, h: env_mod._offboard_and_finish(p, st, c, h, False, ctrl_mode)
    )(s.envs, cmds, half)

    return UwbFleetState(
        envs=envs, wind_vel=wind_vel, uwb=new_uwb, latch_start=latch_start, key=key,
    ), outs


def uwb_fleet_rollout(params: UwbFleetParams, s: UwbFleetState, des_pos,
                      n_steps: int, ctrl_mode: str = "position"):
    def body(carry, _):
        new, _ = uwb_fleet_step(params, carry, des_pos, ctrl_mode)
        return new, None

    return jax.lax.scan(body, s, None, length=n_steps)
