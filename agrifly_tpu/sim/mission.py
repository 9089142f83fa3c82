"""Mission flight-stage state machine (host-level autonomy).

jnp rewrite of the RAPPIDS ROS node's ExampleVehicleStateMachine
(AIFS_ROS/hiperlab_rostools/src/QuadRappidsPlannerAndController/
ExampleVehicleStateMachine.cpp:469-809): WaitForStart -> SpoolUp (0.5 s at
25% hover thrust) -> Takeoff (2 s position blend) -> Hover (3 s) -> Flight
(RAPPIDS tracking + waypoint switching at 1 m) -> Landing (0.5 m/s descent
with 2 s blend) -> Complete (idle); SafetyNet violations jump to Emergency
(kill). Waypoints are a fixed (K, 3) array standing in for trajectory.txt
(cpp:450-465, 702-730).

Each call produces the radio command for one offboard tick; the stage,
timers and waypoint index live in the MissionState pytree so the machine
runs inside the fused jit (vmappable over a fleet).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from agrifly_tpu.io import radio
from agrifly_tpu.offboard import controller as offboard_ctrl
from agrifly_tpu.ops import rotation as rot

STAGE_WAIT_FOR_START = 0
STAGE_SPOOL_UP = 1
STAGE_TAKEOFF = 2
STAGE_HOVER = 3
STAGE_FLIGHT = 4
STAGE_LANDING = 5
STAGE_COMPLETE = 6
STAGE_EMERGENCY = 7

STAGE_NAMES = {
    STAGE_WAIT_FOR_START: "WaitForStart",
    STAGE_SPOOL_UP: "SpoolUp",
    STAGE_TAKEOFF: "Takeoff",
    STAGE_HOVER: "Hover",
    STAGE_FLIGHT: "Flight",
    STAGE_LANDING: "Landing",
    STAGE_COMPLETE: "Complete",
    STAGE_EMERGENCY: "Emergency",
}

SPOOL_UP_TIME = 0.5  # [s]
SPOOL_UP_THRUST_FRAC = 0.25
TAKEOFF_TIME = 2.0  # [s]
HOVER_TIME = 3.0  # [s]
LANDING_SPEED = 0.5  # [m/s]
LANDING_BLEND_TIME = 2.0  # [s]
COMPLETE_EXIT_TIME = 1.0  # [s]
WAYPOINT_RADIUS = 1.0  # [m]

MAX_WAYPOINTS = 16


class MissionParams(NamedTuple):
    desired_position: jnp.ndarray  # (3,) hover/takeoff target
    waypoints: jnp.ndarray  # (MAX_WAYPOINTS, 3)
    num_waypoints: jnp.ndarray  # int32


class MissionState(NamedTuple):
    stage: jnp.ndarray  # int32
    last_stage: jnp.ndarray  # int32 (for stage-change detection)
    stage_start_us: jnp.ndarray  # int32
    init_position: jnp.ndarray  # (3,) recorded at takeoff entry
    last_pos: jnp.ndarray  # (3,) recorded at landing entry
    last_vel: jnp.ndarray  # (3,)
    waypoint_idx: jnp.ndarray  # int32
    goal_world: jnp.ndarray  # (3,) current waypoint
    start_plan: jnp.ndarray  # bool: RAPPIDS may run
    ready_to_exit: jnp.ndarray  # bool


class MissionCommand(NamedTuple):
    """Radio command + tracking request for this tick."""

    msg_type: jnp.ndarray
    msg_flags: jnp.ndarray
    msg_fields: jnp.ndarray  # (10,)
    use_tracking: jnp.ndarray  # bool: caller should use RunTracking refs


def load_trajectory_file(path):
    """Parse a waypoint file in the reference's trajectory.txt format
    (QuadRappidsPlannerAndController/trajectory.txt, consumed line-by-line
    by ExampleVehicleStateMachine.cpp:450-465): one "x,y,z" per line.
    Blank lines and '#' comments are skipped. Returns a list of 3-tuples."""
    waypoints = []
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split(",")
            if len(parts) < 3:
                raise ValueError(
                    f"{path}:{lineno}: expected 'x,y,z', got {line!r}")
            waypoints.append(tuple(float(p) for p in parts[:3]))
    if not waypoints:
        raise ValueError(f"{path}: no waypoints found")
    if len(waypoints) > MAX_WAYPOINTS:
        raise ValueError(
            f"{path}: {len(waypoints)} waypoints > MAX_WAYPOINTS={MAX_WAYPOINTS}")
    return waypoints


def make_params(desired_position=(0.0, 0.0, 2.0), waypoints=((20.0, 0.0, 2.5),)) -> MissionParams:
    import numpy as np

    wp = np.zeros((MAX_WAYPOINTS, 3), np.float32)
    wps = np.asarray(waypoints, np.float32)
    wp[: len(wps)] = wps
    return MissionParams(
        desired_position=jnp.asarray(desired_position, jnp.float32),
        waypoints=jnp.asarray(wp),
        num_waypoints=jnp.int32(len(wps)),
    )


def init_state(params: MissionParams) -> MissionState:
    return MissionState(
        stage=jnp.int32(STAGE_WAIT_FOR_START),
        last_stage=jnp.int32(STAGE_COMPLETE),
        stage_start_us=jnp.int32(0),
        init_position=jnp.zeros(3, jnp.float32),
        last_pos=jnp.zeros(3, jnp.float32),
        last_vel=jnp.zeros(3, jnp.float32),
        waypoint_idx=jnp.int32(0),
        goal_world=params.waypoints[0],
        start_plan=jnp.bool_(False),
        ready_to_exit=jnp.bool_(False),
    )


def step(params: MissionParams, ctrl: offboard_ctrl.OffboardCtrlParams,
         s: MissionState, now_us, est_pos, est_vel, est_att,
         tracking_ready, track_refs, is_safe, low_battery,
         should_start=True, should_stop=False):
    """One offboard tick of the mission state machine.

    track_refs: (ref_pos, ref_vel, ref_acc, ref_thrust, ref_angvel_body)
    from the currently planned RAPPIDS trajectory (used in Flight stage).
    Returns (new_state, MissionCommand).
    """
    now_us = jnp.asarray(now_us, jnp.int32)
    stage = s.stage
    entered = stage != s.last_stage
    stage_start = jnp.where(entered, now_us, s.stage_start_us)
    stage_t = (now_us - stage_start).astype(jnp.float32) * 1e-6

    # stage-entry latches
    init_position = jnp.where(
        entered & (stage == STAGE_TAKEOFF), est_pos, s.init_position
    )
    last_pos = jnp.where(entered & (stage == STAGE_LANDING), est_pos, s.last_pos)
    last_vel = jnp.where(entered & (stage == STAGE_LANDING), est_vel, s.last_vel)

    # ---------- stage-specific position-control targets ----------
    # takeoff blend
    frac_to = jnp.clip(stage_t / TAKEOFF_TIME, 0.0, 1.0)
    pos_takeoff = (1.0 - frac_to) * init_position + frac_to * params.desired_position

    # landing descent with initial blend
    frac_ld = jnp.clip(stage_t / LANDING_BLEND_TIME, 0.0, 1.0)
    pos_land_raw = last_pos + stage_t * jnp.array([0.0, 0.0, -LANDING_SPEED], jnp.float32)
    pos_land = (1.0 - frac_ld) * last_pos + frac_ld * pos_land_raw
    vel_land = (1.0 - frac_ld) * last_vel + frac_ld * jnp.array([0.0, 0.0, -LANDING_SPEED], jnp.float32)

    pos_target = params.desired_position  # hover / flight-no-traj default
    pos_target = jnp.where(stage == STAGE_TAKEOFF, pos_takeoff, pos_target)
    pos_target = jnp.where(stage == STAGE_LANDING, pos_land, pos_target)
    vel_target = jnp.where(stage == STAGE_LANDING, vel_land, jnp.zeros(3, jnp.float32))

    cmd_angvel_pc, cmd_thrust_pc = offboard_ctrl.run(
        ctrl, est_pos, est_vel, est_att, pos_target, vel_target,
    )

    # tracking command (Flight with a planned trajectory)
    ref_pos, ref_vel, ref_acc, ref_thrust, ref_angvel_body = track_refs
    cmd_angvel_tr, cmd_thrust_tr, _ = offboard_ctrl.run_tracking(
        ctrl, est_pos, est_vel, est_att, ref_pos, ref_vel, ref_acc,
        jnp.float32(0.0), ref_thrust, ref_angvel_body,
    )

    use_tracking = (stage == STAGE_FLIGHT) & tracking_ready
    cmd_angvel = jnp.where(use_tracking, cmd_angvel_tr, cmd_angvel_pc)
    cmd_thrust = jnp.where(use_tracking, cmd_thrust_tr, cmd_thrust_pc)

    # spool-up override
    in_spool = stage == STAGE_SPOOL_UP
    cmd_thrust = jnp.where(in_spool, 9.81 * SPOOL_UP_THRUST_FRAC, cmd_thrust)
    cmd_angvel = jnp.where(in_spool, jnp.zeros(3, jnp.float32), cmd_angvel)

    # ---------- radio message ----------
    rtype, rflags, rfields = radio.make_rates_command(cmd_thrust, cmd_angvel)
    itype, iflags, ifields = radio.make_idle_command()
    ktype, kflags, kfields = radio.make_kill_command()
    idle = (stage == STAGE_COMPLETE) | (stage == STAGE_WAIT_FOR_START)
    kill = stage == STAGE_EMERGENCY
    msg_type = jnp.where(kill, ktype, jnp.where(idle, itype, rtype))
    msg_flags = jnp.where(kill, kflags, jnp.where(idle, iflags, rflags))
    msg_fields = jnp.where(kill, kfields, jnp.where(idle, ifields, rfields))

    # ---------- waypoint switching (Flight stage) ----------
    dist_to_goal = jnp.linalg.norm(s.goal_world - est_pos)
    at_wp = (stage == STAGE_FLIGHT) & (dist_to_goal < WAYPOINT_RADIUS)
    has_next = s.waypoint_idx + 1 < params.num_waypoints
    waypoint_idx = jnp.where(at_wp & has_next, s.waypoint_idx + 1, s.waypoint_idx)
    goal_world = jnp.where(
        at_wp & has_next, params.waypoints[jnp.clip(waypoint_idx, 0, MAX_WAYPOINTS - 1)],
        s.goal_world,
    )

    # ---------- transitions ----------
    nxt = stage
    nxt = jnp.where((stage == STAGE_WAIT_FOR_START) & should_start, STAGE_SPOOL_UP, nxt)
    nxt = jnp.where(in_spool & (stage_t > SPOOL_UP_TIME), STAGE_TAKEOFF, nxt)
    nxt = jnp.where((stage == STAGE_TAKEOFF) & (frac_to >= 1.0), STAGE_HOVER, nxt)
    nxt = jnp.where((stage == STAGE_HOVER) & (stage_t > HOVER_TIME), STAGE_FLIGHT, nxt)
    nxt = jnp.where((stage == STAGE_FLIGHT) & should_stop, STAGE_LANDING, nxt)
    nxt = jnp.where((stage == STAGE_FLIGHT) & at_wp & ~has_next, STAGE_LANDING, nxt)
    nxt = jnp.where((stage == STAGE_LANDING) & (pos_land[2] < 0.0), STAGE_COMPLETE, nxt)

    # low battery from active stages -> landing (cpp:529-532 etc.)
    active = (stage == STAGE_SPOOL_UP) | (stage == STAGE_TAKEOFF) | \
        (stage == STAGE_HOVER) | (stage == STAGE_FLIGHT)
    nxt = jnp.where(active & low_battery, STAGE_LANDING, nxt)

    # safety net -> emergency (spool-up through landing)
    guarded = active | (stage == STAGE_LANDING)
    nxt = jnp.where(guarded & ~is_safe, STAGE_EMERGENCY, nxt)

    start_plan = s.start_plan | ((stage == STAGE_HOVER) & (nxt == STAGE_FLIGHT))
    ready = s.ready_to_exit | ((stage == STAGE_COMPLETE) & (stage_t > COMPLETE_EXIT_TIME))

    new_state = MissionState(
        stage=nxt.astype(jnp.int32),
        last_stage=stage,
        stage_start_us=stage_start,
        init_position=init_position,
        last_pos=last_pos,
        last_vel=last_vel,
        waypoint_idx=waypoint_idx,
        goal_world=goal_world,
        start_plan=start_plan,
        ready_to_exit=ready,
    )
    cmd = MissionCommand(
        msg_type=msg_type, msg_flags=msg_flags, msg_fields=msg_fields,
        use_tracking=use_tracking,
    )
    return new_state, cmd
