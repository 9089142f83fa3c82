"""Mission flight-stage state machine progression."""

import numpy as np
import jax.numpy as jnp

from agrifly_tpu.io import radio
from agrifly_tpu.models import constants as qconst
from agrifly_tpu.offboard import controller as offboard_ctrl
from agrifly_tpu.ops import rotation as rot
from agrifly_tpu.sim import mission


def null_refs():
    z3 = jnp.zeros(3, jnp.float32)
    return (z3, z3, z3, jnp.float32(9.81), z3)


def drive(params, ctrl, s, est_pos, seconds, now_us0=0, **kw):
    """Run the machine at 50 Hz with a synthetic (ideal) estimator pose."""
    now = now_us0
    cmds = []
    for _ in range(int(seconds * 50)):
        now += 20000
        s, cmd = mission.step(
            params, ctrl, s, jnp.int32(now), jnp.asarray(est_pos, jnp.float32),
            jnp.zeros(3), rot.identity(),
            kw.get("tracking_ready", jnp.bool_(False)), null_refs(),
            kw.get("is_safe", jnp.bool_(True)), kw.get("low_battery", jnp.bool_(False)),
            should_start=kw.get("should_start", True),
            should_stop=kw.get("should_stop", False),
        )
        cmds.append(cmd)
    return s, now, cmds


def setup():
    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    ctrl = offboard_ctrl.make_params(v)
    params = mission.make_params(
        desired_position=(0.0, 0.0, 2.0),
        waypoints=((5.0, 0.0, 2.0), (10.0, 0.0, 2.0)),
    )
    return params, ctrl, mission.init_state(params)


def test_progression_to_flight():
    params, ctrl, s = setup()
    # wait->spool (first tick), spool 0.5 s -> takeoff 2 s -> hover 3 s -> flight
    s, now, cmds = drive(params, ctrl, s, (0.0, 0.0, 0.0), 0.1)
    assert int(s.stage) in (mission.STAGE_SPOOL_UP, mission.STAGE_TAKEOFF)
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 0.5), 1.0, now_us0=now)
    assert int(s.stage) == mission.STAGE_TAKEOFF
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 2.5, now_us0=now)
    assert int(s.stage) == mission.STAGE_HOVER
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 3.5, now_us0=now)
    assert int(s.stage) == mission.STAGE_FLIGHT
    assert bool(s.start_plan)


def test_waypoints_then_landing_then_complete():
    params, ctrl, s = setup()
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 7.0)
    assert int(s.stage) == mission.STAGE_FLIGHT
    # reach waypoint 1 -> switch to waypoint 2
    s, now, _ = drive(params, ctrl, s, (4.8, 0.0, 2.0), 0.1, now_us0=now)
    assert int(s.waypoint_idx) == 1
    assert np.allclose(np.asarray(s.goal_world), [10.0, 0.0, 2.0])
    # reach final waypoint -> landing
    s, now, _ = drive(params, ctrl, s, (9.8, 0.0, 2.0), 0.1, now_us0=now)
    assert int(s.stage) == mission.STAGE_LANDING
    # descending from 2 m at 0.5 m/s: complete after ~4 s + blend
    s, now, cmds = drive(params, ctrl, s, (9.8, 0.0, 1.0), 7.0, now_us0=now)
    assert int(s.stage) == mission.STAGE_COMPLETE
    assert bool(s.ready_to_exit)
    assert int(cmds[-1].msg_type) == radio.TYPE_IDLE_CMD


def test_emergency_on_unsafe():
    params, ctrl, s = setup()
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 4.0)
    s, now, cmds = drive(params, ctrl, s, (0.0, 0.0, 2.0), 0.1, now_us0=now,
                         is_safe=jnp.bool_(False))
    assert int(s.stage) == mission.STAGE_EMERGENCY
    assert int(cmds[-1].msg_type) == radio.TYPE_EMERGENCY_KILL


def test_low_battery_lands():
    params, ctrl, s = setup()
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 7.0)
    assert int(s.stage) == mission.STAGE_FLIGHT
    s, now, _ = drive(params, ctrl, s, (0.0, 0.0, 2.0), 0.1, now_us0=now,
                      low_battery=jnp.bool_(True))
    assert int(s.stage) == mission.STAGE_LANDING
