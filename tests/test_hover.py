"""Config #1: single quad hover + step response (renderer off).

Mirrors the reference's de-facto end-to-end check: offboard cascaded
controller -> quantized 23-byte rates command -> 30 ms delayed radio ->
onboard rates controller + mixer -> motor + rigid-body dynamics, closed
loop at 500 Hz. Envelope expectations follow from the default gains
(wn = 2 rad/s, zeta = 0.7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrifly_tpu.models import constants as qconst
from agrifly_tpu.models import logic as onboard
from agrifly_tpu.sim import env


@pytest.fixture(scope="module")
def params():
    return env.make_params(noise_scale=0.0)


def _run(params, cmd, seconds, key=0, pos=(0, 0, 0)):
    state = env.init_state(params, jax.random.PRNGKey(key), pos=pos)
    n = int(seconds * 500)
    rollout = jax.jit(env.rollout, static_argnums=3)
    final, traj = rollout(params, state, cmd, n)
    return final, traj


def test_takeoff_and_hover(params):
    cmd = env.hover_command((0.0, 0.0, 1.5))
    final, traj = _run(params, cmd, 6.0)
    z = np.asarray(traj.pos[:, 2])
    # converged to the setpoint
    assert abs(z[-1] - 1.5) < 0.05, z[-1]
    # never panicked
    assert int(final.logic.panic_reason) == onboard.PANIC_NO_PANIC
    assert int(final.logic.fs) == onboard.FS_EXTERNAL_RATES_CONTROL
    # stays essentially level in x/y
    assert np.max(np.abs(np.asarray(traj.pos[:, :2]))) < 0.05


def test_step_response_envelope(params):
    # start hovering at 1 m, step the setpoint to 2 m: the closed loop is
    # approximately second order with wn=2, zeta=0.7 -> small overshoot,
    # settled well within 4/(zeta*wn) ~ 2.9 s
    cmd1 = env.hover_command((0.0, 0.0, 1.0))
    state0, _ = _run(params, cmd1, 6.0)
    cmd2 = env.hover_command((0.0, 0.0, 2.0))
    rollout = jax.jit(env.rollout, static_argnums=3)
    _, traj = rollout(params, state0, cmd2, 3000)  # 6 s
    z = np.asarray(traj.pos[:, 2])
    assert abs(z[-1] - 2.0) < 0.02
    overshoot = (np.max(z) - 2.0) / 1.0
    assert overshoot < 0.15, overshoot
    # settled within 5% of the step by 3.5 s
    settled = np.abs(z[1750:] - 2.0) < 0.05
    assert np.all(settled)


def test_radio_delay_and_state_machine(params):
    cmd = env.hover_command((0.0, 0.0, 1.0))
    state = env.init_state(params, jax.random.PRNGKey(0))
    assert int(state.logic.fs) == onboard.FS_IDLE
    rollout = jax.jit(env.rollout, static_argnums=3)
    _, traj = rollout(params, state, cmd, 50)
    fs = np.asarray(traj.flight_state)
    # stays IDLE until the first delayed rates command arrives (~22 ticks:
    # first offboard fire at tick 5 + 15-step transport + 1 consume tick)
    assert np.all(fs[:20] == onboard.FS_IDLE)
    assert fs[-1] == onboard.FS_EXTERNAL_RATES_CONTROL
    idx = np.argmax(fs == onboard.FS_EXTERNAL_RATES_CONTROL)
    assert 18 <= idx <= 26, idx


def test_motor_speeds_reasonable(params):
    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    cmd = env.hover_command((0.0, 0.0, 1.5))
    final, traj = _run(params, cmd, 6.0)
    w = np.asarray(traj.motor_speeds[-1])
    # hover: each prop supports mg/4 -> w = sqrt(mg/4/kf)
    w_hover = np.sqrt(v.mass * 9.81 / 4 / v.prop_thrust_from_speed_sqr)
    assert np.allclose(w, w_hover, rtol=0.05), (w, w_hover)


def test_kill_command_is_sticky(params):
    from agrifly_tpu.io import radio as radio_codec
    from agrifly_tpu.sim import delayline

    cmd = env.hover_command((0.0, 0.0, 1.5))
    state, _ = _run(params, cmd, 4.0)
    # inject an emergency kill through the radio ring
    ktype, kflags, kfields = radio_codec.make_kill_command()
    ring = delayline.push(
        state.ring, ktype, kflags, kfields, state.step - 100, jnp.bool_(True)
    )
    state = state._replace(ring=ring)
    rollout = jax.jit(env.rollout, static_argnums=3)
    final, traj = rollout(params, state, cmd, 500)
    assert int(final.logic.fs) == onboard.FS_KILLED
    assert int(final.logic.panic_reason) == onboard.PANIC_KILLED_EXTERNALLY
    # motors off, vehicle falling/fallen
    assert np.all(np.asarray(final.plant.motor_speeds) == 0.0)


def test_radio_timeout_panics(params):
    # run normally, then stop feeding offboard commands by setting the
    # offboard period absurdly large -> radio timeout panic after 1.5 s
    cmd = env.hover_command((0.0, 0.0, 1.5))
    state, _ = _run(params, cmd, 4.0)
    starved = params._replace(offboard_period_us=jnp.int32(10**8))
    rollout = jax.jit(env.rollout, static_argnums=3)
    final, traj = rollout(starved, state, cmd, 1000)  # 2 s
    assert int(final.logic.fs) == onboard.FS_PANIC
    assert int(final.logic.panic_reason) == onboard.PANIC_RADIO_CMD_TIMEOUT


def test_hover_with_imu_noise():
    params = env.make_params(noise_scale=1.0)
    cmd = env.hover_command((0.0, 0.0, 1.5))
    final, traj = _run(params, cmd, 6.0, key=7)
    z = np.asarray(traj.pos[:, 2])
    assert abs(z[-1] - 1.5) < 0.1
    assert int(final.logic.panic_reason) == onboard.PANIC_NO_PANIC


def test_vmapped_envs_diverge_by_key():
    params = env.make_params(noise_scale=1.0)
    cmd = env.hover_command((0.0, 0.0, 1.0))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda k: env.init_state(params, k))(keys)
    cmds = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), cmd)

    def one(s, c):
        return env.rollout(params, s, c, 1500)

    finals, trajs = jax.jit(jax.vmap(one, in_axes=(0, 0)), static_argnums=())(states, cmds)
    xy = np.asarray(finals.plant.pos[:, :2])
    zs = np.asarray(finals.plant.pos[:, 2])
    # IMU noise decorrelates envs (lateral drift differs per key)
    assert xy.std() > 1e-4
    assert np.all(np.abs(zs - np.median(zs)) < 0.5)
