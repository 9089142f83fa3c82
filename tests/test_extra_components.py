"""Test-trajectory library, motor test mode, float packets, gpsimu env
mode, direction-cost planner."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from agrifly_tpu.io import telemetry
from agrifly_tpu.models import constants as qconst
from agrifly_tpu.models import logic as onboard
from agrifly_tpu.sim import env, test_trajectories as tt


def test_trajectory_library_shapes_and_blend():
    des = jnp.array([0.0, 0.0, 2.0])
    for tid in range(6):
        pos, vel, acc, yaw = tt.evaluate(tid, 0.0, des)
        # at t=0 the blend pins everything to the hover point
        assert np.allclose(np.asarray(pos), [0, 0, 2], atol=1e-6), tid
        assert np.allclose(np.asarray(vel), 0.0), tid
        pos5, vel5, acc5, yaw5 = tt.evaluate(tid, 5.0, des)
        assert np.all(np.isfinite(np.asarray(pos5)))


def test_circle_trajectory_consistency():
    des = jnp.array([0.0, 0.0, 2.0])
    # after the blend, velocity ~ d(pos)/dt for the circle
    eps = 1e-3
    p1, v, _, _ = tt.evaluate(tt.TRAJ_CIRCLE, 10.0, des)
    p0, _, _, _ = tt.evaluate(tt.TRAJ_CIRCLE, 10.0 - eps, des)
    p2, _, _, _ = tt.evaluate(tt.TRAJ_CIRCLE, 10.0 + eps, des)
    num_v = (np.asarray(p2) - np.asarray(p0)) / (2 * eps)
    assert np.allclose(np.asarray(v), num_v, atol=1e-3)


def test_tracking_test_trajectory_closed_loop():
    # fly the fixed-height circle through the full closed loop
    params = env.make_params(noise_scale=0.0)
    state = env.init_state(params, jax.random.PRNGKey(0))
    cmd0 = env.hover_command((0.5, 0.0, 1.5))
    rollout = jax.jit(env.rollout, static_argnums=3)
    state, _ = rollout(params, state, cmd0, 3000)  # takeoff+settle

    des = jnp.array([0.0, 0.0, 1.5])

    def body(carry, k):
        st = carry
        t = k.astype(jnp.float32) * 0.002
        pos, vel, acc, yaw = tt.evaluate(tt.TRAJ_CIRCLE_LINE, t, des)
        c = env.Command(
            des_pos=pos, des_vel=vel, des_acc=acc, des_yaw=jnp.float32(0.0),
            ext_force=jnp.zeros(3, jnp.float32), ext_torque=jnp.zeros(3, jnp.float32),
        )
        st, out = env.step(params, st, c)
        return st, out.pos

    state, traj = jax.jit(lambda s: jax.lax.scan(body, s, jnp.arange(5000)))(state)
    pos = np.asarray(traj)[2500:]  # post-blend steady circling
    radii = np.hypot(pos[:, 0], pos[:, 1])
    assert abs(radii.mean() - 0.5) < 0.1, radii.mean()
    assert np.std(pos[:, 2] - 1.5) < 0.05


def test_motor_test_mode():
    p = onboard.make_params(qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD))
    s = onboard.init_state(p)  # IDLE: normally motors off
    s = s._replace(test_motors_on=jnp.bool_(True), test_motors_frac=jnp.float32(0.5))
    u = onboard.null_inputs()._replace(
        acc=jnp.array([0.0, 0.0, 9.81]), batt_voltage=jnp.float32(7.4)
    )
    s2, speeds = onboard.logic_step(p, s, u)
    assert np.all(np.asarray(speeds) > 0)  # spinning despite IDLE
    # thrust near 0.5 * weight
    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    f = v.prop_thrust_from_speed_sqr * np.asarray(speeds) ** 2
    assert abs(f.sum() - 0.5 * 9.81 * v.mass) < 0.05


def test_float_packet_roundtrip():
    vals = jnp.array([0.1, -0.9, 0.5])
    pkts = telemetry.encode_float_packet(vals)
    dec = np.asarray(telemetry.decode_float_packet(pkts, 3))
    assert np.allclose(dec, [0.1, -0.9, 0.5], atol=2 / 32768)


def test_gpsimu_estimator_env_mode():
    params = env.make_params(noise_scale=1.0)
    state = env.init_state(params, jax.random.PRNGKey(1))
    cmd = env.hover_command((0.0, 0.0, 1.5))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4))
    final, traj = rollout(params, state, cmd, 3000, "gpsimu")
    z = float(final.plant.pos[2])
    assert abs(z - 1.5) < 0.15, z
    assert int(final.logic.panic_reason) == 0
    # the gps-imu estimate tracks truth
    err = np.linalg.norm(np.asarray(final.gpsimu.pos) - np.asarray(final.plant.pos))
    assert err < 0.3, err


@pytest.mark.slow
def test_find_fastest_direction_cost():
    from agrifly_tpu.planner import rappids

    cam = rappids.make_camera(160, 120, focal=80.0, depth_scale=10 / 256)
    p = rappids.make_params(cam, 0.116, 0.174)
    img = jnp.full((120, 160), 230, jnp.int32)  # open space
    res = rappids.find_fastest_trajectory(
        p, img, jax.random.PRNGKey(0), jnp.zeros(3), jnp.zeros(3),
        jnp.array([0.0, 9.81, 0.0]), jnp.array([0.0, 0.0, 1.0]),
        n_candidates=64, pyramid_capacity=8, rounds=2,
    )
    assert bool(res.found)
    assert float(res.best_cost) < 0  # progress along +z (camera forward)


@pytest.mark.slow
def test_rollout_fast_matches_rollout():
    """Cadence-specialized rollout has identical semantics to `rollout`.

    Exact bit-identity across the two program structures is not attainable
    (XLA fuses them differently, yielding 1-ulp reassociation differences
    that the closed loop amplifies), so the contract is: identical early
    trajectory (before ulp noise can grow), identical discrete state, and
    statistically indistinguishable steady state.
    """
    for mode in (False, True, "gpsimu"):
        params = env.make_params(noise_scale=1.0)
        cmd = env.hover_command((0.0, 0.0, 1.2))
        s0 = env.init_state(params, jax.random.PRNGKey(5))
        ref_final, ref_traj = jax.jit(env.rollout, static_argnums=(3, 4))(
            params, s0, cmd, 523, mode
        )
        fast_final, fast_traj = jax.jit(
            lambda s: env.rollout_fast(params, s, cmd, 523, mode)
        )(s0)
        # first 25 steps agree to ulp-level tolerance (identical cadences
        # + inputs; fusion differences cost ~1 ulp per op)
        np.testing.assert_allclose(
            np.asarray(ref_traj.pos)[:25], np.asarray(fast_traj.pos)[:25],
            atol=1e-4, err_msg=f"mode={mode}",
        )
        # discrete state identical throughout
        np.testing.assert_array_equal(
            np.asarray(ref_traj.flight_state), np.asarray(fast_traj.flight_state)
        )
        np.testing.assert_array_equal(
            np.asarray(ref_traj.panic_reason), np.asarray(fast_traj.panic_reason)
        )
        # steady state agrees to ulp-amplification tolerance
        np.testing.assert_allclose(
            np.asarray(ref_final.plant.pos), np.asarray(fast_final.plant.pos),
            atol=0.05, err_msg=f"mode={mode}",
        )


def test_rollout_fast_nonzero_step_falls_back():
    """Concrete nonzero entry steps — scalar or batched arrays — must not
    take the cadence-specialized path (its prologue assumes step == 0).
    int(array) raising TypeError used to slide batched states silently
    onto the fast path with a restarted (wrong) cadence pattern."""
    params = env.make_params(noise_scale=0.0)
    cmd = env.hover_command((0.0, 0.0, 1.2))

    # scalar concrete nonzero step: falls back to `rollout`, bit-identical
    s0 = env.init_state(params, jax.random.PRNGKey(3))
    s3, _ = env.rollout(params, s0, cmd, 3, False)
    assert int(s3.step) == 3
    fast_final, _ = env.rollout_fast(params, s3, cmd, 20, False)
    ref_final, _ = env.rollout(params, s3, cmd, 20, False)
    np.testing.assert_array_equal(
        np.asarray(ref_final.mocap_acc_us), np.asarray(fast_final.mocap_acc_us))
    np.testing.assert_array_equal(
        np.asarray(ref_final.plant.pos), np.asarray(fast_final.plant.pos))

    # batched concrete nonzero step: the guard must detect it (int() would
    # raise TypeError) and route off the fast path. The general path then
    # fails loudly on the unsupported batched layout — previously the
    # specialized path ran it with a silently wrong firing pattern.
    import pytest

    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    sb0 = jax.vmap(lambda k: env.init_state(params, k))(keys)
    sb3, _ = jax.vmap(lambda s: env.rollout(params, s, cmd, 3, False))(sb0)
    assert np.asarray(sb3.step).shape == (2,)
    with pytest.raises(Exception):
        env.rollout_fast(params, sb3, cmd, 20, False)


@pytest.mark.slow
def test_rollout_fast_entry_phase_resumes_midflight():
    """entry_phase=(mocap_acc, offboard_acc) specializes the cadence
    pattern for a warm (nonzero-step) state: identical discrete state and
    ulp-close trajectory vs the generic rollout, even under jit where the
    step is traced (the steady-state benchmark path)."""
    for mode in (True, "gpsimu"):
        params = env.make_params(noise_scale=1.0)
        cmd = env.hover_command((0.0, 0.0, 1.2))
        s0 = env.init_state(params, jax.random.PRNGKey(11))
        warm, _ = env.rollout_fast(params, s0, cmd, 503, mode)  # odd phase
        phase = (int(warm.mocap_acc_us), int(warm.offboard_acc_us))
        assert phase != (0, 0)

        ref_final, ref_traj = env.rollout(params, warm, cmd, 47, mode)
        fast_final, fast_traj = jax.jit(
            lambda s: env.rollout_fast(params, s, cmd, 47, mode,
                                       entry_phase=phase))(warm)
        np.testing.assert_array_equal(
            np.asarray(ref_traj.flight_state), np.asarray(fast_traj.flight_state))
        np.testing.assert_array_equal(
            np.asarray(ref_final.mocap_acc_us), np.asarray(fast_final.mocap_acc_us))
        np.testing.assert_array_equal(
            np.asarray(ref_final.offboard_acc_us),
            np.asarray(fast_final.offboard_acc_us))
        np.testing.assert_allclose(
            np.asarray(ref_final.plant.pos), np.asarray(fast_final.plant.pos),
            atol=1e-4, err_msg=f"mode={mode}")
