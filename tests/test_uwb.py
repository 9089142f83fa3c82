"""UWB ranging network + onboard-UWB autonomous flight (CTRL_ONBOARD_UWB)."""

import jax
import jax.numpy as jnp
import numpy as np

from agrifly_tpu.models import logic as onboard
from agrifly_tpu.sim import env, uwb


ANCHOR_IDS = [101, 102, 103, 104]
ANCHOR_POS = [[-3.0, -3.0, 0.1], [3.0, -3.0, 0.2], [3.0, 3.0, 2.0], [-3.0, 3.0, 1.5]]


def test_network_round_robin_and_noise():
    p = uwb.make_params([1, 101, 102], comm_period=0.01, noise_std=0.1)
    s = uwb.init_state(jax.random.PRNGKey(0))
    positions = jnp.array([[0.0, 0.0, 1.0], [5.0, 0.0, 1.0], [0.0, 5.0, 1.0]])
    # vehicle (id 1) wants to range anchor 101
    targets = jnp.array([101, 0, 0], jnp.int32)
    got = []
    for _ in range(50):  # 100 ms at 2 ms ticks
        s, m = uwb.step(p, s, positions, targets, jnp.int32(2000))
        if bool(m.valid):
            got.append((int(m.responder_id), float(m.range)))
    # one completed transaction per ~12 ms (latch tick + period)
    assert 4 <= len(got) <= 9, got
    for rid, rng in got:
        assert rid == 101
        assert abs(rng - 5.0) < 0.5  # 0.1 std noise


def test_outliers_generated():
    p = uwb.make_params([1, 101], comm_period=0.01, outlier_prob=1.0, outlier_std=1.0)
    s = uwb.init_state(jax.random.PRNGKey(1))
    positions = jnp.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    targets = jnp.array([101, 0], jnp.int32)
    ranges = []
    for _ in range(60):
        s, m = uwb.step(p, s, positions, targets, jnp.int32(2000))
        if bool(m.valid):
            ranges.append(float(m.range))
    # all outliers: ~N(0,1), nowhere near the 10 m truth
    assert len(ranges) >= 4
    assert max(abs(r) for r in ranges) < 6.0


def test_onboard_uwb_autonomous_flight():
    # config: 4 anchors, onboard EKF localizes from ranges, offboard sends
    # *position* commands (CTRL_ONBOARD_UWB path of the demo)
    params = env.make_params(noise_scale=1.0)
    params = env.with_uwb_anchors(
        params, ANCHOR_IDS, ANCHOR_POS, noise_std=0.05, comm_period=0.01
    )
    cmd = env.hover_command((0.5, -0.5, 1.5))
    state = env.init_state(params, jax.random.PRNGKey(3))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4, 5))
    final, traj = rollout(params, state, cmd, 5000, False, "position")

    assert int(final.logic.fs) == onboard.FS_FULLY_AUTONOMOUS
    assert int(final.logic.panic_reason) == onboard.PANIC_NO_PANIC
    assert bool(final.logic.kf.uwb_init)
    assert int(final.logic.uwb_meas_count) > 100
    # onboard estimate localized and the vehicle reached the setpoint
    est = np.asarray(final.logic.kf.pos)
    true = np.asarray(final.plant.pos)
    assert np.linalg.norm(est - true) < 0.5, (est, true)
    assert np.linalg.norm(true - np.array([0.5, -0.5, 1.5])) < 0.5, true


def test_failed_transactions_skip_kf_but_reset_timer():
    """UwbMeasurement.failure (UWBRadio.hpp:23, hardwired false in the
    reference network with a 'fail like real life' todo): failed ranges are
    delivered, reset the no-UWB timer (QuadcopterLogic.hpp:62-69), advance
    the ranging target, and are NOT consumed by the EKF
    (QuadcopterLogic.cpp:253-258)."""
    p = uwb.make_params([1, 101], comm_period=0.01, failure_prob=1.0)
    s = uwb.init_state(jax.random.PRNGKey(2))
    positions = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    targets = jnp.array([101, 0], jnp.int32)
    n_failed = 0
    for _ in range(60):
        s, m = uwb.step(p, s, positions, targets, jnp.int32(2000))
        if bool(m.valid):
            assert bool(m.failure)
            assert float(m.range) == 0.0
            n_failed += 1
    assert n_failed >= 4

    # onboard consumption: failure resets the timer, advances the target,
    # leaves the EKF untouched
    params = env.make_params(noise_scale=0.0)
    params = env.with_uwb_anchors(params, ANCHOR_IDS, ANCHOR_POS)
    lp = params.logic
    ls = onboard.init_state(lp)
    ls = ls._replace(us_since_uwb=jnp.int32(10**6))
    inputs = onboard.null_inputs()._replace(
        acc=jnp.array([0.0, 0.0, 9.81], jnp.float32),
        batt_voltage=lp.batt_critical * 1.2,
        uwb_new=jnp.bool_(True), uwb_range=jnp.float32(0.0),
        uwb_responder_id=jnp.int32(101), uwb_failure=jnp.bool_(True),
    )
    new_ls, _ = onboard.logic_step(lp, ls, inputs)
    assert int(new_ls.us_since_uwb) == 0  # timer reset on ANY measurement
    assert int(new_ls.next_target_idx) == (int(ls.next_target_idx) + 1) % 4
    assert not bool(new_ls.kf.uwb_init)  # failed range never reaches the KF
    assert int(new_ls.uwb_meas_count) == int(ls.uwb_meas_count)


def test_out_of_range_silence_fires_uwb_timeout_panic():
    """max_range: out-of-range radios are silent (no broadcast), so a
    flying vehicle loses ranging entirely and hits PANIC_UWB_TIMEOUT after
    1.5 s (QuadcopterLogic.cpp:358-362)."""
    params = env.make_params(noise_scale=1.0)
    params = env.with_uwb_anchors(
        params, ANCHOR_IDS, ANCHOR_POS, noise_std=0.05, comm_period=0.01
    )
    cmd = env.hover_command((0.0, 0.0, 1.5))
    state = env.init_state(params, jax.random.PRNGKey(3))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4, 5))
    state, _ = rollout(params, state, cmd, 4000, False, "position")
    assert int(state.logic.fs) == onboard.FS_FULLY_AUTONOMOUS

    # anchors fall silent: every range is now beyond max_range
    params_dead = env.with_uwb_anchors(
        params, ANCHOR_IDS, ANCHOR_POS, noise_std=0.05, comm_period=0.01,
        max_range=0.01,
    )
    rollout2 = jax.jit(env.rollout, static_argnums=(3, 4, 5))
    state2, traj = rollout2(params_dead, state, cmd, 1000, False, "position")
    assert int(state2.logic.fs) == onboard.FS_PANIC
    assert int(state2.logic.panic_reason) == onboard.PANIC_UWB_TIMEOUT
