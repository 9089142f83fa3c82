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
