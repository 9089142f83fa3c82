"""Config #2: closed loop with noisy IMU + Mocap estimator in the loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrifly_tpu.models import logic as onboard
from agrifly_tpu.offboard import estimators, safetynet
from agrifly_tpu.sim import env


def _run(params, cmd, seconds, key=0, use_estimator=True):
    state = env.init_state(params, jax.random.PRNGKey(key))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4))
    return rollout(params, state, cmd, int(seconds * 500), use_estimator)


def test_estimator_loop_hovers():
    params = env.make_params(noise_scale=1.0)
    cmd = env.hover_command((0.0, 0.0, 1.5))
    final, traj = _run(params, cmd, 6.0)
    z = np.asarray(traj.pos[:, 2])
    assert abs(z[-1] - 1.5) < 0.1, z[-1]
    assert int(final.logic.panic_reason) == onboard.PANIC_NO_PANIC
    assert bool(final.mocap.initialized)
    # estimator tracks truth
    est_pos = np.asarray(final.mocap.pos)
    true_pos = np.asarray(final.plant.pos)
    assert np.linalg.norm(est_pos - true_pos) < 0.15, (est_pos, true_pos)


def test_estimator_latency_compensation():
    # prediction pipe replays commanded accelerations: the 30 ms-ahead
    # prediction should be closer to the *future* true state than the raw
    # estimate during aggressive motion
    params = env.make_params(noise_scale=0.0)
    cmd = env.hover_command((0.0, 0.0, 1.0))
    final, _ = _run(params, cmd, 5.0)
    # command a 2 m step and sample mid-transient
    cmd2 = env.hover_command((0.0, 0.0, 3.0))
    rollout = jax.jit(env.rollout, static_argnums=(3, 4))
    mid, _ = rollout(params, final, cmd2, 250, True)  # 0.5 s into the step
    now_us = int(mid.step) * 2000
    pred = estimators.mocap_get_prediction(mid.mocap, now_us, jnp.int32(30000))
    raw_pos = np.asarray(mid.mocap.pos)
    pred_pos = np.asarray(pred[0])
    # 30 ms later truth:
    fut, _ = rollout(params, mid, cmd2, 15, True)
    future_true = np.asarray(fut.plant.pos)
    assert np.linalg.norm(pred_pos - future_true) <= np.linalg.norm(raw_pos - future_true) + 1e-4


def test_mocap_rejects_outliers():
    s = estimators.mocap_init()
    from agrifly_tpu.ops import rotation as rot

    # initialize + settle with consistent measurements at 5 ms cadence
    t = 0
    for _ in range(10):
        t += 5000
        s = estimators.mocap_update(
            s, jnp.int32(t), jnp.array([1.0, 2.0, 3.0]), rot.identity(), jnp.int32(5000)
        )
    pos_before = np.asarray(s.pos)
    # outlier far away -> rejected
    t += 5000
    s = estimators.mocap_update(
        s, jnp.int32(t), jnp.array([50.0, 2.0, 3.0]), rot.identity(), jnp.int32(5000)
    )
    assert int(s.num_rejected) == 1
    assert np.allclose(np.asarray(s.pos), pos_before, atol=1e-3)
    # 10 more outliers -> force accept (reset path)
    for _ in range(11):
        t += 5000
        s = estimators.mocap_update(
            s, jnp.int32(t), jnp.array([50.0, 2.0, 3.0]), rot.identity(), jnp.int32(5000)
        )
    assert abs(float(s.pos[0]) - 50.0) < 2.0


def test_gpsimu_estimator_converges():
    from agrifly_tpu.models import ekf

    key = jax.random.PRNGKey(0)
    s = estimators.gpsimu_init()
    dt = 1.0 / 500.0
    true_pos = np.array([2.0, -1.0, 3.0])
    # stationary vehicle: acc measures gravity, gyro zero, GPS at 100 Hz
    for i in range(500):
        key, k1 = jax.random.split(key)
        acc = jnp.array([0.0, 0.0, 9.81]) + 0.2 * jax.random.normal(k1, (3,))
        s = estimators.gpsimu_predict(s, acc, jnp.zeros(3), dt)
        if i % 5 == 4:
            s = estimators.gps_position_update(
                s, jnp.array(true_pos, dtype=jnp.float32), True
            )
    assert np.allclose(np.asarray(s.pos), true_pos, atol=0.15)
    assert np.linalg.norm(np.asarray(s.vel)) < 0.3


def test_gps_estimator_position_update():
    s = estimators.gps_init()
    t = 0
    for _ in range(20):
        t += 10000
        s = estimators.gps_update(s, jnp.int32(t), jnp.array([1.0, 1.0, 2.0]), jnp.int32(10000))
    assert np.allclose(np.asarray(s.pos), [1.0, 1.0, 2.0], atol=0.05)


def test_safetynet():
    p = safetynet.lab_params()
    s = safetynet.init_state()
    from agrifly_tpu.ops import rotation as rot

    s = safetynet.update(p, s, jnp.array([0.0, 0.0, 1.0]), rot.identity(), jnp.int32(1000))
    assert bool(s.is_safe)
    # out of the box
    s2 = safetynet.update(p, s, jnp.array([10.0, 0.0, 1.0]), rot.identity(), jnp.int32(1000))
    assert not bool(s2.is_safe) and bool(s2.unsafe_position)
    # not seen
    s3 = safetynet.update(p, s, jnp.array([0.0, 0.0, 1.0]), rot.identity(), jnp.int32(10**6))
    assert not bool(s3.is_safe) and bool(s3.vehicle_not_seen)
    # upside down and low
    q_flip = rot.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi)
    s4 = safetynet.update(p, s, jnp.array([0.0, 0.0, 0.5]), q_flip, jnp.int32(1000))
    assert not bool(s4.is_safe) and bool(s4.upside_down_and_low)


def test_block_covariance_predict_matches_dense():
    """cov_predict_block == dense F P F^T + diag(q) for the EKF transition."""
    from agrifly_tpu.models import ekf

    rng = np.random.default_rng(3)
    B = 64
    M = rng.normal(0, 0.3, (B, 9, 9))
    P = M @ np.swapaxes(M, -1, -2) + np.eye(9)
    A = rng.normal(0, 0.02, (B, 3, 3))
    g = rng.normal(0, 0.002, (B, 3))
    dt = 0.002
    qv, qa = 25.0 * dt * dt, 0.01 * dt * dt

    out = jax.jit(jax.vmap(lambda p, a, gg: ekf.cov_predict_block(p, dt, a, gg, qv, qa)))(
        jnp.asarray(P, jnp.float32), jnp.asarray(A, jnp.float32), jnp.asarray(g, jnp.float32)
    )
    for i in range(B):
        skew = np.array([[0, g[i, 2], -g[i, 1]], [-g[i, 2], 0, g[i, 0]], [g[i, 1], -g[i, 0], 0]])
        F = np.block([
            [np.eye(3), dt * np.eye(3), np.zeros((3, 3))],
            [np.zeros((3, 3)), np.eye(3), A[i]],
            [np.zeros((3, 3)), np.zeros((3, 3)), np.eye(3) + skew],
        ])
        ref = F @ P[i] @ F.T + np.diag([0] * 3 + [qv] * 3 + [qa] * 3)
        np.testing.assert_allclose(np.asarray(out[i]), ref, rtol=2e-4, atol=2e-5)
