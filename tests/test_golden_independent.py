"""Independent golden cross-check of the composed 500 Hz loop.

tests/golden pins this framework's own traces (regression only); this test
breaks that self-reference: a pure-numpy float64 oracle hand-integrates
three 2 ms ticks of the *composed* plant + onboard-logic loop directly from
the reference equations —

  plant/motors:  Quadcopter_T.cpp:86-203, Motor.cpp:40-84
  IMU setters:   QuadcopterLogic.hpp:40-52 (+_R rotation), noise off
  low-pass:      LowPassFilterSecondOrder.hpp:36-66 (bilinear 2nd order)
  onboard EKF:   KalmanFilter6DOF.cpp:70-147 (accel-aligned init, then the
                 complementary phase — no UWB in this scenario)
  rates control: QuadcopterLogic.cpp:528-541 -> torque = J dW/tau + w x Jw
                 (QuadcopterAngularVelocityController.hpp:25-37)
  mixer:         QuadcopterMixer.hpp:63-99

— and asserts the fused env.step (float32, XLA) reproduces the trajectory.
The oracle is written straight from the C++ formulas with no imports from
agrifly_tpu's compute modules, so a day-one semantic divergence in the
composed loop would be caught here rather than fossilized in the goldens.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from agrifly_tpu.models import constants as qconst
from agrifly_tpu.models import logic as onboard
from agrifly_tpu.sim import env as env_mod

DT = 0.002
MIN_ANGLE = 4.84813681e-6  # Rotation.hpp:39

# ----------------------------------------------------------------------
# float64 numpy quaternion helpers (Rotation.hpp conventions, w-first)
# ----------------------------------------------------------------------


def qmul(q2, q1):
    """Composition q2 * q1 (apply q1 first), Rotation.hpp operator*."""
    w2, x2, y2, z2 = q2
    w1, x1, y1, z1 = q1
    return np.array([
        w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1,
        w2 * x1 + x2 * w1 + y2 * z1 - z2 * y1,
        w2 * y1 - x2 * z1 + y2 * w1 + z2 * x1,
        w2 * z1 + x2 * y1 - y2 * x1 + z2 * w1,
    ])


def from_rotation_vector(v):
    theta = np.linalg.norm(v)
    if theta < MIN_ANGLE:
        return np.array([1.0, 0.0, 0.0, 0.0])
    axis = v / theta
    h = 0.5 * theta
    return np.concatenate([[math.cos(h)], math.sin(h) * axis])


def from_axis_angle(axis, angle):
    h = 0.5 * angle
    return np.concatenate([[math.cos(h)], math.sin(h) * np.asarray(axis)])


def to_matrix(q):
    w, x, y, z = q
    return np.array([
        [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
    ])


def from_euler_ypr(y, p, r):
    cy, sy = math.cos(0.5 * y), math.sin(0.5 * y)
    cp, sp = math.cos(0.5 * p), math.sin(0.5 * p)
    cr, sr = math.cos(0.5 * r), math.sin(0.5 * r)
    return np.array([
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ])


# ----------------------------------------------------------------------
# float64 oracle components
# ----------------------------------------------------------------------


class Lp2:
    """LowPassFilterSecondOrder.hpp:36-66."""

    def __init__(self, dt, wc, init):
        den = dt * dt * wc * wc + 2 * math.sqrt(2.0) * dt * wc + 4
        self.a1 = (dt * dt * wc * wc - 2 * math.sqrt(2.0) * dt * wc + 4) / den
        self.a2 = 2 * (dt * dt * wc * wc - 4) / den
        self.b0 = dt * dt * wc * wc / den
        self.b1 = dt * dt * wc * wc / den
        self.b2 = 2 * dt * dt * wc * wc / den
        init = np.asarray(init, np.float64)
        self.xm0 = init.copy()
        self.xm1 = init.copy()
        self.ym0 = init.copy()
        self.ym1 = init.copy()

    def apply(self, x):
        x = np.asarray(x, np.float64)
        out = self.b2 * x + self.b0 * self.xm0 + self.b1 * self.xm1 \
            - self.a1 * self.ym0 - self.a2 * self.ym1
        self.xm0, self.xm1 = self.xm1, x
        self.ym0, self.ym1 = self.ym1, out
        return out


def gravity_align(att, meas_acc, gain):
    """KalmanFilter6DOF.cpp accel alignment (mirrored by ekf.py)."""
    exp_acc = to_matrix(att).T @ np.array([0.0, 0.0, 1.0])
    norm = np.linalg.norm(meas_acc)
    acc_unit = meas_acc / (1.0 if norm < 1e-12 else norm)
    ax = np.cross(acc_unit, exp_acc)
    n = np.linalg.norm(ax)
    ax = ax / n if n > 1e-6 else np.array([1.0, 0.0, 0.0])
    angle = math.acos(np.clip(np.dot(exp_acc, acc_unit), -1.0, 1.0))
    return qmul(att, from_axis_angle(ax, gain * angle))


def oracle_three_ticks(v, plant0, logic_cmd, des_speeds0):
    """Integrate 3 composed ticks in float64. Returns per-tick dicts."""
    mass = float(v.mass)
    J = np.asarray(v.inertia_matrix, np.float64)
    Jinv = np.linalg.inv(J)
    kf_thrust = float(v.prop_thrust_from_speed_sqr)
    kt_from_thrust = float(v.prop_torque_from_thrust)
    kt_sqr = kt_from_thrust * kf_thrust  # prop_torque_from_speed_sqr
    d = float(v.arm_length) / math.sqrt(2.0)
    spin = np.array([1.0, -1.0, 1.0, -1.0])
    motor_xy = np.array([[+1, -1], [-1, -1], [-1, +1], [+1, +1]], np.float64) * d
    positions = np.concatenate([motor_xy, np.zeros((4, 1))], axis=1)
    tc_xy = float(v.angvel_control_tc_xy)
    tc_z = float(v.angvel_control_tc_z)
    max_total = float(v.max_cmd_total_thrust)
    min_f, max_f = float(v.min_thrust_per_prop), float(v.max_thrust_per_prop)
    max_speed = float(v.motor_max_speed)
    grav = np.array([0.0, 0.0, -9.81])

    pos, vel, att, angvel, speeds = [np.asarray(x, np.float64) for x in plant0]
    des_speeds = np.asarray(des_speeds0, np.float64)

    gyro_lp = Lp2(DT, 200.0, np.zeros(3))
    acc_lp = Lp2(DT, 100.0, np.zeros(3))
    kf_att = np.array([1.0, 0.0, 0.0, 0.0])
    kf_angvel = np.zeros(3)
    imu_init = False

    thrust_cmd, wx, wy, wz = logic_cmd
    des_angvel_cmd = np.array([wx, wy, wz])

    out = []
    for _ in range(3):
        # ---- plant (Quadcopter_T.cpp:86-156; Motor.cpp:40-84) ----
        cmds = np.maximum(des_speeds, 0.0)
        # motorTimeConst = 0 for every reference preset -> c = 0
        new_speeds = np.clip(cmds, 0.0, max_speed)
        w_abs_w = new_speeds * np.abs(new_speeds)
        thrusts = kf_thrust * w_abs_w
        total_force_b = np.array([0.0, 0.0, thrusts.sum()])
        torque_b = np.zeros(3)
        for i in range(4):
            f_i = np.array([0.0, 0.0, thrusts[i]])
            torque_b += np.cross(positions[i], f_i)
            torque_b[2] += -kt_sqr * w_abs_w[i] * spin[i]
            # rotor reaction torque: motorInertia = 0 in every preset
        ang_mom = J @ angvel  # + motor angular momentum (inertia 0)
        ang_acc = Jinv @ (torque_b - np.cross(angvel, ang_mom))
        R = to_matrix(att)
        vel_b = R.T @ vel
        total_force_b += -np.asarray(v.lin_drag_coeff_b, np.float64) * vel_b
        acc = grav + (R @ total_force_b) / mass
        new_pos = pos + vel * DT + 0.5 * acc * DT * DT
        new_vel = vel + acc * DT
        new_att = qmul(att, from_rotation_vector(angvel * DT))
        new_angvel = angvel + ang_acc * DT
        if new_pos[2] <= 0 and new_vel[2] < 0:
            new_pos[2] = 0.0
            new_vel[2] = 0.0
            acc = acc.copy()
            acc[2] = 0.0
            new_angvel = np.zeros(3)
        pos, vel, att, angvel, speeds = new_pos, new_vel, new_att, new_angvel, new_speeds

        # ---- IMU (Quadcopter_T.cpp:159-183, noise off, R_imu = I) ----
        gyro_meas = angvel.copy()
        acc_meas = to_matrix(att).T @ (acc - grav)

        # ---- onboard logic (QuadcopterLogic.cpp:164-219) ----
        gyro_f = gyro_lp.apply(gyro_meas)
        acc_f = acc_lp.apply(acc_meas)
        if not imu_init:
            # phase A: reset + accel-aligned attitude (cpp:71-108)
            kf_att = gravity_align(np.array([1.0, 0.0, 0.0, 0.0]), acc_f, 1.0)
            kf_angvel = np.zeros(3)
            imu_init = True
        else:
            # phase B: complementary attitude until the first UWB fix
            kf_att = qmul(kf_att, from_rotation_vector(gyro_f * DT))
            kf_att = gravity_align(kf_att, acc_f, DT / 4.0)
            kf_angvel = gyro_f.copy()

        # external-rates controller (cpp:528-541)
        err = des_angvel_cmd - kf_angvel
        des_ang_acc = np.array([err[0] / tc_xy, err[1] / tc_xy, err[2] / tc_z])
        des_torque = J @ des_ang_acc + np.cross(kf_angvel, J @ kf_angvel)
        # mixer (QuadcopterMixer.hpp:63-99), kt = spinDir * torqueFromThrust
        kt = 1.0 * kt_from_thrust
        tot = min(thrust_cmd * mass, max_total)
        t = des_torque
        f = np.array([
            (-t[0] / d - t[1] / d - t[2] / kt + tot) / 4.0,
            (-t[0] / d + t[1] / d + t[2] / kt + tot) / 4.0,
            (+t[0] / d + t[1] / d - t[2] / kt + tot) / 4.0,
            (+t[0] / d - t[1] / d + t[2] / kt + tot) / 4.0,
        ])
        f = np.clip(f, min_f, max_f)
        des_speeds = np.where(f > 0, np.sqrt(np.maximum(f, 1e-30) / kf_thrust), 0.0)

        out.append(dict(pos=pos.copy(), vel=vel.copy(), att=att.copy(),
                        angvel=angvel.copy(), motor_speeds=speeds.copy(),
                        des_speeds=des_speeds.copy()))
    return out


def test_composed_loop_matches_hand_integration():
    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    params = env_mod.make_params(noise_scale=0.0)

    # a non-trivial in-flight initial condition
    pos0 = np.array([0.0, 0.0, 1.0])
    vel0 = np.array([0.1, -0.05, 0.2])
    att0 = from_euler_ypr(0.2, 0.05, -0.1)
    angvel0 = np.array([0.2, -0.1, 0.05])
    hover_w = math.sqrt(v.mass * 9.81 / 4.0 / v.prop_thrust_from_speed_sqr)
    speeds0 = np.full(4, 0.8 * hover_w)
    cmd = (11.0, 0.4, -0.3, 0.2)  # thrust [m/s^2], body rates [rad/s]

    state = env_mod.init_state(params, jax.random.PRNGKey(0))
    state = state._replace(
        plant=state.plant._replace(
            pos=jnp.asarray(pos0, jnp.float32),
            vel=jnp.asarray(vel0, jnp.float32),
            att=jnp.asarray(att0, jnp.float32),
            angvel=jnp.asarray(angvel0, jnp.float32),
            motor_speeds=jnp.asarray(speeds0, jnp.float32),
        ),
        logic=state.logic._replace(
            fs=jnp.int32(onboard.FS_EXTERNAL_RATES_CONTROL),
            radio_floats=jnp.zeros(10, jnp.float32).at[0:4].set(
                jnp.asarray(cmd, jnp.float32)),
            des_motor_speeds=jnp.asarray(speeds0, jnp.float32),
        ),
    )

    hover = env_mod.hover_command((0.0, 0.0, 1.0))
    step = jax.jit(lambda s: env_mod.step(params, s, hover))
    got = []
    for _ in range(3):
        state, _ = step(state)
        got.append(dict(
            pos=np.asarray(state.plant.pos, np.float64),
            vel=np.asarray(state.plant.vel, np.float64),
            att=np.asarray(state.plant.att, np.float64),
            angvel=np.asarray(state.plant.angvel, np.float64),
            motor_speeds=np.asarray(state.plant.motor_speeds, np.float64),
            des_speeds=np.asarray(state.logic.des_motor_speeds, np.float64),
        ))

    want = oracle_three_ticks(
        v, (pos0, vel0, att0, angvel0, speeds0), cmd, speeds0)

    for k in range(3):
        for key, tol in [("pos", 1e-5), ("vel", 1e-4), ("att", 1e-5),
                         ("angvel", 5e-4), ("motor_speeds", 0.5),
                         ("des_speeds", 0.5)]:
            np.testing.assert_allclose(
                got[k][key], want[k][key], rtol=2e-4, atol=tol,
                err_msg=f"tick {k + 1}, {key}",
            )
    # sanity: the transient is genuinely non-trivial
    assert np.linalg.norm(want[2]["angvel"] - angvel0) > 1e-3
    assert abs(want[2]["pos"][2] - pos0[2]) > 1e-5
