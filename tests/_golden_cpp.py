"""Reference-C++ golden traces: converter + framework comparison driver.

`native/golden/trace_gen.cpp` compiles the ACTUAL reference stack
(Quadcopter_T + Motor + QuadcopterLogic + KalmanFilter6DOF +
MocapStateEstimator + QuadcopterController, unmodified from
/root/reference) and runs the renderer-free core of
Simulator/Rappids_Simulator/main.cpp, dumping per-tick state, per-logic-tick
IMU noise draws, and per-offboard-fire commands/radio bytes. This module

  * converts those CSV dumps into checked-in compressed npz
    (``python -m tests._golden_cpp convert``), and
  * re-runs the SAME loop (same statement order as main.cpp:330-760)
    with this framework's primitives, injecting the C++'s exact noise
    draws, so tests/test_golden_cpp.py can compare the two trajectories.

The loop here intentionally mirrors the C++ demo's run-then-advance
ordering — the onboard logic and all sensors sample the plant one tick
behind the master clock, and the first iteration integrates nothing
(Quadcopter_T.cpp:87-90). agrifly_tpu.sim.env's fused step samples the
current tick instead (documented delta, PARITY.md "Known deltas"); the
comparison therefore drives the framework's *components* in the C++
arrangement rather than calling env.step.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
RAW_DIR = pathlib.Path(__file__).parent.parent / "native" / "golden" / "traces"

CONFIGS = ("hover_est", "step_est", "hover_truth")

# wire-level loop constants (Rappids_Simulator/main.cpp:140-201)
DT_US = 2000
MOCAP_PERIOD_US = 5000
OFFBOARD_PERIOD_US = 10000
RADIO_DELAY_US = 30000
EST_LATENCY_US = 30000


def _hex(col):
    return np.array(
        [np.frombuffer(bytes.fromhex(h), np.uint8) for h in col], np.uint8
    )


def convert(config: str) -> pathlib.Path:
    """CSV dumps -> one compressed npz per config."""
    import csv

    src = RAW_DIR / config

    def rows(name):
        with open(src / name) as f:
            r = csv.reader(f)
            header = next(r)
            return header, list(r)

    _, trace = rows("trace.csv")
    flags = np.array([[int(c) for c in row[2:8]] for row in trace], np.int8)
    truth = np.array([[float(c) for c in row[8:21]] for row in trace], np.float64)

    _, noise = rows("noise.csv")
    noise_k = np.array([int(r[0]) for r in noise], np.int32)
    noise_v = np.array([[float(c) for c in r[1:7]] for r in noise], np.float64)

    _, off = rows("offboard.csv")
    off_k = np.array([int(r[0]) for r in off], np.int32)
    off_est = np.array([[float(c) for c in r[1:14]] for r in off], np.float64)
    off_cmd = np.array([[float(c) for c in r[14:18]] for r in off], np.float64)
    off_des = np.array([[float(c) for c in r[18:21]] for r in off], np.float64)
    off_raw = _hex([r[21] for r in off])

    _, tel = rows("telemetry.csv")
    tel_k = np.array([int(r[0]) for r in tel], np.int32)
    tel_raw = _hex([r[1] + r[2] for r in tel])

    # motors.csv: per-tick exact motor speeds (f64), the f32 speed commands
    # the motors will receive next tick, and the exact f32 raw (pre-lowpass,
    # pre-bias) IMU measurements the logic stored at its most recent run
    _, mot = rows("motors.csv")
    mot_speeds = np.array([[float(c) for c in r[1:5]] for r in mot], np.float64)
    mot_cmds = np.array([[float(c) for c in r[5:9]] for r in mot], np.float32)
    imu_gyro = np.array([[float(c) for c in r[9:12]] for r in mot], np.float32)
    imu_acc = np.array([[float(c) for c in r[12:15]] for r in mot], np.float32)

    # logicdbg.csv: per-logic-tick onboard internals (stage-by-stage
    # teacher-forced comparison): fstate, decoded radio floats[0:4],
    # gyro/acc lowpass outputs, gyro bias, onboard-KF angvel/att/pos/vel
    _, ldbg = rows("logicdbg.csv")
    ldbg_k = np.array([int(r[0]) for r in ldbg], np.int32)
    ldbg_v = np.array([[float(c) for c in r[1:]] for r in ldbg], np.float64)

    # estdbg.csv (est mode): post-update MocapStateEstimator internals per
    # mocap tick: pos, vel, att, angvel, variance triples, estimate time
    try:
        _, edbg = rows("estdbg.csv")
    except FileNotFoundError:
        edbg = []
    edbg_k = np.array([int(r[0]) for r in edbg], np.int32)
    edbg_v = (np.array([[float(c) for c in r[1:]] for r in edbg], np.float64)
              if edbg else np.zeros((0, 20), np.float64))

    out = GOLDEN_DIR / f"cpp_{config}_v1.npz"
    np.savez_compressed(
        out, flags=flags, truth=truth, noise_k=noise_k, noise=noise_v,
        off_k=off_k, off_est=off_est, off_cmd=off_cmd, off_des=off_des,
        off_raw=off_raw, tel_k=tel_k, tel_raw=tel_raw,
        mot_speeds=mot_speeds, mot_cmds=mot_cmds,
        imu_gyro=imu_gyro, imu_acc=imu_acc,
        ldbg_k=ldbg_k, ldbg=ldbg_v, edbg_k=edbg_k, edbg=edbg_v,
    )
    return out


def load(config: str):
    return np.load(GOLDEN_DIR / f"cpp_{config}_v1.npz")


def run_framework(trace, mode: str, n_ticks: int | None = None,
                  des_pos=(0.0, 0.0, 3.5), step_t_us=None, step_pos=None):
    """Run this framework's components through the C++ demo loop, injecting
    the reference's exact IMU noise draws. Returns dict of arrays shaped
    like the trace for comparison."""
    import jax
    import jax.numpy as jnp

    from agrifly_tpu.io import radio, telemetry
    from agrifly_tpu.models import constants as qconst
    from agrifly_tpu.models import logic as onboard
    from agrifly_tpu.models import plant as plant_mod
    from agrifly_tpu.offboard import controller as offboard_ctrl
    from agrifly_tpu.offboard import estimators

    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    plant_p = plant_mod.make_params(v)
    logic_p = onboard.make_params(v, onboard_period=1.0 / 500.0)
    ctrl_p = offboard_ctrl.make_params(v)

    flags = np.asarray(trace["flags"])
    noise = np.asarray(trace["noise"], np.float32)
    n = len(flags) if n_ticks is None else min(n_ticks, len(flags))

    batt_v = jnp.float32(float(logic_p.batt_critical) * 1.2)
    G = jnp.array([0.0, 0.0, -9.81], jnp.float32)
    E3 = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    @jax.jit
    def tick_plant(plant, motor_cmds):
        return plant_mod.step(plant_p, plant, motor_cmds,
                              jnp.zeros(3, jnp.float32),
                              jnp.zeros(3, jnp.float32), 1.0 / 500.0)

    @jax.jit
    def tick_logic(logic, plant, acc_imu, noise6, radio_new, radio_type,
                   radio_flags, radio_fields):
        # noise.csv rows are in DRAW order; g++ evaluates the Vec3f(d(g),
        # d(g), d(g)) constructor arguments right-to-left
        # (Quadcopter_T.cpp:170-181), so draw k lands on component 2-k.
        gyro_n = noise6[:3][::-1]
        acc_n = noise6[3:][::-1]
        gyro, acc_b = plant_mod.imu_measurements(
            plant_p, plant, acc_imu, noise=(gyro_n, acc_n))
        inputs = onboard.null_inputs()._replace(
            gyro=gyro, acc=acc_b, batt_voltage=batt_v,
            radio_new=radio_new, radio_type=radio_type,
            radio_flags=radio_flags, radio_fields=radio_fields,
        )
        new_logic, _ = onboard.logic_step(logic_p, logic, inputs)
        return new_logic

    @jax.jit
    def upd_mocap(mocap, now_us, pos, att):
        return estimators.mocap_update(mocap, now_us, pos, att,
                                       jnp.int32(MOCAP_PERIOD_US))

    @jax.jit
    def telem_readout(logic):
        return telemetry.encode_from_logic(logic)

    @jax.jit
    def offboard_est(mocap, now_us):
        return estimators.mocap_get_prediction(
            mocap, now_us, jnp.int32(EST_LATENCY_US))

    @jax.jit
    def offboard_cmd(est_pos, est_vel, est_att, des):
        cmd_angvel, cmd_thrust = offboard_ctrl.run(
            ctrl_p, est_pos, est_vel, est_att, des)
        mtype, mflags, fields = radio.make_rates_command(cmd_thrust, cmd_angvel)
        return cmd_angvel, cmd_thrust, mtype, mflags, fields

    @jax.jit
    def push_prediction(mocap, now_us, cmd_angvel, est_att, cmd_thrust):
        from agrifly_tpu.ops import rotation as rot

        # main.cpp:647-649: acc = att * e3 * thrust - (0,0,9.81)
        cmd_acc = rot.rotate(est_att, E3) * cmd_thrust + G
        return estimators.mocap_set_predicted_values(
            mocap, now_us, jnp.int32(EST_LATENCY_US), cmd_angvel, cmd_acc)

    plant = plant_mod.init_state(pos=(0.0, 0.0, 0.0))
    logic = onboard.init_state(logic_p)
    mocap = estimators.mocap_init()

    des_default = jnp.asarray(des_pos, jnp.float32)
    des_step = None if step_pos is None else jnp.asarray(step_pos, jnp.float32)

    master = 0
    noise_idx = 0
    pending = None  # radio message visible to the NEXT logic run
    queue = []  # [(deliver_at_us, (mtype, mflags, fields))]

    out_truth = np.zeros((n, 13), np.float64)
    out_cmd = []
    out_raw = []
    out_est = []
    out_tel = []
    acc_imu = jnp.zeros(3, jnp.float32)

    for k in range(n):
        integrated, logic_f, mocap_f, telem_f, off_f, delivered_f = flags[k]
        if integrated:
            plant, acc_imu = tick_plant(plant, logic.des_motor_speeds)
        if logic_f:
            n6 = jnp.asarray(noise[noise_idx])
            noise_idx += 1
            if pending is not None:
                mtype, mflags, fields = pending
                logic = tick_logic(logic, plant, acc_imu, n6,
                                   jnp.bool_(True), mtype, mflags, fields)
                pending = None
            else:
                logic = tick_logic(logic, plant, acc_imu, n6,
                                   jnp.bool_(False), jnp.int32(0),
                                   jnp.int32(0), jnp.zeros(10, jnp.int32))
        master += DT_US

        if mocap_f and mode == "est":
            mocap = upd_mocap(mocap, jnp.int32(master), plant.pos, plant.att)
        if telem_f:
            pkts, logic = telem_readout(logic)
            out_tel.append((k, pkts))
        if off_f:
            if mode == "est":
                est_pos, est_vel, est_att, est_angvel = offboard_est(
                    mocap, jnp.int32(master))
            else:
                est_pos, est_vel = plant.pos, plant.vel
                est_att, est_angvel = plant.att, plant.angvel
            des = des_default
            if step_t_us is not None and master > step_t_us:
                des = des_step
            cmd_angvel, cmd_thrust, mtype, mflags, fields = offboard_cmd(
                est_pos, est_vel, est_att, des)
            if mode == "est":
                mocap = push_prediction(mocap, jnp.int32(master), cmd_angvel,
                                        est_att, cmd_thrust)
            _, logic = telem_readout(logic)  # main.cpp:667-673 (stateful)
            queue.append((master + RADIO_DELAY_US, (mtype, mflags, fields)))
            out_cmd.append((k, np.float64(cmd_thrust),
                            np.asarray(cmd_angvel, np.float64)))
            out_est.append((k, np.asarray(est_pos, np.float64),
                            np.asarray(est_vel, np.float64),
                            np.asarray(est_att, np.float64),
                            np.asarray(est_angvel, np.float64)))
            out_raw.append(radio.fields_to_bytes(
                int(mtype), int(mflags), np.asarray(fields)))
        if queue and queue[0][0] <= master:
            pending = queue.pop(0)[1]

        out_truth[k, 0:3] = np.asarray(plant.pos)
        out_truth[k, 3:6] = np.asarray(plant.vel)
        out_truth[k, 6:10] = np.asarray(plant.att)
        out_truth[k, 10:13] = np.asarray(plant.angvel)

    return dict(truth=out_truth, cmd=out_cmd, est=out_est, raw=out_raw,
                tel=out_tel, final_logic=logic)


def run_logic_replay(trace, n_ticks=None):
    """Teacher-forced onboard replay: drive the framework's QuadcopterLogic
    with the C++'s EXACT raw f32 IMU measurements (motors.csv), radio wire
    bytes (offboard.csv, delivered at the C++'s delivery ticks) and
    telemetry readout cadence, then compare every internal stage against
    the logicdbg dump. Returns per-logic-tick dict of (framework, reference)
    stage arrays plus telemetry wire codes.
    """
    import jax
    import jax.numpy as jnp

    from agrifly_tpu.io import radio, telemetry
    from agrifly_tpu.models import constants as qconst
    from agrifly_tpu.models import logic as onboard

    flags = np.asarray(trace["flags"])
    cmds = np.asarray(trace["mot_cmds"])
    gyro = np.asarray(trace["imu_gyro"])
    acc = np.asarray(trace["imu_acc"])
    off_raw = np.asarray(trace["off_raw"])
    ldbg_k = np.asarray(trace["ldbg_k"])
    ldbg = np.asarray(trace["ldbg"])
    tel_k = np.asarray(trace["tel_k"])
    tel_raw = np.asarray(trace["tel_raw"])
    n = len(flags) if n_ticks is None else min(n_ticks, len(flags))

    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    logic_p = onboard.make_params(v, onboard_period=1.0 / 500.0)
    batt_v = jnp.float32(float(logic_p.batt_critical) * 1.2)

    @jax.jit
    def tick_logic(logic, g, a, rn, rt, rf, rfs):
        inputs = onboard.null_inputs()._replace(
            gyro=g, acc=a, batt_voltage=batt_v,
            radio_new=rn, radio_type=rt, radio_flags=rf, radio_fields=rfs)
        return onboard.logic_step(logic_p, logic, inputs)[0]

    @jax.jit
    def telem_readout(logic):
        return telemetry.encode_from_logic(logic)

    dbg_at = {int(k): ldbg[i] for i, k in enumerate(ldbg_k)}
    tel_at = {int(k): tel_raw[i] for i, k in enumerate(tel_k)}

    logic = onboard.init_state(logic_p)
    pending = None
    fifo = list(off_raw)
    fi = 0
    got, want = [], []
    tel_got, tel_want = [], []
    for k in range(n):
        _, lf, _, tf, of, df = flags[k]
        if lf:
            if pending is not None:
                mt, mfl, fds = pending
                logic = tick_logic(
                    logic, jnp.asarray(gyro[k]), jnp.asarray(acc[k]),
                    jnp.bool_(True), jnp.int32(mt), jnp.int32(mfl),
                    jnp.asarray(fds))
                pending = None
            else:
                logic = tick_logic(
                    logic, jnp.asarray(gyro[k]), jnp.asarray(acc[k]),
                    jnp.bool_(False), jnp.int32(0), jnp.int32(0),
                    jnp.zeros(10, jnp.int32))
            if k in dbg_at:
                got.append(np.concatenate([
                    [float(np.asarray(logic.fs))],
                    np.asarray(logic.radio_floats[:4], np.float64),
                    np.asarray(logic.gyro_lp.ym1, np.float64),
                    np.asarray(logic.acc_lp.ym1, np.float64),
                    np.asarray(logic.gyro_bias, np.float64),
                    np.asarray(logic.kf.angvel, np.float64),
                    np.asarray(logic.kf.att, np.float64),
                    np.asarray(logic.kf.pos, np.float64),
                    np.asarray(logic.kf.vel, np.float64),
                    np.asarray(logic.des_motor_speeds, np.float64),
                ]))
                want.append(np.concatenate([dbg_at[k],
                                            cmds[k].astype(np.float64)]))
        if tf:
            pkts, logic = telem_readout(logic)
            if k in tel_at:
                tel_got.append(np.concatenate([
                    [int(pkts.packet_number)],
                    np.asarray(pkts.data1, np.int64),
                    np.asarray(pkts.data2, np.int64),
                ]))
                raw = tel_at[k]
                p1, p2 = raw[:30], raw[30:]
                d1 = np.frombuffer(p1[2:].tobytes(), "<u2").astype(np.int64)
                d2 = np.frombuffer(p2[2:].tobytes(), "<u2").astype(np.int64).copy()
                # data2[12]/[13] carry panic/warnings u8s in the low byte;
                # the high bytes are uninitialized stack in the reference
                d2[12] &= 0xFF
                d2[13] &= 0xFF
                tel_want.append(np.concatenate([[int(p1[1])], d1, d2]))
        if of:
            _, logic = telem_readout(logic)
        if df:
            pending = radio.bytes_to_fields(bytes(fifo[fi]))
            fi += 1

    # stage slices into the concatenated rows
    sl = {"fstate": slice(0, 1), "radio": slice(1, 5), "gyro_lp": slice(5, 8),
          "acc_lp": slice(8, 11), "bias": slice(11, 14),
          "kf_angvel": slice(14, 17), "kf_att": slice(17, 21),
          "kf_pos": slice(21, 24), "kf_vel": slice(24, 27),
          "cmds": slice(27, 31)}
    return dict(got=np.array(got), want=np.array(want), slices=sl,
                tel_got=np.array(tel_got), tel_want=np.array(tel_want))


def run_estimator_replay(trace, n_ticks=None):
    """Teacher-forced offboard-estimator replay: feed the C++'s exact truth
    pose at mocap ticks and its exact commands at offboard ticks, compare
    post-update internals against the estdbg dump. Estimator-only — the
    controller is excluded (its near-hover acos conditioning would mask
    estimator regressions; see test_golden_cpp)."""
    import jax
    import jax.numpy as jnp

    from agrifly_tpu.offboard import estimators
    from agrifly_tpu.ops import rotation as rot

    flags = np.asarray(trace["flags"])
    truth = np.asarray(trace["truth"])
    off_est = np.asarray(trace["off_est"])
    off_cmd = np.asarray(trace["off_cmd"])
    edbg_k = np.asarray(trace["edbg_k"])
    edbg = np.asarray(trace["edbg"])
    n = len(flags) if n_ticks is None else min(n_ticks, len(flags))
    dbg_at = {int(k): edbg[i] for i, k in enumerate(edbg_k)}

    upd = jax.jit(lambda m, t, p, a: estimators.mocap_update(
        m, t, p, a, jnp.int32(MOCAP_PERIOD_US)))
    push = jax.jit(lambda m, t, w, acc: estimators.mocap_set_predicted_values(
        m, t, jnp.int32(EST_LATENCY_US), w, acc))
    g3 = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)
    e3 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    mocap = estimators.mocap_init()
    master = 0
    ei = 0
    got, want = [], []
    for k in range(n):
        _, _, mf, _, of, _ = flags[k]
        master += DT_US
        if mf:
            mocap = upd(mocap, jnp.int32(master),
                        jnp.asarray(truth[k, 0:3], jnp.float32),
                        jnp.asarray(truth[k, 6:10], jnp.float32))
            if k in dbg_at:
                got.append(np.concatenate([
                    np.asarray(mocap.pos, np.float64),
                    np.asarray(mocap.vel, np.float64),
                    np.asarray(mocap.att, np.float64),
                    np.asarray(mocap.angvel, np.float64),
                    [float(mocap.var_pos[0, 0]), float(mocap.var_pos[0, 1]),
                     float(mocap.var_pos[1, 1]), float(mocap.var_att[0, 0]),
                     float(mocap.var_att[0, 1]), float(mocap.var_att[1, 1])],
                ]))
                want.append(dbg_at[k][:19])
        if of:
            # the C++'s exact SetPredictedValues inputs (main.cpp:647-649)
            ea = jnp.asarray(off_est[ei, 6:10], jnp.float32)
            th = jnp.float32(off_cmd[ei, 0])
            w = jnp.asarray(off_cmd[ei, 1:4], jnp.float32)
            mocap = push(mocap, jnp.int32(master), w,
                         rot.rotate(ea, e3) * th + g3)
            ei += 1

    sl = {"pos": slice(0, 3), "vel": slice(3, 6), "att": slice(6, 10),
          "angvel": slice(10, 13), "var_pos": slice(13, 16),
          "var_att": slice(16, 19)}
    return dict(got=np.array(got), want=np.array(want), slices=sl)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "convert":
        for cfg in CONFIGS:
            print("wrote", convert(cfg))
    else:
        print("usage: python -m tests._golden_cpp convert")
