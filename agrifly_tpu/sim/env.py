"""Fused simulation environment: plant + onboard logic + radio channel +
offboard control in one jitted step.

This is the TPU-native replacement for the reference's multi-process loop
(Simulator/Rappids_Simulator/main.cpp:330-760 reduced to its renderer-free
core): one `step(params, state, cmd)` advances 2 ms of sim time — physics,
IMU fabrication, onboard logic, delayed radio transport, and the periodic
offboard control loop — entirely on device. `vmap` over the env axis gives
batched fleets; `lax.scan` over time gives whole rollouts per jit call.

Periodic subsystems use integer-microsecond accumulators with the
reference's `> period, then subtract` trigger rule, so cadences match the
C++ Timer/AdjustTimeBySeconds behavior exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from agrifly_tpu.io import radio
from agrifly_tpu.models import constants as qconst
from agrifly_tpu.models import logic as onboard
from agrifly_tpu.models import plant as plant_mod
from agrifly_tpu.offboard import controller as offboard_ctrl
from agrifly_tpu.sim import delayline


class EnvParams(NamedTuple):
    plant: plant_mod.PlantParams
    logic: onboard.LogicParams
    ctrl: offboard_ctrl.OffboardCtrlParams
    dt_us: jnp.ndarray  # int32, physics/onboard period (2000)
    offboard_period_us: jnp.ndarray  # int32 (10000 = 100 Hz demo)
    radio_delay_us: jnp.ndarray  # int32 (30000 demo)
    noise_scale: jnp.ndarray  # f32: 1.0 = reference IMU noise, 0.0 = off
    mocap_period_us: jnp.ndarray  # int32 (5000 = 200 Hz demo)
    est_latency_us: jnp.ndarray  # int32: latency GetPrediction compensates
    uwb: "object" = None  # Optional[uwb.UwbParams]: anchors for onboard nav


class Command(NamedTuple):
    """Per-step external input: setpoint + disturbances."""

    des_pos: jnp.ndarray  # (3,)
    des_vel: jnp.ndarray  # (3,)
    des_acc: jnp.ndarray  # (3,)
    des_yaw: jnp.ndarray  # scalar
    ext_force: jnp.ndarray  # (3,) world-frame wind force [N]
    ext_torque: jnp.ndarray  # (3,) world-frame torque [N m]


def hover_command(des_pos=(0.0, 0.0, 1.5)) -> Command:
    z3 = jnp.zeros(3, jnp.float32)
    return Command(
        des_pos=jnp.asarray(des_pos, jnp.float32), des_vel=z3, des_acc=z3,
        des_yaw=jnp.float32(0.0), ext_force=z3, ext_torque=z3,
    )


class EnvState(NamedTuple):
    plant: plant_mod.PlantState
    logic: onboard.LogicState
    ring: delayline.RadioRing
    offboard_acc_us: jnp.ndarray  # int32 periodic accumulator
    step: jnp.ndarray  # int32
    key: jnp.ndarray  # PRNG key
    last_cmd_thrust: jnp.ndarray  # f32 (previousThrust in the demo)
    last_cmd_angvel: jnp.ndarray  # (3,)
    mocap: "object"  # estimators.MocapEstState
    mocap_acc_us: jnp.ndarray  # int32 periodic accumulator
    gpsimu: "object"  # ekf.EkfState (offboard GPS-IMU estimator)
    gps_acc_us: jnp.ndarray  # int32 periodic accumulator (100 Hz GPS)
    uwb: "object" = None  # Optional[uwb.UwbState]


class StepOutputs(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    att: jnp.ndarray
    angvel: jnp.ndarray
    motor_speeds: jnp.ndarray
    flight_state: jnp.ndarray
    panic_reason: jnp.ndarray
    warnings: jnp.ndarray


def make_params(
    vehicle_type: int = qconst.QC_TYPE_CF_MINIQUAD,
    dt: float = 1.0 / 500.0,
    offboard_period: float = 1.0 / 100.0,
    radio_delay: float = 0.03,
    noise_scale: float = 1.0,
    mocap_period: float = 1.0 / 200.0,
    est_latency: float = 0.03,
) -> EnvParams:
    v = qconst.vehicle_params(vehicle_type)
    return EnvParams(
        plant=plant_mod.make_params(v),
        logic=onboard.make_params(v, onboard_period=dt),
        ctrl=offboard_ctrl.make_params(v),
        dt_us=jnp.int32(round(dt * 1e6)),
        offboard_period_us=jnp.int32(round(offboard_period * 1e6)),
        radio_delay_us=jnp.int32(round(radio_delay * 1e6)),
        noise_scale=jnp.float32(noise_scale),
        mocap_period_us=jnp.int32(round(mocap_period * 1e6)),
        est_latency_us=jnp.int32(round(est_latency * 1e6)),
    )


def with_uwb_anchors(params: EnvParams, anchor_ids, anchor_positions,
                     vehicle_id=1, comm_period=0.01, noise_std=0.0,
                     outlier_prob=0.0, outlier_std=0.0, failure_prob=0.0,
                     max_range=float("inf")) -> EnvParams:
    """Enable UWB-based onboard navigation: install anchors in the onboard
    logic's ranging-target DB and build the network radio table
    (row 0 = the vehicle, then the anchors)."""
    from agrifly_tpu.sim import uwb as uwb_mod

    logic_p = onboard.with_ranging_targets(params.logic, anchor_ids, anchor_positions)
    radio_ids = [vehicle_id] + list(anchor_ids)
    uwb_p = uwb_mod.make_params(
        radio_ids, comm_period=comm_period, noise_std=noise_std,
        outlier_prob=outlier_prob, outlier_std=outlier_std,
        failure_prob=failure_prob, max_range=max_range,
    )
    return params._replace(logic=logic_p, uwb=uwb_p)


def init_state(params: EnvParams, key, pos=(0.0, 0.0, 0.0)) -> EnvState:
    from agrifly_tpu.offboard import estimators
    from agrifly_tpu.sim import uwb as uwb_mod

    uwb_state = None
    if params.uwb is not None:
        key, uk = jax.random.split(key)
        uwb_state = uwb_mod.init_state(uk)
    return EnvState(
        plant=plant_mod.init_state(pos=pos),
        logic=onboard.init_state(params.logic),
        ring=delayline.init(),
        offboard_acc_us=jnp.int32(0),
        step=jnp.int32(0),
        key=key,
        last_cmd_thrust=jnp.float32(0.0),
        last_cmd_angvel=jnp.zeros(3, jnp.float32),
        mocap=estimators.mocap_init(),
        mocap_acc_us=jnp.int32(0),
        gpsimu=estimators.gpsimu_init(),
        gps_acc_us=jnp.int32(0),
        uwb=uwb_state,
    )


def step(params: EnvParams, s: EnvState, cmd: Command, use_estimator: bool = False,
         ctrl_mode: str = "rates"):
    """Advance one 2 ms tick. Returns (new_state, outputs).

    use_estimator (static): False = offboard control sees the true plant
    state (config #1); True = the demo's full estimation chain (config #2):
    perfect mocap measurements at 200 Hz -> MocapStateEstimator with
    delayed-command replay -> GetPrediction(latency) feeds the controller,
    and each command is fed back into the prediction pipe
    (Rappids_Simulator/main.cpp:451-457,469,647-649).
    """
    half = physics_tick(s, params, cmd.ext_force, cmd.ext_torque, use_estimator)
    return _offboard_and_finish(params, s, cmd, half, use_estimator, ctrl_mode)


def step_static(params: EnvParams, s: EnvState, cmd: Command,
                use_estimator: bool, ctrl_mode: str,
                mocap_fire: bool, offboard_fire: bool):
    """One tick with statically-known cadence decisions (see rollout_fast)."""
    half = physics_tick(
        s, params, cmd.ext_force, cmd.ext_torque, use_estimator,
        static_mocap_fire=mocap_fire, static_gps_fire=offboard_fire,
    )
    return _offboard_and_finish(
        params, s, cmd, half, use_estimator, ctrl_mode, static_fire=offboard_fire
    )


def _cadence_patterns(n=40, dt=2000, mocap=5000, offboard=10000,
                      macc0=0, oacc0=0):
    """Python-simulate the accumulator trigger patterns.

    macc0/oacc0: entry accumulator values (0 = cold start). From any entry
    phase the pattern is immediately periodic with period mocap/gcd(dt,..)
    = 5 ticks for the default timing.

    Returns (mocap_flags, offboard_flags, states) where states[i] is the
    joint (mocap_acc, offboard_acc) pair AFTER tick i — used to align a
    warm-phase rollout's block boundary onto the canonical orbit point."""
    mpat, opat, states = [], [], []
    macc, oacc = macc0, oacc0
    for _ in range(n):
        macc += dt
        mf = macc > mocap
        if mf:
            macc -= mocap
        oacc += dt
        of = oacc > offboard
        if of:
            oacc -= offboard
        mpat.append(bool(mf))
        opat.append(bool(of))
        states.append((macc, oacc))
    return mpat, opat, states


def rollout_fast(params: EnvParams, state: EnvState, cmd: Command,
                 n_steps: int, use_estimator: bool = False,
                 ctrl_mode: str = "rates", entry_phase=None):
    """Cadence-specialized rollout: bit-identical to `rollout` for the
    default timing (dt 2 ms, mocap 200 Hz, offboard/GPS 100 Hz), but each
    tick is specialized at trace time to its (deterministic, periodic)
    estimator/offboard trigger pattern, so measurement updates and
    offboard control only generate work on the ticks where they fire
    (3-4x faster in estimator mode). Requires state.step == 0 at entry
    and the default cadences; falls back to `rollout` otherwise.

    entry_phase: optional (mocap_acc_us, offboard_acc_us) *python ints* —
    the entry accumulator values, for specializing a rollout that resumes
    mid-flight (e.g. a steady-state benchmark warmed outside jit, where
    the phase is concrete but this call is traced). The caller asserts
    the whole batch shares that phase; gps_acc is assumed equal to the
    offboard phase (same 10 ms period, same reset history)."""
    dt = int(params.dt_us)
    if (dt != 2000 or int(params.mocap_period_us) != 5000
            or int(params.offboard_period_us) != 10000):
        return rollout(params, state, cmd, n_steps, use_estimator, ctrl_mode)
    if entry_phase is None:
        # Catch misuse when the entry step is concrete (outside jit): the
        # fast path's prologue assumes step == 0. Array-valued concrete
        # steps (e.g. a vmapped batch chained outside jit) must be all-zero
        # too — int() would raise TypeError on those and silently pass.
        try:
            concrete_nonzero = bool((np.asarray(state.step) != 0).any())
        except (jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            concrete_nonzero = False  # traced: caller's contract, can't check
        if concrete_nonzero:
            return rollout(params, state, cmd, n_steps, use_estimator, ctrl_mode)
        macc0 = oacc0 = 0
    else:
        macc0, oacc0 = int(entry_phase[0]), int(entry_phase[1])

    PERIOD = 5
    PROLOGUE = 5  # the joint pattern is periodic with period 5 from tick 1
    mpat, opat, accs = _cadence_patterns(
        PROLOGUE + PERIOD, macc0=macc0, oacc0=oacc0)

    # The scanned 5-tick block must be the SAME program regardless of
    # entry phase: XLA fuses a rotated arrangement of identical per-block
    # work up to ~40% worse (measured — BENCH_DETAILS "steady state vs
    # restart"; A/B showed it is the program, not the data). So align the
    # warm prologue length to land on the canonical (zero-phase)
    # block-entry accumulator state and scan the canonical block. The
    # emitted flag sequence is unchanged — only the prologue/block
    # boundary moves — so outputs stay bit-identical.
    c_mpat, c_opat, c_accs = _cadence_patterns(PROLOGUE + PERIOD)
    block_entry = c_accs[PROLOGUE - 1]
    if (macc0, oacc0) == (0, 0):
        pro_len = PROLOGUE
    elif (macc0, oacc0) == block_entry:
        pro_len = 0
    elif block_entry in accs:
        pro_len = accs.index(block_entry) + 1
    else:  # off-orbit entry phase: keep the rotated block (still correct)
        pro_len = PROLOGUE
        c_mpat, c_opat = mpat, opat

    def tick(s, m, o):
        return step_static(params, s, cmd, use_estimator, ctrl_mode, m, o)

    n_pro = min(pro_len, n_steps)
    pro_outs = []
    for j in range(n_pro):
        state, out = tick(state, mpat[j], opat[j])
        pro_outs.append(out)

    remaining = n_steps - n_pro
    n_blocks = remaining // PERIOD
    tail = remaining - n_blocks * PERIOD

    block_flags = list(zip(c_mpat[PROLOGUE:PROLOGUE + PERIOD],
                           c_opat[PROLOGUE:PROLOGUE + PERIOD]))

    def block(carry, _):
        s = carry
        block_outs = []
        for m, o in block_flags:
            s, out = tick(s, m, o)
            block_outs.append(out)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_outs)
        return s, stacked

    if n_blocks > 0:
        state, blocks_out = jax.lax.scan(block, state, None, length=n_blocks)
        blocks_out = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), blocks_out
        )
    else:
        blocks_out = None

    tail_outs = []
    for j in range(tail):
        state, out = tick(state, block_flags[j][0], block_flags[j][1])
        tail_outs.append(out)

    pieces = []
    if pro_outs:
        pieces.append(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pro_outs))
    if blocks_out is not None:
        pieces.append(blocks_out)
    if tail_outs:
        pieces.append(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tail_outs))
    traj = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *pieces)
    return state, traj


def physics_phase_a(s: EnvState, params: EnvParams, ext_force, ext_torque,
                    noise=None):
    """Phase A of one tick: radio delivery, plant integration, IMU
    fabrication. Split out so fleet envs can run a *shared* UWB network
    between the plants moving and the onboard logics consuming ranges.

    noise: optional pre-drawn unit normals (gyro_n, acc_n) for the IMU —
    when given, no key is consumed (the orchard frame pre-draws a whole
    frame's noise in one batched call; also keeps RNG out of the Pallas
    fused-tick kernel)."""
    dt = params.dt_us.astype(jnp.float32) * 1e-6

    # 1. radio delivery (pushed >delay ago becomes visible to the logic now)
    ring, delivered, mtype, mflags, mfields = delayline.pop_due(
        s.ring, s.step, params.dt_us, params.radio_delay_us
    )

    # 2. physics
    new_plant, acc_imu = plant_mod.step(
        params.plant, s.plant, s.logic.des_motor_speeds,
        ext_force, ext_torque, dt,
    )

    # 3. IMU fabrication
    if noise is None:
        key, sub = jax.random.split(s.key)
        gyro_meas, acc_meas = plant_mod.imu_measurements(
            params.plant, new_plant, acc_imu, sub)
    else:
        key = s.key
        gyro_meas, acc_meas = plant_mod.imu_measurements(
            params.plant, new_plant, acc_imu, noise=noise)
    from agrifly_tpu.ops import lin3
    from agrifly_tpu.ops import rotation as rot

    gyro_true = lin3.mv3(params.plant.imu_rot_inv, new_plant.angvel)
    acc_true = lin3.mv3(params.plant.imu_rot_inv, rot.rotate_back(
        new_plant.att, acc_imu - plant_mod.GRAVITY
    ))
    gyro_meas = gyro_true + (gyro_meas - gyro_true) * params.noise_scale
    acc_meas = acc_true + (acc_meas - acc_true) * params.noise_scale
    return dict(
        ring=ring, delivered=delivered, mtype=mtype, mflags=mflags,
        mfields=mfields, plant=new_plant, key=key,
        gyro_meas=gyro_meas, acc_meas=acc_meas,
    )


def physics_tick(s: EnvState, params: EnvParams, ext_force, ext_torque,
                 use_estimator: bool, uwb_override=None, phase_a=None,
                 static_mocap_fire=None, static_gps_fire=None, noise=None):
    """Steps 1-5a of one tick: radio delivery, plant, IMU, UWB, onboard
    logic, mocap estimator update. Shared by env.step and the orchard env
    (which replaces the offboard block with trajectory tracking).

    uwb_override: optional (new, range, responder_id, failure) from an
    externally stepped (fleet-shared) network; suppresses the internal one.
    phase_a: optionally pass a precomputed physics_phase_a result (fleet
    envs run phase A for all vehicles first to feed the shared network).
    static_mocap_fire / static_gps_fire: optional *python* bools — the
    estimator cadences are deterministic functions of the step index, so a
    block-structured rollout can specialize each tick at trace time and
    skip the measurement-update work entirely on non-firing ticks
    (rollout_fast). None keeps the traced accumulator decision.
    Returns a dict with the partial new state + estimator output.
    """
    a = phase_a if phase_a is not None else physics_phase_a(
        s, params, ext_force, ext_torque, noise=noise)
    ring = a["ring"]
    delivered, mtype, mflags, mfields = a["delivered"], a["mtype"], a["mflags"], a["mfields"]
    new_plant = a["plant"]
    key = a["key"]
    gyro_meas, acc_meas = a["gyro_meas"], a["acc_meas"]

    # 3b. UWB ranging network (when anchors are configured). The default is
    # a *python* False: logic_step then skips the EKF range update at trace
    # time (XLA does not fold the masked covariance work away on its own).
    uwb_state = s.uwb
    uwb_new = False
    uwb_range = jnp.float32(0.0)
    uwb_responder = jnp.int32(0)
    uwb_failure = jnp.bool_(False)
    if uwb_override is not None:
        uwb_new, uwb_range, uwb_responder, uwb_failure = uwb_override
    elif params.uwb is not None:
        from agrifly_tpu.sim import uwb as uwb_mod

        n_radios = params.uwb.radio_ids.shape[0]
        positions = jnp.concatenate(
            [new_plant.pos[None, :], params.logic.target_positions[: n_radios - 1]],
            axis=0,
        )
        has_targets = params.logic.num_targets > 0
        my_target = jnp.where(
            has_targets, params.logic.target_ids[s.logic.next_target_idx], 0
        )
        next_ids = jnp.where(jnp.arange(n_radios) == 0, my_target, 0)
        uwb_state, meas = uwb_mod.step(
            params.uwb, uwb_state, positions, next_ids, params.dt_us
        )
        uwb_new = meas.valid
        uwb_range = meas.range
        uwb_responder = meas.responder_id
        uwb_failure = meas.failure

    # 4. onboard logic tick
    batt_v = params.logic.batt_critical * 1.2  # constant battery sim
    inputs = onboard.null_inputs()._replace(
        gyro=gyro_meas, acc=acc_meas, batt_voltage=batt_v,
        radio_new=delivered, radio_type=mtype, radio_flags=mflags,
        radio_fields=mfields,
        uwb_new=uwb_new, uwb_range=uwb_range,
        uwb_responder_id=uwb_responder, uwb_failure=uwb_failure,
    )
    new_logic, _ = onboard.logic_step(params.logic, s.logic, inputs)

    from agrifly_tpu.offboard import estimators

    now_us = (s.step + 1) * params.dt_us  # master time after this tick

    # 5a. estimator update streams
    # use_estimator: False = perfect state; True/"mocap" = 200 Hz mocap KF;
    # "gpsimu" = IMU-driven EKF + 100 Hz GPS fix (quad_gps_rates_control)
    est_mode = {False: "true", True: "mocap"}.get(use_estimator, use_estimator)
    mocap = s.mocap
    mocap_acc = s.mocap_acc_us + params.dt_us
    gpsimu = s.gpsimu
    gps_acc = s.gps_acc_us + params.dt_us
    if est_mode == "gpsimu":
        gpsimu = estimators.gpsimu_predict(
            gpsimu, acc_meas, gyro_meas, params.dt_us.astype(jnp.float32) * 1e-6
        )
        gfire = (gps_acc > jnp.int32(10000)) if static_gps_fire is None else static_gps_fire
        gps_acc = jnp.where(gfire, gps_acc - 10000, gps_acc)
        if static_gps_fire is not False:
            gpsimu = estimators.gps_position_update(gpsimu, new_plant.pos, gfire)
    if est_mode == "mocap":
        mfire = (mocap_acc > params.mocap_period_us) if static_mocap_fire is None else static_mocap_fire
        mocap_acc = jnp.where(mfire, mocap_acc - params.mocap_period_us, mocap_acc)
        if static_mocap_fire is not False:
            mocap_upd = estimators.mocap_update(
                mocap, now_us, new_plant.pos, new_plant.att, params.mocap_period_us
            )
            mocap = jax.tree_util.tree_map(
                lambda u, o: jnp.where(mfire, u, o), mocap_upd, mocap
            )

    if static_gps_fire is False:
        # statically non-firing offboard tick: the estimate is never
        # consumed, skip the prediction replay entirely
        z3 = jnp.zeros(3, jnp.float32)
        est_pos = est_vel = est_angvel = z3
        from agrifly_tpu.ops import rotation as _rot

        est_att = _rot.identity()
    elif est_mode == "mocap":
        est_pos, est_vel, est_att, est_angvel = estimators.mocap_get_prediction(
            mocap, now_us, params.est_latency_us
        )
    elif est_mode == "gpsimu":
        est_pos, est_vel, est_att, est_angvel = (
            gpsimu.pos, gpsimu.vel, gpsimu.att, gpsimu.angvel
        )
    else:
        est_pos, est_vel, est_att = new_plant.pos, new_plant.vel, new_plant.att
        est_angvel = new_plant.angvel

    return dict(
        plant=new_plant, logic=new_logic, ring=ring, key=key,
        uwb=uwb_state, mocap=mocap, mocap_acc_us=mocap_acc,
        gpsimu=gpsimu, gps_acc_us=gps_acc, now_us=now_us,
        est=(est_pos, est_vel, est_att, est_angvel),
    )


def _offboard_and_finish(params: EnvParams, s: EnvState, cmd: Command, half,
                         use_estimator: bool, ctrl_mode: str,
                         static_fire=None):
    from agrifly_tpu.offboard import estimators
    from agrifly_tpu.ops import rotation as rot

    new_plant = half["plant"]
    new_logic = half["logic"]
    ring = half["ring"]
    mocap = half["mocap"]
    now_us = half["now_us"]
    est_pos, est_vel, est_att, est_angvel = half["est"]

    # 5b. offboard control loop
    acc_us = s.offboard_acc_us + params.dt_us
    fire = (acc_us > params.offboard_period_us) if static_fire is None else static_fire
    acc_us = jnp.where(fire, acc_us - params.offboard_period_us, acc_us)

    if static_fire is False:
        # statically known non-firing tick: no offboard work at all
        new_state = EnvState(
            plant=new_plant, logic=new_logic, ring=ring,
            offboard_acc_us=acc_us, step=s.step + 1, key=half["key"],
            last_cmd_thrust=s.last_cmd_thrust, last_cmd_angvel=s.last_cmd_angvel,
            mocap=mocap, mocap_acc_us=half["mocap_acc_us"],
            gpsimu=half["gpsimu"], gps_acc_us=half["gps_acc_us"], uwb=half["uwb"],
        )
        outputs = StepOutputs(
            pos=new_plant.pos, vel=new_plant.vel, att=new_plant.att,
            angvel=new_plant.angvel, motor_speeds=new_plant.motor_speeds,
            flight_state=new_logic.fs, panic_reason=new_logic.panic_reason,
            warnings=new_logic.warnings,
        )
        return new_state, outputs

    cmd_angvel, cmd_thrust = offboard_ctrl.run(
        params.ctrl, est_pos, est_vel, est_att,
        cmd.des_pos, cmd.des_vel, cmd.des_acc, cmd.des_yaw,
    )
    if ctrl_mode == "rates":
        rtype, rflags, rfields = radio.make_rates_command(cmd_thrust, cmd_angvel)
    elif ctrl_mode == "position":
        # CTRL_ONBOARD_UWB path: forward the setpoint, onboard flies it
        rtype, rflags, rfields = radio.make_position_command(
            cmd.des_pos, cmd.des_vel, jnp.zeros(3, jnp.float32)
        )
    elif ctrl_mode == "idle":
        # keep the vehicle in FS_IDLE (motors off) while sensors/estimators
        # converge — the pad warm-up phase before a start command
        rtype, rflags, rfields = radio.make_idle_command()
    else:
        raise ValueError(f"unknown ctrl_mode {ctrl_mode}")
    ring = delayline.push(ring, rtype, rflags, rfields, s.step, fire)

    est_mode = {False: "true", True: "mocap"}.get(use_estimator, use_estimator)
    if est_mode == "mocap":
        # close the latency-compensation loop: commanded (angvel, acc) enter
        # the prediction pipe, becoming active after the transport delay
        pred_acc = rot.rotate(est_att, jnp.array([0.0, 0.0, 1.0], jnp.float32)) * cmd_thrust \
            + jnp.array([0.0, 0.0, -9.81], jnp.float32)
        mocap = estimators.mocap_set_predicted_values(
            mocap, now_us, params.est_latency_us, cmd_angvel, pred_acc, fire
        )

    last_thrust = jnp.where(fire, cmd_thrust, s.last_cmd_thrust)
    last_angvel = jnp.where(fire, cmd_angvel, s.last_cmd_angvel)

    new_state = EnvState(
        plant=new_plant, logic=new_logic, ring=ring,
        offboard_acc_us=acc_us, step=s.step + 1, key=half["key"],
        last_cmd_thrust=last_thrust, last_cmd_angvel=last_angvel,
        mocap=mocap, mocap_acc_us=half["mocap_acc_us"],
        gpsimu=half["gpsimu"], gps_acc_us=half["gps_acc_us"], uwb=half["uwb"],
    )
    outputs = StepOutputs(
        pos=new_plant.pos, vel=new_plant.vel, att=new_plant.att,
        angvel=new_plant.angvel, motor_speeds=new_plant.motor_speeds,
        flight_state=new_logic.fs, panic_reason=new_logic.panic_reason,
        warnings=new_logic.warnings,
    )
    return new_state, outputs


def rollout(params: EnvParams, state: EnvState, cmd: Command, n_steps: int,
            use_estimator: bool = False, ctrl_mode: str = "rates"):
    """Scan `step` over time with a fixed command. Returns (state, traj)."""

    def body(carry, _):
        new_state, out = step(params, carry, cmd, use_estimator, ctrl_mode)
        return new_state, out

    return jax.lax.scan(body, state, None, length=n_steps)


def rollout_sampled(params: EnvParams, state: EnvState, cmd: Command,
                    n_steps: int, sample_every: int):
    """Rollout keeping every `sample_every`-th output (cheaper traces)."""

    def outer(carry, _):
        def inner(c, _):
            ns, _ = step(params, c, cmd)
            return ns, None

        carry, _ = jax.lax.scan(inner, carry, None, length=sample_every - 1)
        new_state, out = step(params, carry, cmd)
        return new_state, out

    return jax.lax.scan(outer, state, None, length=n_steps // sample_every)
