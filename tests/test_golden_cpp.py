"""Golden tests against the COMPILED REFERENCE C++ stack.

`native/golden/trace_gen.cpp` builds the actual reference sources
(Quadcopter_T + Motor + QuadcopterLogic + KalmanFilter6DOF +
MocapStateEstimator + QuadcopterController, unmodified from
/root/reference, Eigen via the tensorflow-bundled headers, -std=c++17)
and runs the renderer-free Rappids_Simulator loop; `tests/_golden_cpp.py`
converts its dumps into the checked-in cpp_*_v1.npz goldens
(regenerate: native/golden/regen.sh && python -m tests._golden_cpp convert).

Four comparison tiers, each isolating one subsystem by teacher-forcing
the reference's exact inputs into it:

  plant      per-step: framework f32 plant stepped FROM the C++ f64 state
             with the C++'s exact f32 motor commands, compared one tick
             later. No accumulation — bounds are single-step f32 rounding
             (motor speeds are bit-exact; the preset's motorTimeConst=0
             makes them pure clamps of f32 inputs).
  logic      sequential: the full onboard logic driven by the C++'s exact
             raw f32 IMU measurements and radio wire bytes; every internal
             stage compared per tick against the logicdbg dump. Fstate,
             gyro bias and the onboard-KF position/velocity are BIT-EXACT
             over the full 5 s; the lowpass chain carries a ~3e-5 bound
             because XLA:CPU contracts mul+add into FMA (higher
             intermediate precision) — a pure-numpy mirror of the same
             expression tree is bit-identical to the C++
             (LowPassFilterSecondOrder.hpp:54-58).
  estimator  sequential: MocapStateEstimator fed the C++'s exact truth
             poses and commands, internals compared per mocap tick against
             the estdbg dump (f32 framework vs f64 reference; in a
             f64-forced run the match is ~1e-11, i.e. semantics-exact —
             including the quirk that the init-adoption path does NOT
             reset the estimate timestamp, MocapStateEstimator.cpp:120-133).
  closed     the full coupled loop (plant+logic+estimator+controller+radio)
             re-run by the framework with the C++'s exact IMU noise draws;
             trajectory divergence is f32-vs-f64 chaos accumulation,
             bounded at mm/cm over 5 s. Radio command packets: headers
             bit-equal, quantized codes within a few LSB.

The offboard controller is compared only through the closed-loop command
stream: its reduced-attitude formula takes acos of a near-1 dot product
(QuadcopterController.cpp:49-66, QuadcopterAttitudeController.hpp:39-68),
whose f32 conditioning (d acos/d cos ~ 1/angle) puts an intrinsic
~1e-2 rad/s floor on near-hover agreement between ANY two correct
implementations — the C++'s own f32 `Vec3f` cast of its f64 inputs incurs
the same error against itself.
"""

import numpy as np
import pytest

from tests import _golden_cpp as G

# closed-loop configs: (mode, run_framework kwargs)
CLOSED_KW = {
    "hover_est": ("est", {}),
    "hover_truth": ("truth", {}),
    "step_est": ("est", dict(des_pos=(0.0, 0.0, 3.5), step_t_us=2_000_000,
                             step_pos=(1.0, 1.0, 2.0))),
}


def _load(config):
    try:
        return G.load(config)
    except FileNotFoundError:  # pragma: no cover
        pytest.skip(f"golden npz for {config} not generated")


# ---------------------------------------------------------------------------
# tier 1: teacher-forced plant (per-step, vmapped — fast, quick suite)
# ---------------------------------------------------------------------------

PLANT_TOL = dict(pos=1.5e-6, vel=1e-6, att=6e-7, angvel=2e-6)


@pytest.mark.parametrize("config", G.CONFIGS)
def test_plant_teacher_forced(config):
    import jax
    import jax.numpy as jnp

    from agrifly_tpu.models import constants as qconst
    from agrifly_tpu.models import plant as plant_mod

    tr = _load(config)
    truth = np.asarray(tr["truth"])
    speeds = np.asarray(tr["mot_speeds"])
    cmds = np.asarray(tr["mot_cmds"])
    flags = np.asarray(tr["flags"])

    v = qconst.vehicle_params(qconst.QC_TYPE_CF_MINIQUAD)
    p = plant_mod.make_params(v)
    z3 = jnp.zeros(3, jnp.float32)

    ks = np.nonzero(flags[1:, 0] == 1)[0]  # tick k+1 integrated: step k->k+1
    assert len(ks) > 2000
    state = plant_mod.PlantState(
        pos=jnp.asarray(truth[ks, 0:3], jnp.float32),
        vel=jnp.asarray(truth[ks, 3:6], jnp.float32),
        att=jnp.asarray(truth[ks, 6:10], jnp.float32),
        angvel=jnp.asarray(truth[ks, 10:13], jnp.float32),
        motor_speeds=jnp.asarray(speeds[ks], jnp.float32),
    )
    step_v = jax.jit(jax.vmap(
        lambda s, c: plant_mod.step(p, s, c, z3, z3, 1.0 / 500.0)[0]))
    out = step_v(state, jnp.asarray(cmds[ks]))

    ref = truth[ks + 1]
    for name, got, want in [
        ("pos", out.pos, ref[:, 0:3]), ("vel", out.vel, ref[:, 3:6]),
        ("att", out.att, ref[:, 6:10]), ("angvel", out.angvel, ref[:, 10:13]),
    ]:
        d = np.abs(np.asarray(got, np.float64) - want).max()
        assert d < PLANT_TOL[name], f"{config}/{name}: {d:.3e}"
    # motor speeds reproduce the f64 chain bit-exactly (f32-representable)
    d = np.abs(np.asarray(out.motor_speeds, np.float64) - speeds[ks + 1]).max()
    assert d == 0.0, f"{config}/speeds: {d:.3e}"


# ---------------------------------------------------------------------------
# tier 2: teacher-forced onboard logic (sequential)
# ---------------------------------------------------------------------------

LOGIC_EXACT = ("fstate", "bias", "kf_pos", "kf_vel")
LOGIC_TOL = dict(radio=3e-7, gyro_lp=2e-5, acc_lp=1.3e-4, kf_att=8e-6,
                 kf_angvel=2e-5, cmds=2e-3)


def _check_logic(config, n_ticks):
    tr = _load(config)
    r = G.run_logic_replay(tr, n_ticks)
    for name in LOGIC_EXACT:
        d = np.abs(r["got"][:, r["slices"][name]]
                   - r["want"][:, r["slices"][name]]).max()
        assert d == 0.0, f"{config}/{name} not bit-exact: {d:.3e}"
    for name, tol in LOGIC_TOL.items():
        d = np.abs(r["got"][:, r["slices"][name]]
                   - r["want"][:, r["slices"][name]]).max()
        assert d < tol, f"{config}/{name}: {d:.3e} >= {tol}"
    # telemetry wire: packet numbers equal, quantized codes within a few
    # LSB (the FMA-level lowpass deltas flip codes at bin boundaries)
    tg, tw = r["tel_got"], r["tel_want"]
    assert (tg[:, 0] == tw[:, 0]).all(), "telemetry packet numbers differ"
    dd = np.abs(tg[:, 1:] - tw[:, 1:])
    assert dd.max() <= 32, f"telemetry code delta {dd.max()}"
    frac = (dd > 0).mean()
    assert frac < 0.01, f"telemetry code mismatch fraction {frac:.4f}"


def test_logic_teacher_forced_quick():
    _check_logic("hover_est", 600)


@pytest.mark.slow
@pytest.mark.parametrize("config", G.CONFIGS)
def test_logic_teacher_forced_full(config):
    _check_logic(config, None)


# ---------------------------------------------------------------------------
# tier 3: teacher-forced mocap estimator (sequential, est configs)
# ---------------------------------------------------------------------------

EST_TOL = dict(pos=5e-6, vel=8e-5, att=1e-5, angvel=1e-5,
               var_pos=2e-2, var_att=2e-2)


def _check_estimator(config, n_ticks):
    tr = _load(config)
    r = G.run_estimator_replay(tr, n_ticks)
    assert len(r["got"]) > 100
    for name, tol in EST_TOL.items():
        d = np.abs(r["got"][:, r["slices"][name]]
                   - r["want"][:, r["slices"][name]]).max()
        assert d < tol, f"{config}/{name}: {d:.3e} >= {tol}"


def test_estimator_teacher_forced_quick():
    _check_estimator("hover_est", 600)


@pytest.mark.slow
@pytest.mark.parametrize("config", ["hover_est", "step_est"])
def test_estimator_teacher_forced_full(config):
    _check_estimator(config, None)


# ---------------------------------------------------------------------------
# tier 4: closed loop (slow — full coupled rollouts)
# ---------------------------------------------------------------------------

CLOSED_TOL = dict(pos=2e-2, vel=5e-2, att=8e-3, angvel=1e-1)


def _check_closed(config, n_ticks=None):
    tr = _load(config)
    mode, kw = CLOSED_KW[config]
    res = G.run_framework(tr, mode, n_ticks=n_ticks, **kw)
    n = len(res["truth"])
    ref = np.asarray(tr["truth"])[:n]
    fw = res["truth"]
    for name, s in [("pos", slice(0, 3)), ("vel", slice(3, 6)),
                    ("att", slice(6, 10)), ("angvel", slice(10, 13))]:
        d = np.abs(fw[:, s] - ref[:, s]).max()
        assert d < CLOSED_TOL[name], f"{config}/{name}: {d:.3e}"

    # radio command wire packets: headers bit-equal, codes within a few LSB
    off_k = np.asarray(tr["off_k"])
    sel = off_k < n
    m = min(len(res["raw"]), int(sel.sum()))
    assert m > 50
    raw_ref = np.asarray(tr["off_raw"])[sel][:m]
    raw_fw = np.array([np.frombuffer(r, np.uint8) for r in res["raw"][:m]])
    assert (raw_ref[:, :3] == raw_fw[:, :3]).all(), "radio headers differ"
    # CreateRatesCommand writes fields 0..3 (RadioTypes.hpp:159-172);
    # bytes 11..22 are uninitialized stack in the reference
    c_ref = ((raw_ref[:, 3:11:2].astype(np.int32) << 8)
             | raw_ref[:, 4:12:2].astype(np.int32))
    c_fw = ((raw_fw[:, 3:11:2].astype(np.int32) << 8)
            | raw_fw[:, 4:12:2].astype(np.int32))
    dc = np.abs(c_ref - c_fw)
    assert dc.max() <= 96, f"radio code delta {dc.max()}"
    assert dc.mean() <= 12, f"radio mean code delta {dc.mean():.2f}"

    # command stream
    off_cmd = np.asarray(tr["off_cmd"])[sel][:m]
    fw_thrust = np.array([c[1] for c in res["cmd"]])[:m]
    fw_ang = np.array([c[2] for c in res["cmd"]])[:m]
    # thrust spikes transiently during the step response (acos
    # conditioning + f32 transient sensitivity); 4e-2 on a 9.81 scale
    assert np.abs(fw_thrust - off_cmd[:, 0]).max() < 4e-2
    assert np.abs(fw_ang - off_cmd[:, 1:4]).max() < 1e-1

    if mode == "est":
        off_est = np.asarray(tr["off_est"])[sel][:m]
        ep = np.array([e[1] for e in res["est"]])[:m]
        assert np.abs(ep - off_est[:, 0:3]).max() < CLOSED_TOL["pos"]


def test_closed_loop_quick():
    _check_closed("hover_est", n_ticks=600)


@pytest.mark.slow
@pytest.mark.parametrize("config", list(CLOSED_KW))
def test_closed_loop_full(config):
    _check_closed(config)
