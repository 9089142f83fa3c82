"""Wall-clock real-time sim mode (io/bridge.SimBridge.run_realtime).

The reference ships a real-time ROS simulator — HardwareTimer wall clock
with ros::Rate(500) pacing (AIFS_ROS/hiperlab_rostools/src/Simulator/
main.cpp:231,310) — alongside the lockstep sync_simulator. These tests
validate the wall-clock mode at a reduced rate on CPU: achieved tick
rate within the (scaled) monitor bands, drift-free absolute deadlines,
topic cadences still exact in sim time, and teleop-style command
retargeting through the callable-cmd hook.
"""

import numpy as np

from agrifly_tpu.io import bridge as bridge_mod
from agrifly_tpu.sim import env as env_mod
from agrifly_tpu.utils import monitor as monitor_mod


def _mk_bridge():
    params = env_mod.make_params(noise_scale=0.0)
    return bridge_mod.SimBridge(params, vehicle_id=1, seed=0)


def test_run_realtime_rates_within_bands():
    """At a reduced 100 Hz wall rate (CPU-friendly), the achieved tick
    rate is within +-2.5% of target (the mocap band 195-205 is +-2.5% of
    nominal) and the wall-clock mocap/telemetry topic rates land inside
    the reference health bands scaled by rate/nominal.

    Wall-clock pacing is inherently load-sensitive: on an oversubscribed
    CI box the scheduler can't honor the deadlines at all (the reference
    real-time node has the same failure mode — vehicle_monitor flags it).
    If most quanta missed their deadline the box was overloaded, not the
    pacing logic: skip instead of flaking."""
    import pytest

    br = _mk_bridge()
    cmd = env_mod.hover_command()
    report = br.run_realtime(1.2, cmd, rate_hz=100.0, block=2)

    if report["late_quanta"] > 0.2 * report["n_quanta"]:
        pytest.skip(f"host overloaded: {report['late_quanta']}/"
                    f"{report['n_quanta']} quanta late")
    target = report["target_tick_hz"]
    assert abs(report["achieved_tick_hz"] - target) / target < 0.025, report
    # scaled reference bands: mocap 195-205 -> 39-41 Hz at 1/5 rate, etc.
    assert report["bands_ok"], report
    assert all(report["bands_ok"].values()), report
    assert report["rate_scale"] == 100.0 / 500.0
    # cmd band is skipped when no commander publishes radio_command
    assert "cmd" not in report["bands_ok"]


def test_run_realtime_sim_cadence_unchanged():
    """Pacing only stretches wall time: per sim second the bridge still
    publishes exactly the reference counts (truth 500, mocap ~200, ...)."""
    br = _mk_bridge()
    cmd = env_mod.hover_command()
    report = br.run_realtime(0.5, cmd, rate_hz=250.0, block=5)
    ticks = report["ticks"] + 10  # + compile warm ticks
    sim_s = ticks * float(br.params.dt_us) * 1e-6
    counts = br.bus.counts
    assert counts["simulator_truth1"] == ticks
    assert abs(counts["mocap_output1"] / sim_s - 200.0) < 5.0
    assert abs(counts["telemetry1"] / sim_s - 100.0) < 5.0


def test_orchard_run_realtime_full_loop_paced():
    """OrchardBridge.run_realtime paces the FULL perception-plan-act loop
    (render -> RAPPIDS plan -> track) against the wall clock — the
    reference can only run this pipeline lockstep (sync_simulator waits
    on AirSim images; the real-time node has no planner in the loop).
    Validated at a reduced 2 Hz frame rate on CPU with a tiny image:
    achieved frame rate within 2.5%, per-frame topics in band, and a
    mid-run radio kill reaches the onboard FSM through the packed-carry
    block path."""
    import pytest

    from agrifly_tpu.io import messages as msgs
    from agrifly_tpu.io import radio as radio_codec
    from agrifly_tpu.models import logic as onboard
    from agrifly_tpu.sim import orchard_env

    params = orchard_env.make_params(width=32, height=24, n_candidates=8,
                                     use_pallas=False)
    ob = bridge_mod.OrchardBridge(params, vehicle_id=1, seed=0,
                                  publish_images=False)
    rows = []

    def on_quantum(b, k):
        rows.append(int(b.last_outs["step"][-1]))
        if k == 3:
            raw = radio_codec.fields_to_bytes(
                *radio_codec.make_kill_command())
            b.bus.publish("radio_command1", msgs.RadioCommand(raw=raw))

    report = ob.run_realtime(3.0, rate_hz=2.0, on_quantum=on_quantum)

    if report["late_quanta"] > 0.2 * report["n_quanta"]:
        pytest.skip(f"host overloaded: {report['late_quanta']}/"
                    f"{report['n_quanta']} quanta late")
    target = report["target_frame_hz"]
    assert target == 2.0
    assert abs(report["achieved_frame_hz"] - target) / target < 0.025, report
    assert report["bands_ok"] and all(report["bands_ok"].values()), report
    assert report["frames"] == report["n_quanta"]
    # sim time advanced exactly one frame per quantum (cadence unchanged)
    spf = int(params.steps_per_frame)
    assert [r - rows[0] for r in rows] == [spf * i for i in range(len(rows))]
    # the k=3 kill crossed the codec + 30 ms delay line inside the next
    # quantum's block and latched the onboard FSM
    assert int(ob.last_outs["flight_state"][-1]) == onboard.FS_KILLED
    # no images requested -> none published
    assert report["topic_hz"]["depth"] == 0.0


def test_run_realtime_monitor_and_teleop_hook():
    """A VehicleMonitor on wall time sees in-band (scaled) rates live,
    and a callable cmd retargets the setpoint mid-run (the teleop path);
    a kill published on radio_command1 mid-run reaches the onboard FSM
    through the real codec + delay line."""
    from agrifly_tpu.io import messages as msgs
    from agrifly_tpu.io import radio as radio_codec
    from agrifly_tpu.models import logic as onboard

    br = _mk_bridge()
    mon = monitor_mod.VehicleMonitor(br.bus, 1, use_sim_time=False)
    ctl = {"cmd": env_mod.hover_command(des_pos=(0.0, 0.0, 0.0))}
    seen = []

    def on_quantum(b, k):
        if k == 10:
            ctl["cmd"] = env_mod.hover_command(des_pos=(0.0, 0.0, 1.5))
        if k == 30:
            raw = radio_codec.fields_to_bytes(
                *radio_codec.make_kill_command())
            b.bus.publish("radio_command1", msgs.RadioCommand(raw=raw))
        if k == 55:
            st = mon.status()
            seen.append(st)

    report = br.run_realtime(
        1.2, lambda: ctl["cmd"], rate_hz=100.0, block=2,
        on_quantum=on_quantum)
    assert report["bands_ok"]["mocap"] and report["bands_ok"]["telemetry"], report
    # the monitor's sliding-window mocap rate was in the scaled band live
    assert seen, "monitor snapshot not taken"
    rate, _ok_unscaled = seen[0]["mocap"][0], seen[0]["mocap"][1]
    lo, hi = monitor_mod.BANDS["mocap"]
    scale = report["rate_scale"]
    assert lo * scale <= rate <= hi * scale, (rate, scale)
    # the mid-run kill reached the onboard state machine over the wire
    assert int(br.state.logic.fs) == onboard.FS_KILLED
    # a single kill is NOT a 50 Hz commander: the band check flags it,
    # exactly as the reference vehicle_monitor would
    assert report["bands_ok"].get("cmd") is False
