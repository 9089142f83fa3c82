"""One-command bringup (agrifly_tpu.launch — agrifly.launch parity).

Wires OrchardBridge + MessageRecorder + VehicleMonitor + teleop in one
command. The scripted operator arms the mission at t=0.2 s and kills at
t=1.5 s; the kill must travel the real radio wire (bus -> codec ->
delay line -> onboard FSM) and the bag must contain the full topic
surface including the operator's radio_command.
"""

import json

from agrifly_tpu import launch
import pytest


@pytest.mark.slow
def test_launch_bringup_arm_kill_bag(tmp_path):
    bag = tmp_path / "bag.jsonl"
    rc = launch.main([
        "--cpu", "--image", "64x48", "--candidates", "16",
        "--frames", "80", "--record", str(bag),
        "--teleop", "scripted:0.2:buttonStart,1.5:buttonRed",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in bag.read_text().splitlines()]
    topics = {l["topic"] for l in lines}
    # full topic surface in the bag (image topics excluded like the
    # reference's rosbag script; the handshake flag is not an image)
    for t in ("simulator_truth1", "planner_diagnostics1",
              "controller_diagnostics1", "imageReceivedFlag1",
              "radio_command1"):
        assert t in topics, (t, sorted(topics)[:20])
    assert "depthImage1" not in topics
    # the operator kill is in the bag exactly once
    assert sum(l["topic"] == "radio_command1" for l in lines) == 1


def test_launch_auto_start(tmp_path):
    bag = tmp_path / "bag.jsonl"
    rc = launch.main([
        "--cpu", "--image", "64x48", "--candidates", "16",
        "--frames", "12", "--record", str(bag), "--auto-start",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in bag.read_text().splitlines()]
    assert sum(l["topic"] == "simulator_truth1" for l in lines) == 12
