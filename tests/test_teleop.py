"""Teleop front-end: scripted joystick + keyboard bindings."""

import io

from agrifly_tpu.io import bridge, messages, teleop
import pytest


def test_scripted_joystick_start_press():
    js = teleop.ScriptedJoystick([(0.5, "buttonStart"), (1.0, "buttonRed")])
    assert js.poll(0.1).buttonStart == 0
    m = js.poll(0.6)
    assert m.buttonStart == 1 and m.buttonRed == 0
    m = js.poll(1.2)
    assert m.buttonRed == 1


def test_keyboard_bindings_from_stream():
    stream = io.StringIO("sx")
    # StringIO has no fileno/isatty-tty path; patch poll's reader directly
    kb = teleop.KeyboardJoystick.__new__(teleop.KeyboardJoystick)
    kb.stream = stream
    kb._raw = False
    kb._read_keys = lambda: list(stream.read())
    m = kb.poll(0.0)
    assert m.buttonStart == 1  # 's'
    assert m.buttonBlue == 1  # 'x'


def test_publish_loop_rate():
    bus = bridge.TopicBus()
    got = []
    bus.subscribe("joystick_values", got.append)
    js = teleop.ScriptedJoystick([(0.25, "buttonStart")])
    teleop.publish_loop(bus, js, duration_s=1.0)
    assert len(got) == 100
    assert any(m.buttonStart for m in got)


def test_linux_joystick_event_decoding():
    """LinuxJoystick decodes the Linux js_event stream with the Xbox-360
    mapping (joystickmain.cpp:28-42,65-85): axes normalized to [-1,1] with
    the reference signs, buttons by number."""
    import io as _io
    import struct

    from agrifly_tpu.io import teleop

    def ev(etype, number, value):
        return struct.pack("<IhBB", 0, value, etype, number)

    stream = _io.BytesIO(
        ev(teleop.JS_EVENT_AXIS | teleop.JS_EVENT_INIT, teleop.XBOX_AXIS_THRUST, 0)
        + ev(teleop.JS_EVENT_AXIS, teleop.XBOX_AXIS_THRUST, -(1 << 14))  # half up
        + ev(teleop.JS_EVENT_AXIS, teleop.XBOX_AXIS_YAW, 1 << 14)
        + ev(teleop.JS_EVENT_AXIS, teleop.XBOX_AXIS_PITCH, -(1 << 15) + 1)
        + ev(teleop.JS_EVENT_BUTTON, 7, 1)  # start
        + ev(teleop.JS_EVENT_BUTTON, 1, 1)  # red
    )
    js = teleop.LinuxJoystick(stream=stream)
    msg = js.poll(0.1)
    thrust, yaw, pitch, roll = msg.axes
    assert abs(thrust - 0.5) < 1e-6      # sign_thrust = -1
    assert abs(yaw - 0.5) < 1e-6         # sign_yaw = +1
    assert pitch > 0.999                 # sign_pitch = -1
    assert roll == 0.0
    assert msg.buttonStart == 1 and msg.buttonRed == 1
    assert msg.buttonGreen == 0

    # button release arrives later
    stream2 = _io.BytesIO(ev(teleop.JS_EVENT_BUTTON, 7, 0))
    js._read = stream2.read
    msg2 = js.poll(0.2)
    assert msg2.buttonStart == 0
    assert abs(msg2.axes[0] - 0.5) < 1e-6  # axes latch between events


def test_linux_joystick_no_device():
    from agrifly_tpu.io import teleop

    try:
        js = teleop.LinuxJoystick(device="/nonexistent/js99")
    except OSError as e:
        assert "joystick" in str(e)
    else:
        js.close()  # a real device existed; fine


@pytest.mark.slow
def test_scripted_joystick_drives_demo_arm_fly_kill(capsys):
    """Operator-in-the-loop end-to-end through the demo CLI: the start
    button arms the mission (flight begins only then), and the red button
    sends an emergency-kill through the real radio codec + delay line,
    landing as FS_KILLED / KILLED_EXTERNALLY onboard (keyboardmain.cpp /
    VehicleMonitor operator-flow parity)."""
    from agrifly_tpu import demo

    rc = demo.main([
        "--cpu", "--image", "96x72", "--candidates", "32", "--frames", "120",
        "--teleop", "scripted:0.3:buttonStart,2.5:buttonRed",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ARMED" in out
    assert "KILL — emergency-kill on the radio" in out
    assert "KILLED_EXTERNALLY" in out
    assert "vehicle KILLED" in out
    # armed before killed, and the kill took effect after the radio delay
    assert out.index("ARMED") < out.index("KILL") < out.index("vehicle KILLED")
