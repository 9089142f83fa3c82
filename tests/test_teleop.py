"""Teleop front-end: scripted joystick + keyboard bindings."""

import io

from agrifly_tpu.io import bridge, messages, teleop


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
