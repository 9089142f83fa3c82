"""Teleoperation: keyboard/joystick front-end for mission control.

Equivalent of AIFS_ROS/hiperlab_hardware (joystickmain.cpp /
keyboardmain.cpp): maps operator input onto `joystick_values` messages at
100 Hz. The keyboard variant reads single characters (termios raw mode
when attached to a TTY) with the reference's bindings — 's' = start,
'a'/'b'/'x'/'y' = the four buttons (keyboardmain.cpp:26-30,63-78) — and is
"NOT for actual flight, only for testing in simulation", like the
original. A ScriptedJoystick replays a button/axis timeline for tests and
headless runs.
"""

from __future__ import annotations

import select
import sys
from typing import Iterable, Tuple

from agrifly_tpu.io import messages as msgs

KEY_BINDINGS = {
    "s": "buttonStart",
    "a": "buttonGreen",
    "b": "buttonRed",
    "x": "buttonBlue",
    "y": "buttonYellow",
}

RATE_HZ = 100


class ScriptedJoystick:
    """Deterministic joystick: a list of (time_s, button_name) presses."""

    def __init__(self, presses: Iterable[Tuple[float, str]] = ((0.5, "buttonStart"),)):
        self.presses = sorted(presses)
        self._i = 0

    def poll(self, t: float) -> msgs.JoystickValues:
        msg = msgs.JoystickValues(header=msgs.Header(stamp=t))
        while self._i < len(self.presses) and self.presses[self._i][0] <= t:
            setattr(msg, self.presses[self._i][1], 1)
            self._i += 1
        return msg


class KeyboardJoystick:
    """Non-blocking keyboard poller emitting joystick_values."""

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stdin
        self._raw = False
        if hasattr(self.stream, "fileno") and self.stream.isatty():
            import termios, tty  # noqa

            self._fd = self.stream.fileno()
            self._saved = termios.tcgetattr(self._fd)
            tty.setcbreak(self._fd)
            self._raw = True

    def close(self):
        if self._raw:
            import termios

            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)
            self._raw = False

    def _read_keys(self):
        keys = []
        while True:
            r, _, _ = select.select([self.stream], [], [], 0)
            if not r:
                break
            ch = self.stream.read(1)
            if not ch:
                break
            keys.append(ch.lower())
        return keys

    def poll(self, t: float) -> msgs.JoystickValues:
        msg = msgs.JoystickValues(header=msgs.Header(stamp=t))
        for ch in self._read_keys():
            attr = KEY_BINDINGS.get(ch)
            if attr:
                setattr(msg, attr, 1)
        return msg


def publish_loop(bus, joystick, duration_s, dt=1.0 / RATE_HZ, topic="joystick_values"):
    """Pump joystick_values onto a TopicBus at 100 Hz of *sim* time."""
    t = 0.0
    n = int(duration_s / dt)
    for _ in range(n):
        t += dt
        bus.publish(topic, joystick.poll(t))
