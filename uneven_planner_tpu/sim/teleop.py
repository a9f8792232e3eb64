"""Keyboard teleoperation of the simulated car.

ROS-free equivalent of the reference teleop node (reference:
carsim/scripts/keyboard_control.py:1-137): WASD key state drives bang-bang
commands (v = ±max_velocity, steer = ±max_steering_angle) published at
20 Hz only while a key is held; pressing an opposite key cancels the other
direction (keydown semantics at keyboard_control.py:44-62).  The key-state
machine and command mapping are pure and tested; `main()` wraps them in a
raw-terminal stdin loop stepping the kinematic plant
(sim.rollout.plant_step) — no Tk, no ROS.
"""

from __future__ import annotations

import dataclasses

MAX_VELOCITY = 1.0          # keyboard_control.py:101
MAX_STEER = 0.5             # keyboard_control.py:102


@dataclasses.dataclass
class TeleopState:
    """Held-key state [up, left, down, right] (keyboard_control.py:19)."""
    up: bool = False
    left: bool = False
    down: bool = False
    right: bool = False

    @property
    def active(self) -> bool:
        return self.up or self.left or self.down or self.right


def key_down(s: TeleopState, key: str) -> TeleopState:
    """keydown transition: opposite keys cancel
    (keyboard_control.py:44-62)."""
    if key == "w":
        return dataclasses.replace(s, up=True, down=False)
    if key == "a":
        return dataclasses.replace(s, left=True, right=False)
    if key == "s":
        return dataclasses.replace(s, down=True, up=False)
    if key == "d":
        return dataclasses.replace(s, right=True, left=False)
    return s


def key_up(s: TeleopState, key: str) -> TeleopState:
    """keyup transition (keyboard_control.py:30-41)."""
    m = {"w": "up", "a": "left", "s": "down", "d": "right"}
    if key in m:
        return dataclasses.replace(s, **{m[key]: False})
    return s


def command(s: TeleopState, max_velocity: float = MAX_VELOCITY,
            max_steer: float = MAX_STEER):
    """(v, steer) Twist equivalent, or None when no key is held (the
    reference publishes nothing then, keyboard_control.py:66-68)."""
    if not s.active:
        return None
    v = max_velocity if s.up else (-max_velocity if s.down else 0.0)
    st = max_steer if s.left else (-max_steer if s.right else 0.0)
    return (v, st)


def main(scene: str = "hill", rate_hz: float = 20.0):  # pragma: no cover
    """Interactive stdin teleop: WASD to drive (toggle semantics — raw
    terminals deliver no key-release events, so each press toggles the
    held-state bit), q to quit.  Prints the SE(3) pose each tick."""
    import select
    import sys
    import termios
    import time
    import tty

    import jax.numpy as jnp
    import numpy as np

    from uneven_planner_tpu import api
    from uneven_planner_tpu.config import scene_config
    from uneven_planner_tpu.sim import ackermann, rollout

    scfg, grid = api.load_or_build_scene(scene)
    state = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    ts = TeleopState()
    dt = 1.0 / rate_hz
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    try:
        print("WASD to toggle drive keys, q to quit")
        while True:
            if select.select([sys.stdin], [], [], dt)[0]:
                ch = sys.stdin.read(1)
                if ch == "q":
                    break
                # toggle: flip the bit this key controls
                cur = getattr(ts, {"w": "up", "a": "left", "s": "down",
                                   "d": "right"}.get(ch, "up"), False)
                ts = (key_up if cur else key_down)(ts, ch)
            cmd = command(ts)
            if cmd is not None:
                state = rollout.plant_step(state, jnp.asarray(cmd),
                                           scfg.mpc, dt)
            p, q = ackermann.world_tf(grid, state)
            print(f"\rpos=({float(p[0]):+.2f}, {float(p[1]):+.2f}, "
                  f"{float(p[2]):+.2f}) cmd={cmd}", end="", flush=True)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        print()


if __name__ == "__main__":  # pragma: no cover
    main()
