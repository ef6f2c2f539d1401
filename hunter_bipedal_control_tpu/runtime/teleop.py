"""Operator / gamepad command layer (SURVEY.md L7).

Parity target: the reference drives the stack from a gamepad through
``joy_teleop`` with the mapping in legged_controllers/config/joy.yaml:1-87 —
axes scaled onto /cmd_vel (and a body_rotation twist), deadman-gated buttons
toggling /load_controller, /set_walk, /emergency_stop, /stance_switch,
/bodyrotation_switch — plus a keyboard script publishing ±0.35 m/s
(README.md keyboard example).

Here the same mapping is a pure function: a raw (axes, buttons) gamepad
sample -> a ``TeleopCommand``; the runtime consumes the fields exactly where
it consumes the reference's topics (cmd_vel -> ``filter_cmd_vel``/targets,
set_walk/emergency_stop -> ``control_tick``).  ``load_joy_yaml`` parses the
reference's own joy.yaml so a deployment can keep its tuned file.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class AxisMapping:
    """One `axis_mappings` entry (joy.yaml): axis or button -> target field."""

    target: str
    scale: float
    axis: Optional[int] = None
    button: Optional[int] = None
    offset: float = 0.0


@dataclass(frozen=True)
class TopicMapping:
    """One teleop topic block: deadman-gated set of axis/button mappings."""

    name: str
    deadman_buttons: Tuple[int, ...]
    mappings: Tuple[AxisMapping, ...]


@dataclass(frozen=True)
class TeleopConfig:
    topics: Tuple[TopicMapping, ...]

    def topic(self, name: str) -> TopicMapping:
        for t in self.topics:
            if t.name == name:
                return t
        raise KeyError(name)


def default_teleop_config() -> TeleopConfig:
    """The values of legged_controllers/config/joy.yaml:1-87 verbatim."""
    return TeleopConfig(topics=(
        TopicMapping("walk", (4,), (
            AxisMapping("angular.z", 1.5, axis=3),
            AxisMapping("linear.x", 0.3, axis=1),
            AxisMapping("linear.y", 0.3, axis=0),
        )),
        TopicMapping("body_rotation", (), (
            AxisMapping("angular.x", -0.261, axis=3),
            AxisMapping("angular.y", 0.523, axis=1),
            AxisMapping("angular.z", 0.523, axis=0),
        )),
        TopicMapping("bodyrotation_switch", (1,), (
            AxisMapping("data", 2.0, button=1),
        )),
        TopicMapping("load_controller", (7,), (
            AxisMapping("data", 2.0, button=7),
        )),
        TopicMapping("emergency_stop", (3,), (
            AxisMapping("data", 2.0, button=3),
        )),
        TopicMapping("set_walk", (5,), (
            AxisMapping("data", 2.0, button=5),
        )),
        TopicMapping("stance_switch", (5, 0), (
            AxisMapping("data", 2.0, button=0, offset=1.0),
        )),
    ))


def load_joy_yaml(path: str) -> TeleopConfig:
    """Parse a joy_teleop YAML file (the reference's config/joy.yaml format)."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    topics: List[TopicMapping] = []
    for name, block in doc["teleop"].items():
        maps = tuple(
            AxisMapping(
                target=m["target"],
                scale=float(m.get("scale", 1.0)),
                axis=m.get("axis"),
                button=m.get("button"),
                offset=float(m.get("offset", 0.0)),
            )
            for m in block.get("axis_mappings", ())
        )
        topics.append(TopicMapping(
            name=name,
            deadman_buttons=tuple(block.get("deadman_buttons", ())),
            mappings=maps,
        ))
    return TeleopConfig(topics=tuple(topics))


@dataclass
class TeleopCommand:
    """One evaluated gamepad sample, in the units the runtime consumes."""

    cmd_vel: np.ndarray                  # (4,) vx, vy, vz, yaw_rate (base frame)
    body_rotation: np.ndarray            # (3,) roll/pitch/yaw rate command
    load_controller: bool
    set_walk: bool
    emergency_stop: bool
    stance_switch: bool
    bodyrotation_switch: bool


def _deadman_ok(topic: TopicMapping, buttons: np.ndarray) -> bool:
    return all(b < len(buttons) and buttons[b] > 0 for b in topic.deadman_buttons)


def _eval_topic(topic: TopicMapping, axes: np.ndarray, buttons: np.ndarray
                ) -> Dict[str, float]:
    if not _deadman_ok(topic, buttons):
        return {}
    out: Dict[str, float] = {}
    for m in topic.mappings:
        raw = axes[m.axis] if m.axis is not None else float(buttons[m.button])
        out[m.target] = m.scale * raw + m.offset
    return out


def evaluate(cfg: TeleopConfig, axes, buttons) -> TeleopCommand:
    """Map one raw gamepad sample to runtime commands (joy_teleop semantics:
    a topic publishes only while every deadman button is held; button topics
    publish scale*state+offset, read here as a >0 trigger)."""
    axes = np.asarray(axes, np.float64)
    buttons = np.asarray(buttons, np.int32)

    walk = _eval_topic(cfg.topic("walk"), axes, buttons)
    rot = _eval_topic(cfg.topic("body_rotation"), axes, buttons)

    def trig(name: str) -> bool:
        vals = _eval_topic(cfg.topic(name), axes, buttons)
        return bool(vals) and next(iter(vals.values())) > 0.0

    return TeleopCommand(
        cmd_vel=np.array([
            walk.get("linear.x", 0.0), walk.get("linear.y", 0.0),
            walk.get("linear.z", 0.0), walk.get("angular.z", 0.0),
        ]),
        body_rotation=np.array([
            rot.get("angular.x", 0.0), rot.get("angular.y", 0.0),
            rot.get("angular.z", 0.0),
        ]),
        load_controller=trig("load_controller"),
        set_walk=trig("set_walk"),
        emergency_stop=trig("emergency_stop"),
        stance_switch=trig("stance_switch"),
        bodyrotation_switch=trig("bodyrotation_switch"),
    )


def keyboard_cmd_vel(key: str, speed: float = 0.35) -> np.ndarray:
    """The README keyboard script: w/s -> ±0.35 m/s forward, a/d -> lateral,
    q/e -> yaw, anything else -> stop."""
    table = {
        "w": (speed, 0.0, 0.0, 0.0), "s": (-speed, 0.0, 0.0, 0.0),
        "a": (0.0, speed, 0.0, 0.0), "d": (0.0, -speed, 0.0, 0.0),
        "q": (0.0, 0.0, 0.0, 1.0), "e": (0.0, 0.0, 0.0, -1.0),
    }
    return np.array(table.get(key, (0.0, 0.0, 0.0, 0.0)))
