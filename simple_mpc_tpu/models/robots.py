"""Packaged robot loaders — the example-robot-data equivalent.

Each loader parses the shipped URDF and registers the reference
configuration used by the examples/tests (reference: tests/test_utils.cpp
"half_sitting"/"standing"; examples/go2_kinodynamics.py:20-23).
"""
from __future__ import annotations

import os

import numpy as np

from .model import RobotModel
from .urdf import load_urdf

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def load_go2() -> RobotModel:
    model = load_urdf(os.path.join(_ASSETS, "go2.urdf"), name="go2")
    q = model.neutral()
    q[2] = 0.325
    # (hip, thigh, calf) per leg, order FL FR RL RR
    for i in range(4):
        q[7 + 3 * i: 10 + 3 * i] = [0.0, 0.8, -1.6]
    model.reference_configurations["standing"] = q
    return model


def load_solo12() -> RobotModel:
    model = load_urdf(os.path.join(_ASSETS, "solo12.urdf"), name="solo12")
    q = model.neutral()
    q[2] = 0.24
    for i, sgn in enumerate([1.0, 1.0, -1.0, -1.0]):  # FL FR HL HR
        q[7 + 3 * i: 10 + 3 * i] = [0.0, sgn * 0.8, -sgn * 1.6]
    model.reference_configurations["standing"] = q
    return model


def load_talos() -> RobotModel:
    model = load_urdf(os.path.join(_ASSETS, "talos.urdf"), name="talos")
    q = model.neutral()
    q[2] = 1.01
    # torso_1, torso_2
    q[7:9] = [0.0, 0.006761]
    # legs: [1..6] half-sitting knees-bent posture
    leg = [0.0, 0.0, -0.411354, 0.859395, -0.448041, -0.001708]
    q[9:15] = leg
    q[15:21] = leg
    model.reference_configurations["half_sitting"] = q
    return model


LOADERS = {"go2": load_go2, "solo12": load_solo12, "talos": load_talos}


def load(name: str) -> RobotModel:
    return LOADERS[name]()
