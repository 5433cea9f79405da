"""Project state persistence between pipeline stages.

The reference pipeline communicates through binary .bst/.bms files; here a
single pickled NetworkData plays that role (``<name>.net.pkl``), alongside a
JSON project file (``<name>.json``) holding stage settings and progress —
the .dnaproj analogue.

Parity reference: config/dnaprojectfile.cpp (project file round-trip);
io/bst_file.cpp, bms_file.cpp (inter-stage binary state).
"""

from __future__ import annotations

import json
import os
import pickle

from .network.data import NetworkData


def net_path(folder: str, name: str) -> str:
    return os.path.join(folder, f"{name}.net.pkl")


def proj_path(folder: str, name: str) -> str:
    return os.path.join(folder, f"{name}.json")


def save_network(net: NetworkData, folder: str, name: str):
    with open(net_path(folder, name), "wb") as f:
        pickle.dump(net, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_network(folder: str, name: str) -> NetworkData:
    with open(net_path(folder, name), "rb") as f:
        return pickle.load(f)


def update_project(folder: str, name: str, stage: str, settings: dict):
    path = proj_path(folder, name)
    proj = {}
    if os.path.exists(path):
        with open(path) as f:
            proj = json.load(f)
    proj.setdefault("name", name)
    proj[stage] = settings
    with open(path, "w") as f:
        json.dump(proj, f, indent=2)


def load_project(folder: str, name: str) -> dict:
    path = proj_path(folder, name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}
