"""Config system: YAML with recursive ``inherit_from`` chains + deep merge.

Same semantics as the reference's src/config.py:18-72 (a scene yaml inherits
from a dataset yaml which inherits from configs/wildgs_slam.yaml), so existing
3-level config hierarchies port over unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def update_recursive(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    """Deep-merge src into dst in place (reference src/config.py:52-72)."""
    for k, v in src.items():
        if k not in dst:
            dst[k] = dict() if isinstance(v, dict) else v
        if isinstance(v, dict):
            update_recursive(dst[k], v)
        else:
            dst[k] = v


def load_config(path: str, default_path: str | None = None) -> Dict[str, Any]:
    """Load a YAML config, following its ``inherit_from`` chain recursively
    (reference src/config.py:18-49)."""
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # inherit_from paths are relative to the repo root (as in the
        # reference, where they are given as configs/... paths)
        if not os.path.isabs(inherit_from) and not os.path.exists(inherit_from):
            candidate = os.path.join(os.path.dirname(path), inherit_from)
            if os.path.exists(candidate):
                inherit_from = candidate
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = dict()

    update_recursive(cfg, cfg_special)
    return cfg


def save_config(cfg: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.dump(cfg, f, default_flow_style=False, sort_keys=False)
