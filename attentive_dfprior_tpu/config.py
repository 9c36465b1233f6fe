"""Config system: YAML with recursive ``inherit_from`` chains.

Feature-parity with the reference config loader (ref: src/config.py:10-59):
a scene yaml inherits from a dataset yaml which inherits from the base
``configs/df_prior.yaml``; dictionaries merge recursively with the most
specific file winning.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


def load_config(path: str, default_path: Optional[str] = None) -> Dict[str, Any]:
    """Load a YAML config, resolving the ``inherit_from`` chain.

    Args:
        path: path to the (scene) config file.
        default_path: base config used when no ``inherit_from`` is present.

    Returns:
        Merged config dict.
    """
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # Resolve relative inherit paths against cwd first (reference behavior),
        # then against the directory of the including file.
        if not os.path.exists(inherit_from):
            cand = os.path.join(os.path.dirname(os.path.abspath(path)), inherit_from)
            if os.path.exists(cand):
                inherit_from = cand
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None and os.path.abspath(default_path) != os.path.abspath(path):
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}

    update_recursive(cfg, cfg_special)
    return cfg


def update_recursive(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> None:
    """Merge ``dict2`` into ``dict1`` recursively (dict2 wins on conflicts)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def default_config_path() -> str:
    """Path of the shipped base config (configs/df_prior.yaml)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo_root, "configs", "df_prior.yaml")
