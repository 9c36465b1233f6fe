"""Scene state: bound computation, hierarchical feature-grid allocation.

The reference's DF_Prior orchestrator owns this state as shared CUDA tensors
(ref: src/DF_Prior.py:177-266); here it is a plain pytree:

    scene_params = {
        'grid_low':   (NXl, NYl, NZl, C) float32,   # sigma 0.01 init
        'grid_high':  (NXh, NYh, NZh, C) float32,   # sigma 1e-4 init
        'grid_color': (NXc, NYc, NZc, C) float32,   # sigma 0.01 init
        'low' / 'high' / 'color' / 'mlp': decoder params,
    }

Grids are channels-last, natural (X, Y, Z) order — the x/z axis swap the
reference performs for grid_sample (ref: src/DF_Prior.py:243-260) does not
exist here (see ops/grid_sample.py docstring).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from attentive_dfprior_tpu.models.decoders import (
    init_df_decoders,
    load_pretrained_low_high,
)


def load_bound(cfg: Dict[str, Any]) -> np.ndarray:
    """Scene bound with bound_divisible round-up (ref: src/DF_Prior.py:177-194).

    bound[:, 1] is enlarged so each extent is divisible by
    grid_len.bound_divisible (0.32 by default).
    """
    scale = cfg.get("scale", 1)
    bound = np.array(cfg["mapping"]["bound"], dtype=np.float64) * scale
    bd = cfg["grid_len"]["bound_divisible"]
    bound[:, 1] = (
        ((bound[:, 1] - bound[:, 0]) / bd).astype(int) + 1
    ) * bd + bound[:, 0]
    return bound


def grid_shape(bound: np.ndarray, grid_len: float) -> Tuple[int, int, int]:
    """Voxel counts per axis: int(extent / grid_len) (ref: DF_Prior.py:243)."""
    xyz_len = bound[:, 1] - bound[:, 0]
    return tuple(int(v) for v in (xyz_len / grid_len))


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Static scene/model configuration shared by renderer, mapper, tracker."""

    bound: np.ndarray  # (3, 2) float
    c_dim: int
    low_grid_len: float
    high_grid_len: float
    color_grid_len: float
    occupancy: bool = True
    # Freeze flags (ref: configs/df_prior.yaml:45-46). When no pretrained
    # low/high decoders are available the caller should set fix_high=False so
    # geometry can still be learned from scratch.
    fix_high: bool = True
    fix_color: bool = False

    @staticmethod
    def from_config(cfg: Dict[str, Any], pretrained_loaded: bool = False) -> "SceneConfig":
        fix_high = bool(cfg["mapping"].get("fix_high", True))
        if not pretrained_loaded:
            fix_high = False  # from-scratch path: let the high decoder train
        return SceneConfig(
            bound=load_bound(cfg),
            c_dim=int(cfg["model"]["c_dim"]),
            low_grid_len=float(cfg["grid_len"]["low"]),
            high_grid_len=float(cfg["grid_len"]["high"]),
            color_grid_len=float(cfg["grid_len"]["color"]),
            occupancy=bool(cfg.get("occupancy", True)),
            fix_high=fix_high,
            fix_color=bool(cfg["mapping"].get("fix_color", False)),
        )


def init_scene(
    key: jax.Array,
    scene_cfg: SceneConfig,
    pretrained_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Allocate feature grids + decoder parameters.

    Grid init sigmas match the reference (ref: src/DF_Prior.py:246-263):
    low/color N(0, 0.01), high N(0, 1e-4).
    """
    kg1, kg2, kg3, kd = jax.random.split(key, 4)
    C = scene_cfg.c_dim
    b = scene_cfg.bound

    shapes = {
        "grid_low": grid_shape(b, scene_cfg.low_grid_len),
        "grid_high": grid_shape(b, scene_cfg.high_grid_len),
        "grid_color": grid_shape(b, scene_cfg.color_grid_len),
    }
    params: Dict[str, Any] = {
        "grid_low": jax.random.normal(kg1, (*shapes["grid_low"], C)) * 0.01,
        "grid_high": jax.random.normal(kg2, (*shapes["grid_high"], C)) * 1e-4,
        "grid_color": jax.random.normal(kg3, (*shapes["grid_color"], C)) * 0.01,
    }
    decoders = init_df_decoders(kd, c_dim=C)
    if pretrained_path:
        if str(pretrained_path).endswith(".npz"):
            # our own pretrained prior (tools/pretrain_decoders.py)
            from attentive_dfprior_tpu.tools.pretrain_decoders import (
                load_pretrained_npz,
            )

            decoders = load_pretrained_npz(decoders, pretrained_path)
        else:
            loaded = load_pretrained_low_high(decoders, pretrained_path)
            if loaded is not None:
                decoders = loaded
    params.update(decoders)
    return params


def param_group_of(path_leaves: Tuple[str, ...]) -> str:
    """Map a top-level param key to its reference optimizer group
    (ref: src/Mapper.py:374-378): decoders | mlp | low | high | color grids.
    """
    top = path_leaves[0]
    return {
        "grid_low": "low_grid",
        "grid_high": "high_grid",
        "grid_color": "color_grid",
        "mlp": "mlp",
        "low": "low_decoder",
        "high": "high_decoder",
        "color": "color_decoder",
    }[top]
