"""Positional embeddings for the decoder MLPs.

TPU-native versions of the reference's embedders
(ref: src/conv_onet/models/decoder.py:7-88). Default method is the learnable
Gaussian Fourier feature transform ('fourier', mapping size 93, scale 25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_fourier_embedding(
    key: jax.Array, num_input_channels: int = 3, mapping_size: int = 93, scale: float = 25.0
) -> jnp.ndarray:
    """Random projection matrix B ~ N(0, scale^2), learnable parameter.

    (ref: decoder.py:17-24)
    """
    return jax.random.normal(key, (num_input_channels, mapping_size)) * scale


def fourier_embed(B: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sin(x @ B) — note: sin only, matching the reference (decoder.py:26-30)."""
    return jnp.sin(x @ B)


def nerf_embed(x: jnp.ndarray, multires: int, log_sampling: bool = True) -> jnp.ndarray:
    """Classic NeRF positional embedding with input included
    (ref: decoder.py:33-67). Output dim = multires*6 + 3.
    """
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        freqs = np.linspace(2.0**0.0, 2.0 ** (multires - 1), multires)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)
