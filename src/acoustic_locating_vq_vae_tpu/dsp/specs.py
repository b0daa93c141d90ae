"""Spectrogram-domain feature math from the reference data pipeline.

Pure jittable functions replacing the per-sample numpy/torch math in
scripts/genereate_dataset.py:41-49 (rir_spec ratio + Wiener estimate +
power conversion) and the per-batch normalization shared by all four
reference trainers (e.g. scripts/train_speech.py:63-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rir_spec_ratio", "wiener_estimate", "znorm", "source_coordinates"]


def rir_spec_ratio(speech_spec: jax.Array, echoed_spec: jax.Array) -> jax.Array:
    """Complex spectral ratio, max-normalized (genereate_dataset.py:41-42)."""
    ratio = speech_spec / (echoed_spec + 1e-8)
    return ratio / jnp.max(jnp.abs(ratio))


def wiener_estimate(speech_spec: jax.Array, echoed_spec: jax.Array) -> jax.Array:
    """Per-frequency Wiener transfer-function estimate, magnitude squared.

    ``sum_t(echoed * conj(speech)) / (sum_t |speech|^2 + 1e-8)`` then |.|^2
    (genereate_dataset.py:44-46). Input layout (..., F, T); returns (..., F).
    """
    num = jnp.sum(echoed_spec * jnp.conjugate(speech_spec), axis=-1)
    den = jnp.sum(speech_spec * jnp.conjugate(speech_spec), axis=-1) + 1e-8
    return jnp.abs(num / den) ** 2


def znorm(x: jax.Array, axis: int = 1, eps: float = 1e-8) -> jax.Array:
    """Z-normalize along ``axis`` with torch's unbiased std (ddof=1), matching
    ``(x - x.mean(dim)) / (x.std(dim) + 1e-8)`` in train_speech.py:64 et al."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    n = x.shape[axis]
    var = jnp.sum((x - mean) ** 2, axis=axis, keepdims=True) / max(n - 1, 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


def source_coordinates(
    theta: jax.Array,
    receiver_position: jax.Array,
    room_dimensions: jax.Array,
    radius: float = 1.0,
    z_loc: float = 1.0,
) -> jax.Array:
    """3-D source position on a circle of ``radius`` around the receiver,
    clipped to the room (genereate_dataset.py:16-20,
    specsdataset.py:38-45 ``get_source_coordinates``).

    ``theta``: (...,) -> returns (..., 3).
    """
    theta = jnp.asarray(theta)
    offs = jnp.stack(
        [
            radius * jnp.cos(theta),
            radius * jnp.sin(theta),
            jnp.broadcast_to(jnp.asarray(z_loc, theta.dtype), theta.shape),
        ],
        axis=-1,
    )
    pos = jnp.asarray(receiver_position) + offs
    return jnp.minimum(pos, jnp.asarray(room_dimensions))
