"""Visualization (C13: visualization.py:6-15), matplotlib-gated.

Same contract as the reference's ``plot_spectrogram`` — 1-D (or single-row)
inputs render as a magnitude line plot, 2-D as a dB image with a
low-frequency-at-bottom orientation — plus framework extras the reference
lacks: an existing-axis target, a colorbar, and a multi-panel helper for
side-by-side input/reconstruction comparison.
"""

from __future__ import annotations

import numpy as np

from ..dsp import power_to_db

__all__ = ["plot_spectrogram", "plot_spectrogram_grid"]

_IMAGE_STYLE = dict(origin="lower", aspect="auto", interpolation="nearest")


def _is_line_like(arr: np.ndarray) -> bool:
    return arr.ndim == 1 or arr.shape[0] == 1


def plot_spectrogram(spectrogram, title=None, ylabel="freq_bin", ax=None, colorbar=False):
    """Render one spectrogram (or 1-D signal) onto ``ax`` and return the axis."""
    from matplotlib import pyplot as plt

    arr = np.asarray(spectrogram)
    if ax is None:
        _, ax = plt.subplots(1, 1)
    if title is not None:
        ax.set_title(title)
    ax.set_ylabel(ylabel)

    if _is_line_like(arr):
        ax.plot(np.abs(arr).reshape(-1))
        return ax

    image = ax.imshow(np.asarray(power_to_db(arr)), **_IMAGE_STYLE)
    if colorbar:
        ax.figure.colorbar(image, ax=ax, label="dB")
    return ax


def plot_spectrogram_grid(spectrograms, titles=None, ylabel="freq_bin"):
    """One row of panels (e.g. input / reconstruction / error). Returns the
    figure and the list of axes."""
    from matplotlib import pyplot as plt

    n = len(spectrograms)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for i, spec in enumerate(spectrograms):
        title = titles[i] if titles else None
        plot_spectrogram(spec, title=title, ylabel=ylabel if i == 0 else None, ax=axes[0][i])
    fig.tight_layout()
    return fig, list(axes[0])
