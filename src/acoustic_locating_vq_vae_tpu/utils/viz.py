"""Visualization (C13: visualization.py:6-15), matplotlib-gated."""

from __future__ import annotations

import numpy as np

from ..dsp import power_to_db

__all__ = ["plot_spectrogram"]


def plot_spectrogram(spectrogram, title=None, ylabel="freq_bin", ax=None):
    """1-D inputs -> line plot of magnitude; 2-D -> dB image
    (visualization.py:6-15). Returns the axis."""
    from matplotlib import pyplot as plt

    spectrogram = np.asarray(spectrogram)
    if ax is None:
        _, ax = plt.subplots(1, 1)
    if title is not None:
        ax.set_title(title)
    ax.set_ylabel(ylabel)
    if spectrogram.ndim == 1 or spectrogram.shape[0] == 1:
        ax.plot(np.abs(spectrogram).reshape(-1))
    else:
        ax.imshow(
            np.asarray(power_to_db(spectrogram)),
            origin="lower", aspect="auto", interpolation="nearest",
        )
    return ax
