"""Disk-backed datasets, reference-interoperable.

``SpecsDataset`` mirrors the reference class of the same name
(rir_dataset_generator/specsdataset.py:9-45): a map-style dataset over
per-sample files plus a ``dataset_config.npy`` dict, returning the 6-tuple
``(speech_spec, rir_spec, echoed_spec, fs, theta, wiener_est)``. It reads
both the reference's ``<i>.pt`` torch pickles (when torch is available) and
this framework's native ``<i>.npz`` files, so reference-generated data works
unchanged and framework-generated data can be consumed by reference code.

``InMemoryDataset`` is the TPU-native fast path: the whole dataset resident
in device memory with jit-friendly random-batch gathering — the equivalent of
the reference's ``next(iter(DataLoader(...)))`` fresh-shuffle sampling
(train_speech.py:57-61) without the per-step host I/O.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DatasetConfig
from .synth import SampleBatch

__all__ = ["SpecsDataset", "InMemoryDataset", "save_dataset", "save_dataset_reference_format"]


def save_dataset(root_dir: str, batch: SampleBatch, config: DatasetConfig) -> None:
    """Write a SampleBatch as native ``<i>.npz`` files + dataset_config.npy."""
    os.makedirs(root_dir, exist_ok=True)
    arrs = jax.tree_util.tree_map(np.asarray, batch)
    for i in range(arrs.speech_spec.shape[0]):
        np.savez(
            os.path.join(root_dir, f"{i}.npz"),
            speech_spec=arrs.speech_spec[i],
            rir_spec=arrs.rir_spec[i],
            echoed_spec=arrs.echoed_spec[i],
            fs=arrs.fs[i],
            theta=arrs.theta[i],
            wiener_est=arrs.wiener_est[i],
        )
    np.save(os.path.join(root_dir, "dataset_config.npy"), config.to_reference_dict())


def save_dataset_reference_format(root_dir: str, batch: SampleBatch, config: DatasetConfig) -> None:
    """Write the reference's exact on-disk format: torch pickles of the
    6-tuple, one file per sample (genereate_dataset.py:97-103), so reference
    scripts can read framework-generated data."""
    import torch

    os.makedirs(root_dir, exist_ok=True)
    arrs = jax.tree_util.tree_map(np.asarray, batch)
    for i in range(arrs.speech_spec.shape[0]):
        sample = (
            torch.from_numpy(arrs.speech_spec[i].copy()),
            torch.from_numpy(arrs.rir_spec[i].copy()),
            torch.from_numpy(arrs.echoed_spec[i].copy()),
            int(arrs.fs[i]),
            torch.from_numpy(np.asarray([arrs.theta[i]], np.float64)),
            torch.from_numpy(arrs.wiener_est[i].copy()),
        )
        torch.save(sample, os.path.join(root_dir, f"{i}.pt"))
    np.save(os.path.join(root_dir, "dataset_config.npy"), config.to_reference_dict())


class SpecsDataset:
    """Map-style dataset over ``<i>.pt`` / ``<i>.npz`` files (specsdataset.py:9-45)."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir
        self.dataset_files = sorted(
            glob.glob(os.path.join(root_dir, "*.pt")) + glob.glob(os.path.join(root_dir, "*.npz"))
        )
        cfg = np.load(os.path.join(root_dir, "dataset_config.npy"), allow_pickle=True).item()
        self.config = DatasetConfig.from_reference_dict(cfg)
        # Attribute surface of the reference class (specsdataset.py:15-26):
        self.fs = cfg["fs"]
        self.receiver_position = cfg["receiver_position"]
        self.room_dimensions = cfg["room_dimensions"]
        self.reverberation_time = cfg["reverberation_time"]
        self.n_sample = cfg["n_sample"]
        self.R = cfg["R"]
        self.NFFT = cfg["NFFT"]
        self.HOP_LENGTH = cfg["HOP_LENGTH"]
        self.Z_LOC_SOURCE = cfg["Z_LOC_SOURCE"]

    def __len__(self) -> int:
        return len(self.dataset_files)

    def __getitem__(self, idx: int) -> Tuple:
        npz = os.path.join(self.root_dir, f"{idx}.npz")
        if os.path.exists(npz):
            d = np.load(npz)
            return (
                d["speech_spec"],
                d["rir_spec"],
                d["echoed_spec"],
                d["fs"].item(),
                np.atleast_1d(d["theta"]),
                d["wiener_est"],
            )
        import torch

        item = torch.load(os.path.join(self.root_dir, f"{idx}.pt"), weights_only=False)
        speech_spec, rir_spec, echoed_spec, fs, theta, wiener_est = item
        to_np = lambda x: x.numpy() if hasattr(x, "numpy") else np.asarray(x)
        return (
            to_np(speech_spec),
            to_np(rir_spec),
            to_np(echoed_spec),
            int(fs) if np.ndim(fs) == 0 else int(np.asarray(fs).reshape(-1)[0]),
            np.atleast_1d(to_np(theta)),
            to_np(wiener_est),
        )

    def get_source_coordinates(self, theta) -> np.ndarray:
        """3-D source position(s) for angle(s) theta (specsdataset.py:38-45)."""
        theta = np.asarray(theta)
        z = np.full_like(theta, self.Z_LOC_SOURCE, dtype=np.float64)
        pos = np.stack(
            [self.R * np.cos(theta), self.R * np.sin(theta), z], axis=-1
        ) + np.asarray(self.receiver_position)
        return np.minimum(pos, np.asarray(self.room_dimensions))

    def load_all(self, num_frames: Optional[int] = None) -> SampleBatch:
        """Materialize the whole dataset as a SampleBatch (drop/truncate to
        ``num_frames`` like the reference collate, data_preprocessing.py:64-69)."""
        from .collate import spec_dataset_preprocessing

        items = [self[i] for i in range(len(self))]
        t = num_frames if num_frames is not None else self.config.num_frames
        stacked = spec_dataset_preprocessing(items, num_frames=t)
        if not isinstance(stacked[0], np.ndarray):
            raise ValueError(
                f"every sample in {self.root_dir} has fewer than {t} time frames; "
                "pass num_frames= explicitly or fix dataset_config"
            )
        return SampleBatch(
            speech_spec=jnp.asarray(stacked[0]),
            rir_spec=jnp.asarray(stacked[1]),
            echoed_spec=jnp.asarray(stacked[2]),
            fs=jnp.asarray(stacked[3]),
            theta=jnp.asarray(stacked[4]).reshape(-1),
            wiener_est=jnp.asarray(stacked[5]),
        )


class InMemoryDataset:
    """Device-resident dataset with jit-friendly random batch sampling."""

    def __init__(self, batch: SampleBatch, sharding=None):
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        self.data = batch
        self.size = int(batch.speech_spec.shape[0])

    def sample_batch(self, key: jax.Array, batch_size: int) -> SampleBatch:
        """Uniform random batch WITH fresh reshuffle each call — matching the
        reference's ``next(iter(loader))`` idiom (train_speech.py:57-61)."""
        idx = jax.random.choice(key, self.size, (batch_size,), replace=False)
        return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), self.data)
