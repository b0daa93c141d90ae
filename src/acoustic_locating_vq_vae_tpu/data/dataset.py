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

__all__ = [
    "SpecsDataset",
    "InMemoryDataset",
    "HostStagedDataset",
    "sample_without_replacement",
    "save_dataset",
    "save_dataset_reference_format",
]


def sample_without_replacement(key: jax.Array, n, k: int) -> jnp.ndarray:
    """Exactly uniform k distinct indices from [0, n) in O(k^2) compute,
    INDEPENDENT of n.

    ``jax.random.choice(replace=False)`` materializes a full n-permutation
    (an n-key sort) per call; inside the per-step batch sampler that made
    step time scale linearly with the resident dataset size (20k rows
    tripled the rir step, BASELINE.md round 3). This is the first k steps of
    Fisher-Yates on a VIRTUAL arange(n): the at-most-k touched entries live
    in a small table, each lookup is a vectorized scan over it. ``n`` may be
    traced; ``k`` is static.
    """
    k = int(k)
    # Population guard (jax.random.choice(replace=False) raised here; the
    # virtual Fisher-Yates would instead silently produce duplicate/garbage
    # indices from the empty U[i, n) draws). Only checkable when n is
    # concrete — shard_map/jit tracers defer to the caller.
    if not isinstance(n, jax.core.Tracer) and k > int(n):
        raise ValueError(
            f"cannot sample {k} distinct indices from a population of {int(n)}"
        )
    sentinel = jnp.int32(-1)

    def lookup(pos_tab, val_tab, x):
        # value of virtual a[x]: the LATEST table entry writing position x,
        # else x itself. Entries are appended in iteration order, so the
        # highest matching slot wins.
        matches = pos_tab == x
        any_match = jnp.any(matches)
        idx = jnp.where(matches, jnp.arange(k), -1).max()
        return jnp.where(any_match, val_tab[jnp.maximum(idx, 0)], x)

    def body(carry, i):
        key, pos_tab, val_tab = carry
        key, sub = jax.random.split(key)
        j = jax.random.randint(sub, (), 0, n - i) + i  # j ~ U[i, n)
        out = lookup(pos_tab, val_tab, j)
        # a[j] <- (virtual) a[i]; a[i] is never read again (future j >= i+1)
        a_i = lookup(pos_tab, val_tab, i)
        pos_tab = pos_tab.at[i].set(j)
        val_tab = val_tab.at[i].set(a_i)
        return (key, pos_tab, val_tab), out

    # Inside a shard_map (the stratified per-shard sampler) the key is
    # VARYING over the manual mesh axes while fresh constants are not; the
    # scan requires carry in/out varying-ness to match, so taint the init
    # tables with a zero derived from the key.
    key, k_taint = jax.random.split(key)
    taint = (jax.random.randint(k_taint, (), 0, 1) * 0).astype(jnp.int32)
    init = (key, jnp.full((k,), sentinel) + taint, jnp.full((k,), sentinel) + taint)
    _, out = jax.lax.scan(body, init, jnp.arange(k))
    return out



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
            radius=arrs.radius[i],
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
        n = stacked[0].shape[0]
        # Per-sample source radius: a framework extra in native .npz files
        # (absent in reference .pt data and pre-radius stores — fall back to
        # the config's fixed R, which is exact for data generated at fixed
        # geometry). The collate may DROP too-short items, breaking the
        # index alignment; radii are only trusted when nothing was dropped.
        radius = np.full((n,), self.R, np.float32)
        if n == len(items):
            for i in range(n):
                npz = os.path.join(self.root_dir, f"{i}.npz")
                if os.path.exists(npz):
                    d = np.load(npz)
                    if "radius" in d:
                        radius[i] = float(d["radius"])
        return SampleBatch(
            speech_spec=jnp.asarray(stacked[0]),
            rir_spec=jnp.asarray(stacked[1]),
            echoed_spec=jnp.asarray(stacked[2]),
            fs=jnp.asarray(stacked[3]),
            theta=jnp.asarray(stacked[4]).reshape(-1),
            wiener_est=jnp.asarray(stacked[5]),
            radius=jnp.asarray(radius),
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
        reference's ``next(iter(loader))`` idiom (train_speech.py:57-61).
        Uses the O(batch²) exact sampler (dataset-size-independent)."""
        idx = sample_without_replacement(key, self.size, batch_size)
        return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), self.data)


class HostStagedDataset:
    """Host-RAM dataset served to the device in fixed-size resident chunks.

    The reference's largest named set (``20k_set``, train_rir.py:121) at
    ~1.2 MB/sample exceeds one chip's HBM as a fully resident f32 tree;
    this class keeps the WHOLE set in host memory as numpy and exposes
    ``chunk(i)`` slices. The Trainer holds one chunk device-resident,
    samples batches from it with the unchanged stratified sampler, and
    rotates to the next chunk every ``rotate_every`` steps — training
    visits the full set at a bounded HBM footprint. NOTE the bound is TWO
    chunks, not one: the Trainer prefetches chunk k+1 asynchronously from
    mid-window so the host→device transfer overlaps training (train/loop.py),
    so both chunks coexist for the second half of every window — size
    ``chunk_size`` to at most ~half the HBM you can spare. Combine with
    ``make_dataset(keep_fields=..., store_dtype=jnp.bfloat16)`` to shrink
    both host and device cost first.
    """

    def __init__(self, batch: SampleBatch, chunk_size: int, rotate_every: int = 500):
        self.arrays = jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a)), batch
        )
        self.size = int(self.arrays.theta.shape[0])
        if chunk_size <= 0:
            raise ValueError(f"chunk_size must be positive, got {chunk_size}")
        self.chunk_size = min(chunk_size, self.size)
        self.num_chunks = -(-self.size // self.chunk_size)
        self.rotate_every = rotate_every

    def chunk(self, i: int) -> SampleBatch:
        """The i-th (cyclic) chunk as HOST numpy views (zero-copy slices; a
        short tail window slides back so every chunk has exactly
        ``chunk_size`` jit-stable rows). The Trainer device_puts the result
        straight to the sharded batch layout — committing it to the default
        device here would stage a full extra chunk copy in one chip's HBM on
        every rotation/prefetch."""
        lo = (i % self.num_chunks) * self.chunk_size
        lo = min(lo, self.size - self.chunk_size)
        return jax.tree_util.tree_map(
            lambda a: a[lo : lo + self.chunk_size], self.arrays
        )


def make_host_dataset(
    key: jax.Array,
    size: int,
    config: DatasetConfig = DatasetConfig(),
    batch: int = 64,
    chunk_size: int = 2000,
    rotate_every: int = 500,
    **kwargs,
) -> HostStagedDataset:
    """Generate a ``size``-sample dataset straight into HOST memory (each
    synthesis batch is device_get'd immediately, so the device transient
    stays batch-sized) wrapped as a :class:`HostStagedDataset`. Accepts all
    :func:`..data.synth.make_dataset` kwargs incl. ``keep_fields`` /
    ``store_dtype`` / ``rir_bank`` / ``speech_pool``."""
    from .synth import make_dataset

    host = None
    done = 0
    while done < size:
        key, sub = jax.random.split(key)
        n = min(chunk_size, size - done)
        part = make_dataset(sub, n, config, batch=batch, **kwargs)
        part = jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), part)
        if host is None:
            # Preallocate the full host tree and write each part into its
            # slice — accumulating parts and np.concatenate'ing at the end
            # would double peak host RAM (~48 GB transient at the 20k scale
            # this function exists for).
            host = jax.tree_util.tree_map(
                lambda a: np.empty((size,) + a.shape[1:], a.dtype), part
            )
        jax.tree_util.tree_map(
            lambda dst, src: dst.__setitem__(slice(done, done + n), src), host, part
        )
        done += n
    return HostStagedDataset(host, chunk_size=chunk_size, rotate_every=rotate_every)
