"""Dataset configuration.

Mirrors the ``dataset_config.npy`` dict the reference writes and round-trips
(genereate_dataset.py:78-88, specsdataset.py:15-26): same keys, same default
values (room constants at genereate_dataset.py:55-63). Centralized here so
the constants no longer drift across entry-point scripts (SURVEY.md §5.6)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

__all__ = ["DatasetConfig"]


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    fs: int = 16000
    receiver_position: Tuple[float, float, float] = (2.5, 1.5, 1.5)
    room_dimensions: Tuple[float, float, float] = (4.0, 5.0, 3.0)
    reverberation_time: float = 0.4
    n_sample: int = 6400  # int(reverberation_time * fs)
    R: float = 1.0
    NFFT: int = 400  # int(fs * 0.025)
    HOP_LENGTH: int = 160  # int(fs * 0.01)
    Z_LOC_SOURCE: float = 1.0
    c: float = 340.0
    # Framework extras (not in the reference dict):
    num_frames: int = 500  # fixed truncation length (data_preprocessing.py:64-69)
    audio_samples: int = 80000  # 5 s -> 501 frames -> truncated to 500

    @property
    def num_freq(self) -> int:
        return self.NFFT // 2 + 1  # 201

    def to_reference_dict(self) -> dict:
        """The exact dict layout of dataset_config.npy (genereate_dataset.py:78-88),
        plus framework extras under keys the reference never reads."""
        return {
            "fs": int(self.fs),
            "receiver_position": list(self.receiver_position),
            "room_dimensions": list(self.room_dimensions),
            "reverberation_time": self.reverberation_time,
            "n_sample": int(self.n_sample),
            "R": self.R,
            "NFFT": int(self.NFFT),
            "HOP_LENGTH": int(self.HOP_LENGTH),
            "Z_LOC_SOURCE": self.Z_LOC_SOURCE,
            # extras (ignored by the reference's SpecsDataset):
            "num_frames": int(self.num_frames),
            "audio_samples": int(self.audio_samples),
            "c": self.c,
        }

    @classmethod
    def from_reference_dict(cls, d: dict, **extras) -> "DatasetConfig":
        casts = {"num_frames": int, "audio_samples": int, "c": float}
        for key, cast in casts.items():
            if key in d and key not in extras:
                extras[key] = cast(d[key])
        return cls(
            fs=int(d["fs"]),
            receiver_position=tuple(d["receiver_position"]),
            room_dimensions=tuple(d["room_dimensions"]),
            reverberation_time=float(d["reverberation_time"]),
            n_sample=int(d["n_sample"]),
            R=float(d["R"]),
            NFFT=int(d["NFFT"]),
            HOP_LENGTH=int(d["HOP_LENGTH"]),
            Z_LOC_SOURCE=float(d["Z_LOC_SOURCE"]),
            **extras,
        )
