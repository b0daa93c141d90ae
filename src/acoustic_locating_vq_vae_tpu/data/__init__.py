"""Data layer (L1 of the reference layer map): on-device synthesis pipeline,
reference-interoperable disk datasets, collation, and speech sources."""

from .collate import combine_arrays_with_min_dim, spec_dataset_preprocessing
from .config import DatasetConfig
from .dataset import (
    HostStagedDataset,
    InMemoryDataset,
    SpecsDataset,
    make_host_dataset,
    save_dataset,
    save_dataset_reference_format,
)
from .speech import load_librispeech, load_wav_dir, synthetic_speech_batch
from .synth import (
    SampleBatch,
    bank_thetas,
    make_dataset,
    make_rir_bank,
    geometry_boxes,
    max_source_radius,
    observed_power_spec,
    prune_batch,
    synthesize_batch,
)

__all__ = [
    "combine_arrays_with_min_dim",
    "spec_dataset_preprocessing",
    "DatasetConfig",
    "InMemoryDataset",
    "HostStagedDataset",
    "make_host_dataset",
    "SpecsDataset",
    "save_dataset",
    "save_dataset_reference_format",
    "load_librispeech",
    "load_wav_dir",
    "synthetic_speech_batch",
    "SampleBatch",
    "make_dataset",
    "synthesize_batch",
    "make_rir_bank",
    "geometry_boxes",
    "max_source_radius",
    "prune_batch",
    "bank_thetas",
    "observed_power_spec",
]
