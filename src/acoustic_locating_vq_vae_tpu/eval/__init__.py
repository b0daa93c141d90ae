"""Evaluation / analysis layer: location comparison (C21 intent), latent
t-SNE study (C23), audio resynthesis checks (C24)."""

from .compare import (
    compare_location_models,
    evaluate_joint_location,
    evaluate_location,
    infer_location_modes,
    infer_target_mode,
)
from .latents import collect_encodings, linear_angle_probe, tsne_rir_embedding
from .resynth import audio_from_complex_spec, audio_from_power_spec, spectral_snr_db, write_wav
from .serving import export_localizer, load_localizer, make_serving_fn
from .tracking import (
    alpha_beta_filter,
    arc_trajectory,
    track_metrics,
    walk_trajectory,
    wrap_angle,
)

__all__ = [
    "alpha_beta_filter",
    "arc_trajectory",
    "track_metrics",
    "walk_trajectory",
    "wrap_angle",
    "compare_location_models",
    "evaluate_location",
    "evaluate_joint_location",
    "infer_location_modes",
    "infer_target_mode",
    "collect_encodings",
    "linear_angle_probe",
    "tsne_rir_embedding",
    "audio_from_complex_spec",
    "audio_from_power_spec",
    "spectral_snr_db",
    "write_wav",
    "export_localizer",
    "load_localizer",
    "make_serving_fn",
]
