"""On-device synthetic data pipeline.

Replaces the reference's offline serial CPU generator
(scripts/genereate_dataset.py:54-103, the §3.1 hot loop: per-sample C++ RIR +
scipy convolution + 2 STFTs, saved as pickles) with ONE jitted XLA program
that produces a whole batch: sample angles, synthesize RIRs (image-source
method on the MXU), convolve speech, STFT everything, and compute the
rir-ratio / Wiener targets — all in device memory, no host round-trips.

Per-sample math parity (genereate_dataset.py:12-51):
    theta ~ U(-pi, pi);  source = receiver + (R cos, R sin, Z), clipped to room
    h = ISM(...);  echoed = convolve(speech, h, 'same')
    speech_spec, echoed_spec = STFT(speech), STFT(echoed)   [complex, normalized]
    rir_spec   = speech_spec / (echoed_spec + 1e-8), max-normalized
    wiener_est = |sum_t(echoed conj(speech)) / sum_t |speech|^2|^2
    all specs -> power (|.|^2), truncated to 500 frames
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..dsp import (
    fft_convolve,
    generate_rir,
    generate_rir_batch,
    rir_spec_ratio,
    source_coordinates,
    spectrogram,
    wiener_estimate,
)
from .config import DatasetConfig
from .speech import synthetic_speech_batch

__all__ = [
    "SampleBatch",
    "synthesize_batch",
    "make_dataset",
    "make_rir_bank",
    "bank_thetas",
    "geometry_boxes",
    "max_source_radius",
    "observed_power_spec",
]


def _complex_spectrogram(wave: jnp.ndarray, config: DatasetConfig) -> jnp.ndarray:
    """The pipeline's normalized complex STFT (genereate_dataset.py:90-91)."""
    return spectrogram(
        wave, n_fft=config.NFFT, hop_length=config.HOP_LENGTH,
        power=None, normalized=True,
    )


def _power_truncated(spec: jnp.ndarray, config: DatasetConfig) -> jnp.ndarray:
    """Complex spec -> power, truncated to the fixed frame count
    (genereate_dataset.py:99-101 + the 500-frame geometry)."""
    return (jnp.abs(spec) ** 2)[..., : config.num_frames]


def observed_power_spec(wave: jnp.ndarray, config: DatasetConfig) -> jnp.ndarray:
    """Waveform -> the power spectrogram the models consume: THE shared
    frontend. :func:`synthesize_batch` builds its spectrogram fields from
    exactly these two pieces, and the from-audio serving export
    (eval/serving.py) fuses this same function into the artifact — one
    definition, so train-time preprocessing and the deployed program cannot
    diverge."""
    return _power_truncated(_complex_spectrogram(wave, config), config)


def max_source_radius(config: DatasetConfig) -> float:
    """Largest source-circle radius that stays inside the room around the
    receiver's xy position. :func:`..dsp.specs.source_coordinates` clips
    only at the UPPER walls (reference quirk, genereate_dataset.py:18-19),
    so an oversized radius silently places sources outside the room (or
    snaps them onto a wall) and invalidates the image-source geometry and
    the static image culling — validate against this before synthesizing
    at a non-default radius."""
    rx, ry = config.receiver_position[0], config.receiver_position[1]
    lx, ly = config.room_dimensions[0], config.room_dimensions[1]
    return float(min(rx, lx - rx, ry, ly - ry))


def geometry_boxes(config: DatasetConfig, r_hi: float):
    """Static ``(source_box, receiver_box)`` for the task's geometry: the
    receiver is a fixed point and the source lies on a radius-``<= r_hi``
    circle at fixed height around it, upper-wall-clipped exactly like
    :func:`..dsp.specs.source_coordinates` (``min(pos, room)``; no lower
    clip — reference quirk). Feeding these to :func:`..dsp.rir.generate_rir`
    tightens its static image culling far beyond the whole-room default
    (round 4): the boxes bound every position the synthesis paths can
    actually draw, so the cull stays exact by construction."""
    rx, ry, rz = (float(v) for v in config.receiver_position)
    lx, ly, lz = (float(v) for v in config.room_dimensions)
    r_hi = float(r_hi)
    sz = min(rz + float(config.Z_LOC_SOURCE), lz)  # fixed source height
    source_box = (
        (min(rx - r_hi, lx), min(ry - r_hi, ly), sz),
        (min(rx + r_hi, lx), min(ry + r_hi, ly), sz),
    )
    receiver_box = ((rx, ry, rz), (rx, ry, rz))
    return source_box, receiver_box


class SampleBatch(struct.PyTreeNode):
    """The reference 6-tuple (specsdataset.py:31-36) as a pytree of power
    spectrograms, truncated to the fixed 500-frame geometry.

    ``radius`` is a framework extra (the reference pins R=1 and stores no
    geometry beyond theta, genereate_dataset.py:17): the per-sample source
    radius in meters — ``config.R`` everywhere unless ``radius_range``
    randomized it. It enables range (distance) supervision for 2-D polar
    localization and is excluded from :meth:`as_tuple`, which remains the
    exact reference-format view."""

    speech_spec: jnp.ndarray  # (B, F, T)
    rir_spec: jnp.ndarray  # (B, F, T)
    echoed_spec: jnp.ndarray  # (B, F, T)
    fs: jnp.ndarray  # (B,)
    theta: jnp.ndarray  # (B,)
    wiener_est: jnp.ndarray  # (B, F)
    radius: jnp.ndarray  # (B,)

    def as_tuple(self):
        return (self.speech_spec, self.rir_spec, self.echoed_spec, self.fs, self.theta, self.wiener_est)


def bank_thetas(n_theta: int) -> np.ndarray:
    """The angle grid a RIR bank is built on: bin centers of a uniform
    n_theta-partition of (-pi, pi]."""
    return (-np.pi + (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)).astype(
        np.float32
    )


def make_rir_bank(
    config: DatasetConfig = DatasetConfig(),
    n_theta: int = 4096,
    rt60s: Optional[Sequence[float]] = None,
    radii: Optional[Sequence[float]] = None,
    chunk: int = 8192,
    batch: int = 256,
) -> jnp.ndarray:
    """Precompute the RIR bank the on-the-fly synthesizer can draw from.

    The source geometry is ONE-dimensional (theta on a circle of radius R
    around the fixed microphone, genereate_dataset.py:16-20), so the entire
    RIR space is a theta grid: precompute ``n_theta`` RIRs once (optionally
    x a T60 and/or radius grid for domain randomization) and per-step
    synthesis becomes a gather + convolution instead of image-source
    summation — the TPU-native answer to the measured OTF bottleneck (RIR
    generation dominated the fused step, BASELINE.md round 2). At
    n_theta=4096 the angle quantization is 1.5e-3 rad — an order of
    magnitude below the best measured localization RMSE (0.034 rad) — and
    the base bank is ~105 MB of HBM.

    ``radii`` extends the bank with a source-radius grid axis so
    radius-randomized (2-D polar) training can draw from the bank too —
    per-sample geometry is then (theta grid x radius grid) and both labels
    exactly match the gathered RIR. The grids multiply the bank's HBM
    footprint (n_sample x 4 bytes per RIR ≈ 25.6 KB at the reference
    geometry: 1024 thetas x 8 T60s x 8 radii ≈ 1.7 GB), so coarser theta
    grids pair with the extra axes; the continuous traced-Sabine path
    (``rt60_range``/``radius_range``) remains the exact alternative.
    Each radius must keep the source circle inside the room (same wall
    check as ``synthesize_batch(radius_range=...)``).

    Returns (n_theta, n_sample); ``rt60s`` prepends a T60 axis:
    (n_t60, n_theta, n_sample). ``radii`` ALWAYS yields the full 4-D layout
    (n_t60, n_r, n_theta, n_sample) — with n_t60=1 when ``rt60s`` is None —
    never a 3-D one: the two 3-D layouts (T60-gridded vs radius-gridded)
    are indistinguishable by shape, so a radius bank consumed without its
    ``rir_bank_radii`` values would silently be treated as a T60 bank and
    mislabel every radius. :func:`synthesize_batch` validates on ndim
    (radius banks must be 4-D), which makes that mistake impossible.
    """
    thetas = jnp.asarray(bank_thetas(n_theta))
    receiver = jnp.asarray(config.receiver_position, jnp.float32)
    room = jnp.asarray(config.room_dimensions, jnp.float32)
    if radii is not None:
        radii = [float(r) for r in radii]
        max_r = max_source_radius(config)
        bad = [r for r in radii if not 0.0 < r < max_r]
        if bad:
            raise ValueError(
                f"bank radii {bad} outside (0, {max_r}) (receiver "
                f"{config.receiver_position[:2]} in room "
                f"{config.room_dimensions[:2]}): sources would leave the room"
            )
        if len(radii) > 1:
            gap = max(
                b - a for a, b in zip(sorted(radii), sorted(radii)[1:])
            )
            if gap > 0.05:
                import warnings

                warnings.warn(
                    f"RIR-bank radius grid spacing {gap * 100:.1f} cm: a model "
                    "trained only on this bank can fail to generalize to "
                    "OFF-grid radii in the near field (VALIDATION.md run G: "
                    "14.3 cm spacing localized at median 0.023 rad ON the "
                    "grid but 0.090 rad just 3.6 cm off it at R=0.7). Keep "
                    "adjacent radii within ~5 cm, or finish with an "
                    "exact-synthesis leg (drop rir_bank, keep radius_range).",
                    stacklevel=2,
                )
    kw = dict(
        room=tuple(config.room_dimensions), nsample=config.n_sample,
        fs=float(config.fs), c=config.c, chunk=chunk,
    )

    def grid_for(rt60: float, R: float) -> jnp.ndarray:
        src = source_coordinates(
            thetas, receiver, room, radius=R, z_loc=config.Z_LOC_SOURCE
        )
        # bank geometry is fully static: box the cull at exactly this radius
        sbox, rbox = geometry_boxes(config, R)
        rows = []
        for i in range(0, n_theta, batch):
            rows.append(
                generate_rir_batch(
                    src[i : i + batch], receiver, rt60=float(rt60),
                    source_box=sbox, receiver_box=rbox, **kw,
                )
            )
        return jnp.concatenate(rows, axis=0)

    def radius_stack(rt60: float) -> jnp.ndarray:
        if radii is None:
            return grid_for(rt60, config.R)
        return jnp.stack([grid_for(rt60, r) for r in radii], axis=0)

    if rt60s is None:
        base = radius_stack(config.reverberation_time)
        # radii -> always 4-D (n_t60=1): see the layout note in the docstring
        return base if radii is None else base[None]
    return jnp.stack([radius_stack(t) for t in rt60s], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "batch", "fixed_rir", "fixed_speech", "rir_chunk",
        "rt60_range", "radius_range", "snr_range", "snr_clean_prob", "geom_cull",
        "bank_mix_prob",
    ),
)
def synthesize_batch(
    key: jax.Array,
    batch: int,
    config: DatasetConfig = DatasetConfig(),
    speech: Optional[jnp.ndarray] = None,
    fixed_rir: bool = False,
    fixed_speech: bool = False,
    rir_chunk: int = 8192,
    rt60_range: Optional[tuple] = None,
    rir_bank: Optional[jnp.ndarray] = None,
    rir_bank_radii: Optional[jnp.ndarray] = None,
    radius_range: Optional[tuple] = None,
    theta: Optional[jnp.ndarray] = None,
    radius: Optional[jnp.ndarray] = None,
    snr_range: Optional[tuple] = None,
    snr_clean_prob: float = 0.0,
    geom_cull: bool = True,
    bank_mix_prob: Optional[float] = None,
) -> SampleBatch:
    """Synthesize ``batch`` samples on device.

    ``speech``: optional (batch, audio_samples) waveforms (a real corpus);
    defaults to the synthetic source-filter generator. ``fixed_rir`` /
    ``fixed_speech`` reproduce the reference's ablation modes
    (genereate_dataset.py:12-16,32-35): every sample shares one RIR / one
    utterance.

    ``rt60_range``: optional (lo, hi) tuple — per-sample reverberation time
    T60 ~ U(lo, hi) instead of the config's fixed value (domain
    randomization; the reference's generator pins T60=0.4,
    genereate_dataset.py:60). The Sabine beta is traced per sample
    (dsp.rir.beta_from_rt60_traced), so the whole randomized batch stays one
    compiled program.

    ``radius_range``: optional (lo, hi) tuple — per-sample source radius
    R ~ U(lo, hi) around the receiver instead of the config's fixed
    ``config.R`` (geometry augmentation: the reference pins R=1 m,
    genereate_dataset.py:17; labels stay angular, so this trains angle
    estimation that is robust to range). ``hi`` must keep the whole source
    circle inside the room (validated against the receiver's xy wall
    margins — :func:`..dsp.specs.source_coordinates` clips only at the
    upper walls, reference quirk, so an oversized radius would otherwise
    silently place sources outside and invalidate the image-source
    geometry and the static image culling). Exclusive with ``rir_bank``
    (banks are built at fixed R).

    ``rir_bank``: optional precomputed bank from :func:`make_rir_bank` —
    (n_theta, n_sample) or (n_t60, n_theta, n_sample). Angles are then drawn
    uniformly on the bank's grid (labels exactly match the gathered RIR;
    grid spacing 2pi/n_theta) and synthesis skips image-source summation
    entirely. A 3-D bank draws a uniform T60 grid index per sample (its own
    domain randomization — exclusive with ``rt60_range``).

    ``rir_bank_radii``: the bank's source-radius grid values, (n_r,) —
    required iff the bank carries a radius axis, i.e. is the 4-D
    (n_t60, n_r, n_theta, n_sample) layout ``make_rir_bank(radii=)`` always
    returns (n_t60=1 when built without ``rt60s``). A uniform
    radius grid index is drawn per sample and the ``radius`` label is the
    grid value, so 2-D polar (angle + range) training can draw from the
    bank instead of paying exact image-source synthesis per step (run E's
    configuration, VALIDATION.md). Exclusive with ``radius_range`` (grid vs
    continuous) and given ``radius`` (grid-snapped).

    ``theta`` / ``radius``: optional GIVEN per-sample geometry (framework
    extra; the reference's generator only ever draws randomly,
    genereate_dataset.py:16-17) — shape (batch,) arrays (radius also takes
    a scalar) that replace the random draws, for controlled evaluation and
    trajectory synthesis (``eval.tracking``, scripts/track.py). The random
    streams are consumed identically either way, so providing the values a
    random run drew reproduces that run exactly (tested). Given ``theta``
    excludes ``rir_bank`` (bank labels are grid-snapped — synthesize
    exactly instead); given ``radius`` excludes ``radius_range`` and the
    caller owns the in-room validation that ``radius_range`` would do.

    ``snr_range``: optional (lo, hi) tuple in dB — per-sample white sensor
    noise added to the ECHOED waveform at SNR ~ U(lo, hi) before its STFT
    (framework extra; the reference's generator is noiseless,
    genereate_dataset.py:21-31). Models microphone/measurement noise: the
    observed quantities (echoed_spec, and the rir_spec / wiener_est ratios
    derived from it) see the noise, the clean-source ``speech_spec`` does
    not. SNR is measured against the per-sample echoed-signal power. The
    noise streams are ``fold_in``-derived, so theta/speech/T60/radius draws
    are identical to an un-noised run with the same key; composes with
    every other option (``rir_bank``, ``rt60_range``, ``radius_range``,
    given geometry).

    ``snr_clean_prob``: with ``snr_range`` set, each sample is left CLEAN
    (no sensor noise) with this probability — a mixed clean/noisy
    curriculum. Training with ``snr_range`` alone never shows the model a
    clean sample, which measurably costs clean-condition accuracy
    (VALIDATION.md run F: clean median 0.024 -> 0.031 rad at T60=0.4); the
    clean draws anchor the noiseless operating point while the noisy draws
    harden the rest. Its own fold_in stream, so the SNR/noise draws of the
    non-clean samples are identical to a snr_clean_prob=0 run.

    ``bank_mix_prob``: per-sample MIXED bank/exact synthesis (round 5,
    VERDICT r4 weak #3): with probability p a sample's continuous geometry
    draw is snapped to the bank grid and its RIR gathered from ``rir_bank``
    (theta to its grid cell's center; radius to the nearest
    ``rir_bank_radii`` value; the bank's T60 axis drawn uniformly); with
    probability 1-p the sample keeps the continuous draw and pays exact
    image-source synthesis. Labels always match the RIR actually used.
    Softens the distribution shift at the ``fit_joint_recipe`` bank->exact
    leg boundary, whose hard switch doubles the training error at small
    polish budgets (run J: 0.163 -> 0.315 at the 60k switch). Requires
    ``rir_bank`` and 0 < p < 1; unlike the pure-bank path it ALLOWS
    ``rt60_range`` / ``radius_range`` (they parameterize the exact side);
    excludes ``fixed_rir`` and given ``theta`` / ``radius``. The mix mask
    and the bank T60 index ride their own fold_in streams, so the
    continuous draws are identical to a ``bank_mix_prob=None`` run with
    the same key (the exact-side samples of a mixed run reproduce the
    pure-exact run's samples exactly).
    """
    if bank_mix_prob is not None:
        if rir_bank is None:
            raise ValueError("bank_mix_prob requires rir_bank")
        if not 0.0 < float(bank_mix_prob) < 1.0:
            raise ValueError(
                f"bank_mix_prob must be strictly between 0 and 1 (use "
                f"rir_bank=None for pure exact, no bank_mix_prob for pure "
                f"bank), got {bank_mix_prob}"
            )
        if fixed_rir or theta is not None or radius is not None:
            raise ValueError(
                "bank_mix_prob excludes fixed_rir and given theta/radius"
            )
    if rir_bank is not None and rt60_range is not None and bank_mix_prob is None:
        raise ValueError(
            "rir_bank excludes rt60_range: use a 3-D bank (make_rir_bank "
            "rt60s=...) for reverberation randomization"
        )
    if rir_bank is not None and radius_range is not None and bank_mix_prob is None:
        raise ValueError(
            "rir_bank excludes radius_range: the bank's RIRs are "
            "precomputed at fixed radii — use a radius-gridded bank "
            "(make_rir_bank radii=... + rir_bank_radii=) for geometry "
            "randomization from the bank"
        )
    if theta is not None and rir_bank is not None:
        raise ValueError(
            "given theta excludes rir_bank (bank RIRs exist only at grid "
            "angles): drop the bank to synthesize the exact geometry"
        )
    if radius is not None and radius_range is not None:
        raise ValueError("given radius excludes radius_range")
    if rir_bank_radii is not None:
        if rir_bank is None:
            raise ValueError("rir_bank_radii requires rir_bank")
        if radius is not None:
            raise ValueError(
                "given radius excludes a radius-gridded rir_bank (bank RIRs "
                "exist only at grid radii): drop the bank to synthesize the "
                "exact geometry"
            )
        rir_bank_radii = jnp.asarray(rir_bank_radii, jnp.float32)
        if rir_bank.ndim != 4:
            # make_rir_bank(radii=...) ALWAYS returns 4-D (n_t60=1 when rt60s
            # is None) exactly so a 3-D bank is unambiguously T60-gridded —
            # a 3-D bank paired with radius values is a layout mistake.
            raise ValueError(
                f"rir_bank_radii requires a 4-D (n_t60, n_r, n_theta, "
                f"n_sample) bank — make_rir_bank(radii=...) always returns "
                f"one, with n_t60=1 when rt60s is None — got ndim "
                f"{rir_bank.ndim}"
            )
        if rir_bank.shape[1] != rir_bank_radii.shape[0]:
            raise ValueError(
                f"rir_bank radius axis {rir_bank.shape[1]} != "
                f"len(rir_bank_radii) {rir_bank_radii.shape[0]}"
            )
    elif rir_bank is not None and rir_bank.ndim == 4:
        raise ValueError(
            "a 4-D rir_bank carries a radius axis: pass its grid values via "
            "rir_bank_radii"
        )
    elif rir_bank is not None and rir_bank.ndim not in (2, 3):
        raise ValueError(
            f"rir_bank must be (n_theta, n_sample), (n_t60, n_theta, "
            f"n_sample), or the 4-D radius-gridded layout, got ndim "
            f"{rir_bank.ndim}"
        )
    if (
        bank_mix_prob is not None
        and radius_range is not None
        and rir_bank_radii is None
    ):
        raise ValueError(
            "bank_mix_prob with radius_range requires a radius-gridded bank "
            "(make_rir_bank(radii=...) + rir_bank_radii): a bank without a "
            "radius axis holds RIRs at the fixed config.R, so its samples' "
            "radius labels could not match their RIRs"
        )
    if radius_range is not None:
        lo, hi = float(radius_range[0]), float(radius_range[1])
        max_r = max_source_radius(config)
        if not 0.0 < lo <= hi:
            raise ValueError(f"radius_range must satisfy 0 < lo <= hi, got {radius_range}")
        if hi >= max_r:
            raise ValueError(
                f"radius_range hi {hi} >= max in-room source radius {max_r} "
                f"(receiver {config.receiver_position[:2]} in room "
                f"{config.room_dimensions[:2]}): sources would leave the room "
                "— source_coordinates clips only at the upper walls, so the "
                "image-source geometry and static image culling would be "
                "silently wrong"
            )
    if snr_range is not None:
        lo, hi = float(snr_range[0]), float(snr_range[1])
        if not lo <= hi:
            raise ValueError(f"snr_range must satisfy lo <= hi, got {snr_range}")
    if not 0.0 <= float(snr_clean_prob) <= 1.0:
        raise ValueError(f"snr_clean_prob must be in [0, 1], got {snr_clean_prob}")
    if snr_clean_prob and snr_range is None:
        raise ValueError("snr_clean_prob requires snr_range")
    if rir_bank is not None and rir_bank.shape[-1] != config.n_sample:
        raise ValueError(
            f"rir_bank n_sample {rir_bank.shape[-1]} != config.n_sample "
            f"{config.n_sample}"
        )
    k_theta, k_speech, k_rt60 = jax.random.split(key, 3)

    if theta is not None:
        theta = jnp.broadcast_to(jnp.asarray(theta, jnp.float32), (batch,))
    elif rir_bank is not None and bank_mix_prob is None:
        n_theta = rir_bank.shape[-2]
        idx = jax.random.randint(k_theta, (batch,), 0, n_theta)
        if fixed_rir:
            idx = jnp.broadcast_to(idx[:1], idx.shape)
        theta = -jnp.pi + (idx.astype(jnp.float32) + 0.5) * (2.0 * jnp.pi / n_theta)
    else:
        theta = jax.random.uniform(k_theta, (batch,), minval=-jnp.pi, maxval=jnp.pi)
        if fixed_rir:
            theta = jnp.broadcast_to(theta[:1], theta.shape)

    receiver = jnp.asarray(config.receiver_position, jnp.float32)
    room = jnp.asarray(config.room_dimensions, jnp.float32)
    # Static upper bound on the source radius, when one is knowable at trace
    # time — it feeds the geometry-boxed image culling below. A traced
    # ``radius`` array (given-geometry synthesis inside jit, e.g. tracking)
    # has no static bound: fall back to the whole-room cull. A CONCRETE
    # given radius uses max(radius) so that replaying a drawn geometry
    # culls the same lattice (bit-exact replay when the drawn bound equals
    # the replayed max, e.g. fixed config.R).
    static_r_hi: Optional[float] = None
    if radius is not None:
        if isinstance(radius, (int, float, np.floating, np.integer)):
            static_r_hi = float(radius)
        elif not isinstance(radius, jax.core.Tracer):
            static_r_hi = float(jnp.max(jnp.asarray(radius)))
    elif radius_range is not None:
        static_r_hi = float(radius_range[1])
    else:
        static_r_hi = float(config.R)
    if radius is not None:
        radius = jnp.asarray(radius, jnp.float32)
    else:
        radius = config.R
    if radius_range is not None:
        # fold_in (not a wider split) keeps the theta/speech/rt60 streams
        # identical to a radius_range=None run with the same key
        radius = jax.random.uniform(
            jax.random.fold_in(key, 7), (batch,),
            minval=float(radius_range[0]), maxval=float(radius_range[1]),
        )
        if fixed_rir:
            radius = jnp.broadcast_to(radius[:1], radius.shape)
    r_idx = None
    if rir_bank_radii is not None and bank_mix_prob is None:
        # same fold_in slot as radius_range — it IS the radius stream, just
        # grid-valued; every other stream stays identical either way
        r_idx = jax.random.randint(
            jax.random.fold_in(key, 7), (batch,), 0, rir_bank_radii.shape[0]
        )
        if fixed_rir:
            r_idx = jnp.broadcast_to(r_idx[:1], r_idx.shape)
        radius = rir_bank_radii[r_idx]
    src = source_coordinates(theta, receiver, room, radius=radius, z_loc=config.Z_LOC_SOURCE)

    if speech is None:
        speech = synthetic_speech_batch(k_speech, batch, config.audio_samples, config.fs)
    if fixed_speech:
        speech = jnp.broadcast_to(speech[:1], speech.shape)

    rir_kw = dict(
        receiver=receiver,
        room=tuple(config.room_dimensions),
        nsample=config.n_sample,
        fs=float(config.fs),
        c=config.c,
        chunk=rir_chunk,
    )
    if geom_cull and static_r_hi is not None:
        # Geometry-boxed static culling (round 4): the receiver is fixed and
        # every source this call can draw lies inside the box — exact by
        # construction, fewer lattice rows + tighter K than the room cull.
        sbox, rbox = geometry_boxes(config, static_r_hi)
        rir_kw.update(source_box=sbox, receiver_box=rbox)
    if rir_bank is not None and bank_mix_prob is None:
        if rir_bank.ndim == 2:
            h = rir_bank[idx]
        else:  # leading T60 grid axis (length 1 when built without rt60s)
            t60_idx = jax.random.randint(k_rt60, (batch,), 0, rir_bank.shape[0])
            if fixed_rir:
                t60_idx = jnp.broadcast_to(t60_idx[:1], t60_idx.shape)
            h = rir_bank[(t60_idx, idx) if r_idx is None else (t60_idx, r_idx, idx)]
    elif rt60_range is not None:
        lo, hi = float(rt60_range[0]), float(rt60_range[1])
        rt60 = jax.random.uniform(k_rt60, (batch,), minval=lo, maxval=hi)
        if fixed_rir:
            rt60 = jnp.broadcast_to(rt60[:1], rt60.shape)
        from ..dsp.rir import beta_from_rt60_traced

        betas = beta_from_rt60_traced(rir_kw["room"], rt60, config.c)
        rir_fn = functools.partial(generate_rir, **rir_kw)
        if fixed_rir:
            h = jnp.broadcast_to(
                rir_fn(src[0], beta_traced=betas[0])[None], (batch, config.n_sample)
            )
        else:
            h = jax.vmap(lambda s, b: rir_fn(s, beta_traced=b))(src, betas)
    else:
        rir_fn = functools.partial(
            generate_rir, rt60=config.reverberation_time, **rir_kw
        )
        if fixed_rir:
            h = jnp.broadcast_to(rir_fn(src[0])[None], (batch, config.n_sample))
        else:
            h = jax.vmap(rir_fn)(src)

    if bank_mix_prob is not None:
        # Per-sample bank/exact mixing: snap the continuous draw to the bank
        # grid for the bank-chosen samples. Own fold_in streams (mask: 23,
        # bank T60 index: 29) keep every continuous draw identical to a
        # bank_mix_prob=None run with the same key.
        n_theta = rir_bank.shape[-2]
        cell = 2.0 * jnp.pi / n_theta
        t_idx = jnp.clip(
            jnp.floor((theta + jnp.pi) / cell).astype(jnp.int32), 0, n_theta - 1
        )
        theta_grid = -jnp.pi + (t_idx.astype(jnp.float32) + 0.5) * cell
        radius_b = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (batch,))
        radius_snapped = radius_b
        if rir_bank.ndim == 2:
            h_bank = rir_bank[t_idx]
        else:
            # The bank's T60-axis grid values aren't carried with the array,
            # so the bank side draws a uniform grid index (T60 is domain
            # randomization, not a label — no consistency to preserve).
            t60_idx = jax.random.randint(
                jax.random.fold_in(key, 29), (batch,), 0, rir_bank.shape[0]
            )
            if rir_bank.ndim == 3:
                h_bank = rir_bank[t60_idx, t_idx]
            else:
                ridx = jnp.argmin(
                    jnp.abs(radius_b[:, None] - rir_bank_radii[None, :]), axis=1
                )
                h_bank = rir_bank[t60_idx, ridx, t_idx]
                radius_snapped = rir_bank_radii[ridx]
        use_bank = (
            jax.random.uniform(jax.random.fold_in(key, 23), (batch,))
            < float(bank_mix_prob)
        )
        h = jnp.where(use_bank[:, None], h_bank, h)
        theta = jnp.where(use_bank, theta_grid, theta)
        radius = jnp.where(use_bank, radius_snapped, radius_b)

    echoed = fft_convolve(speech, h, mode="same")
    if snr_range is not None:
        # fold_in-derived streams (like the radius draw above) keep every
        # other random stream identical to an un-noised run with this key
        snr_db = jax.random.uniform(
            jax.random.fold_in(key, 11), (batch,),
            minval=float(snr_range[0]), maxval=float(snr_range[1]),
        )
        noise = jax.random.normal(jax.random.fold_in(key, 13), echoed.shape)
        p_sig = jnp.mean(jnp.square(echoed), axis=-1)
        noise_std = jnp.sqrt(p_sig * jnp.power(10.0, -snr_db / 10.0))
        if snr_clean_prob:
            # mixed curriculum: zero the noise on the clean draws; a separate
            # fold_in stream keeps the noisy samples' SNR/noise identical to
            # a snr_clean_prob=0 run with the same key
            keep = (
                jax.random.uniform(jax.random.fold_in(key, 19), (batch,))
                >= float(snr_clean_prob)
            )
            noise_std = jnp.where(keep, noise_std, 0.0)
        echoed = echoed + noise_std[:, None] * noise

    speech_spec = _complex_spectrogram(speech, config)  # complex (B, F, T)
    echoed_spec = _complex_spectrogram(echoed, config)

    rir_spec = jax.vmap(rir_spec_ratio)(speech_spec, echoed_spec)
    wiener = wiener_estimate(speech_spec, echoed_spec)  # (B, F)

    return SampleBatch(
        speech_spec=_power_truncated(speech_spec, config),
        rir_spec=_power_truncated(rir_spec, config),
        echoed_spec=_power_truncated(echoed_spec, config),
        fs=jnp.full((batch,), config.fs, jnp.int32),
        theta=theta,
        wiener_est=wiener,
        radius=jnp.broadcast_to(
            jnp.asarray(radius, jnp.float32), (batch,)
        ),
    )


def prune_batch(
    batch: SampleBatch, keep_fields, store_dtype=None
) -> SampleBatch:
    """Shrink a SampleBatch for resident storage: 3-D spectrogram leaves not
    in ``keep_fields`` become (B, 0, 0) placeholders (structure preserved,
    zero bytes), and kept floating leaves optionally cast to ``store_dtype``
    (bf16 halves HBM; the Trainer casts back to f32 at batch-sampling time).
    The small 1-D leaves (fs, theta, radius) always survive."""
    def prune(name, a):
        if a.ndim == 3 and name not in keep_fields:
            return jnp.zeros((a.shape[0], 0, 0), a.dtype)
        if name == "wiener_est" and name not in keep_fields:
            return jnp.zeros((a.shape[0], 0), a.dtype)
        if store_dtype is not None and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2:
            return a.astype(store_dtype)
        return a

    return SampleBatch(
        **{
            name: prune(name, getattr(batch, name))
            for name in (
                "speech_spec", "rir_spec", "echoed_spec", "fs", "theta",
                "wiener_est", "radius",
            )
        }
    )


def make_dataset(
    key: jax.Array,
    size: int,
    config: DatasetConfig = DatasetConfig(),
    batch: int = 32,
    speech_pool=None,
    keep_fields=None,
    store_dtype=None,
    **kwargs,
) -> SampleBatch:
    """Generate a ``size``-sample dataset by concatenating jitted batches
    (device-resident; ~1.2 MB/sample in f32).

    ``speech_pool``: optional (n, audio_samples) real-corpus waveforms (e.g.
    from :func:`..data.speech.load_wav_dir`); each sample convolves a
    uniformly drawn utterance from the pool — the reference's
    random-LibriSpeech-utterance-per-sample role (genereate_dataset.py:93-97).
    Default draws from the on-device synthetic source-filter generator.

    ``keep_fields`` / ``store_dtype``: resident-storage compression for
    20k-scale single-stage datasets (reference names a ``20k_set``,
    train_rir.py:121; all leaves in f32 would need 24 GB — over one chip's
    HBM): keep only the stage's :attr:`..train.tasks.Task.resident_fields`
    and store spectra in bf16 — 20k x speech = 4 GB. Pruning happens
    per-synthesis-batch, so the transient footprint stays batch-sized.
    """
    if size <= 0:
        raise ValueError(f"dataset size must be positive, got {size}")
    if speech_pool is not None:
        speech_pool = np.asarray(speech_pool, np.float32)
        if speech_pool.shape[1] != config.audio_samples:
            raise ValueError(
                f"speech_pool length {speech_pool.shape[1]} != config.audio_samples "
                f"{config.audio_samples}"
            )

    buf = None
    for i in range(0, size, batch):
        key, sub = jax.random.split(key)
        b = min(batch, size - i)
        kw = dict(kwargs)
        if speech_pool is not None:
            sub, k_pick = jax.random.split(sub)
            idx = np.asarray(jax.random.randint(k_pick, (b,), 0, speech_pool.shape[0]))
            kw["speech"] = jnp.asarray(speech_pool[idx])
        made = synthesize_batch(sub, b, config, **kw)
        if keep_fields is not None or store_dtype is not None:
            made = prune_batch(
                made,
                keep_fields
                if keep_fields is not None
                else ("speech_spec", "rir_spec", "echoed_spec", "wiener_est"),
                store_dtype,
            )
        if buf is None:
            buf = jax.tree_util.tree_map(
                lambda a: jnp.zeros((size,) + a.shape[1:], a.dtype), made
            )
        buf = _insert(buf, made, jnp.int32(i))
    return _pin_default_layout(buf)


# Assemble into a PREALLOCATED buffer with a donating jitted insert: the
# peak footprint is dataset + one batch. (Keeping every sub-batch alive
# and concatenating at the end doubles the peak — 8 GB transient for a
# 20k bf16 set — and OOMs the chip.) Module-level so jit's cache persists
# across make_dataset calls: a host-staged 20k build calls make_dataset
# once per chunk, and a closure-local jit would recompile the identical
# insert program every time through the slow remote-compile tunnel.
@functools.partial(jax.jit, donate_argnums=0)
def _insert(buf, chunk, start):
    return jax.tree_util.tree_map(
        lambda o, c: jax.lax.dynamic_update_slice_in_dim(o, c, start, axis=0),
        buf, chunk,
    )


def _pin_default_layout(tree):
    """Force row-major (default) device layouts on a resident dataset.

    XLA assigns the synthesis program's preferred OUTPUT layout to the
    buffer; jit then compiles the training step against that parameter
    layout and inserts a WHOLE-DATASET relayout copy in every step (measured:
    rir step 4.6 -> 15.6 ms at 16k rows, pure O(n) layout-copy). One
    explicit relayout here makes the per-step cost size-independent."""
    try:
        from jax.experimental.layout import Format, Layout
    except ImportError:  # older jax: no layout control, nothing to pin
        return tree

    def fix(a):
        fmt = getattr(a, "format", None)
        if a.ndim < 2 or fmt is None or getattr(fmt, "layout", None) is None:
            return a
        want = tuple(range(a.ndim))
        if tuple(fmt.layout.major_to_minor) == want:
            return a
        return jax.device_put(a, Format(Layout(want), a.sharding))

    return jax.tree_util.tree_map(fix, tree)
