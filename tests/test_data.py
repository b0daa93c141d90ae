"""Data-layer tests: on-device synthesis, dataset round-trips (native npz and
reference .pt formats), collate parity, and in-memory sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D

# Small config so CPU tests stay fast: short audio, short RIR.
SMALL = D.DatasetConfig(n_sample=512, audio_samples=16000, num_frames=100)


def test_synthesize_batch_shapes_and_ranges():
    b = D.synthesize_batch(jax.random.PRNGKey(0), 4, SMALL, rir_chunk=2048)
    assert b.speech_spec.shape == (4, 201, 100)
    assert b.rir_spec.shape == (4, 201, 100)
    assert b.echoed_spec.shape == (4, 201, 100)
    assert b.wiener_est.shape == (4, 201)
    assert b.theta.shape == (4,)
    assert np.all(np.asarray(b.theta) >= -np.pi) and np.all(np.asarray(b.theta) <= np.pi)
    # power spectra are nonnegative and non-degenerate
    for s in (b.speech_spec, b.echoed_spec):
        arr = np.asarray(s)
        assert arr.min() >= 0.0 and arr.max() > 0.0
    # rir_spec was max-normalized in the complex domain before squaring
    assert np.asarray(b.rir_spec).max() <= 1.0 + 1e-5


def test_synthesize_fixed_modes():
    b = D.synthesize_batch(
        jax.random.PRNGKey(1), 3, SMALL, fixed_rir=True, fixed_speech=True, rir_chunk=2048
    )
    theta = np.asarray(b.theta)
    np.testing.assert_array_equal(theta, np.full_like(theta, theta[0]))
    sp = np.asarray(b.speech_spec)
    np.testing.assert_array_equal(sp[0], sp[1])


def test_synthesis_is_deterministic_in_key():
    a = D.synthesize_batch(jax.random.PRNGKey(7), 2, SMALL, rir_chunk=2048)
    b = D.synthesize_batch(jax.random.PRNGKey(7), 2, SMALL, rir_chunk=2048)
    np.testing.assert_array_equal(np.asarray(a.echoed_spec), np.asarray(b.echoed_spec))


def test_dataset_roundtrip_npz(tmp_path):
    batch = D.synthesize_batch(jax.random.PRNGKey(2), 3, SMALL, rir_chunk=2048)
    D.save_dataset(str(tmp_path), batch, SMALL)
    ds = D.SpecsDataset(str(tmp_path))
    assert len(ds) == 3
    assert ds.fs == 16000 and ds.NFFT == 400  # reference attr surface
    speech, rir, echoed, fs, theta, wiener = ds[1]
    np.testing.assert_allclose(speech, np.asarray(batch.speech_spec[1]))
    np.testing.assert_allclose(wiener, np.asarray(batch.wiener_est[1]))
    coords = ds.get_source_coordinates(np.asarray(batch.theta))
    assert coords.shape == (3, 3)
    assert (coords <= np.asarray(ds.room_dimensions) + 1e-9).all()


def test_dataset_roundtrip_reference_pt_format(tmp_path):
    """Framework-written .pt files read back through the same tuple contract
    the reference trainers rely on (specsdataset.py:31-36)."""
    batch = D.synthesize_batch(jax.random.PRNGKey(3), 2, SMALL, rir_chunk=2048)
    D.save_dataset_reference_format(str(tmp_path), batch, SMALL)
    import torch

    loaded = torch.load(str(tmp_path / "0.pt"), weights_only=False)
    assert len(loaded) == 6
    ds = D.SpecsDataset(str(tmp_path))
    speech, rir, echoed, fs, theta, wiener = ds[0]
    np.testing.assert_allclose(speech, np.asarray(batch.speech_spec[0]), rtol=1e-6)
    assert fs == 16000


def test_collate_drop_and_truncate():
    f = 201
    long = np.ones((f, 600))
    short = np.ones((f, 100))
    mk = lambda spec: (spec, spec, spec, 16000, np.array([0.5]), np.ones(f))
    out = D.spec_dataset_preprocessing([mk(long), mk(short), mk(long)], num_frames=500)
    assert out[0].shape == (2, f, 500)  # short sample dropped
    empty = D.spec_dataset_preprocessing([mk(short)], num_frames=500)
    assert all(x == [] for x in empty)


def test_in_memory_sampling():
    batch = D.synthesize_batch(jax.random.PRNGKey(4), 8, SMALL, rir_chunk=2048)
    ds = D.InMemoryDataset(batch)
    sub = ds.sample_batch(jax.random.PRNGKey(0), 4)
    assert sub.speech_spec.shape[0] == 4
    # without-replacement sampling: all rows distinct
    rows = np.asarray(sub.theta)
    assert len(np.unique(rows)) == 4
    # different key -> (almost surely) different batch
    sub2 = ds.sample_batch(jax.random.PRNGKey(1), 4)
    assert not np.array_equal(np.asarray(sub.theta), np.asarray(sub2.theta))


def test_echoed_differs_from_clean_and_has_reverb_energy():
    b = D.synthesize_batch(jax.random.PRNGKey(5), 2, SMALL, rir_chunk=2048)
    clean = np.asarray(b.speech_spec)
    echoed = np.asarray(b.echoed_spec)
    assert np.abs(clean - echoed).max() > 1e-6


def _write_wavs(path, n, num_samples, fs=16000):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(n):
        w = (rng.standard_normal(num_samples) * 0.2).astype(np.float32)
        if i == 0:  # int16 (the common corpus encoding)
            wavfile.write(str(path / f"a{i}.wav"), fs, (w * 32767).astype(np.int16))
        elif i == 1:  # stereo -> mono mean
            wavfile.write(str(path / f"b{i}.wav"), fs, np.stack([w, w], axis=1))
        elif i == 2:  # short clip -> zero-padded
            wavfile.write(str(path / f"c{i}.wav"), fs, w[: num_samples // 2])
        else:
            wavfile.write(str(path / f"d{i}.wav"), fs, w)


def test_load_wav_dir_formats_and_padding(tmp_path):
    """The real-corpus reader (speech.py load_wav_dir): int16 scaling, stereo
    downmix, crop/pad to num_samples, deterministic file order."""
    from acoustic_locating_vq_vae_tpu.data.speech import load_wav_dir

    N = 1600
    _write_wavs(tmp_path, 5, N)
    pool = load_wav_dir(str(tmp_path), N)
    assert pool.shape == (5, N) and pool.dtype == np.float32
    assert np.abs(pool).max() <= 1.0 + 1e-6  # int16 scaled into [-1, 1]
    assert np.all(pool[2, N // 2:] == 0.0)  # short clip zero-padded
    # limit= caps file count
    assert load_wav_dir(str(tmp_path), N, limit=2).shape[0] == 2
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_wav_dir(str(empty), N)


def test_make_dataset_from_wav_pool(tmp_path):
    """End-to-end real-corpus path: wavs -> load_wav_dir -> make_dataset
    (speech_pool=) -> SampleBatch whose speech_spec is the STFT of pool
    utterances (genereate_dataset.py:93-97 role)."""
    from acoustic_locating_vq_vae_tpu import dsp
    from acoustic_locating_vq_vae_tpu.data.speech import load_wav_dir

    cfg = D.DatasetConfig(
        n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32
    )
    _write_wavs(tmp_path, 4, cfg.audio_samples)
    pool = load_wav_dir(str(tmp_path), cfg.audio_samples)

    batch = D.make_dataset(jax.random.PRNGKey(0), 6, cfg, batch=3, speech_pool=pool)
    assert batch.speech_spec.shape == (6, cfg.num_freq, cfg.num_frames)
    assert np.isfinite(np.asarray(batch.echoed_spec)).all()

    # every sample's clean spectrogram matches some pool utterance's STFT
    pool_specs = np.abs(np.asarray(
        dsp.spectrogram(jnp.asarray(pool), n_fft=cfg.NFFT, hop_length=cfg.HOP_LENGTH)
    )) ** 2
    pool_specs = pool_specs[:, :, : cfg.num_frames]
    got = np.asarray(batch.speech_spec)
    for i in range(got.shape[0]):
        dmin = min(np.abs(got[i] - ps).max() for ps in pool_specs)
        assert dmin < 1e-4, f"sample {i} matches no pool utterance (min diff {dmin})"

    # size mismatch is rejected loudly
    with pytest.raises(ValueError):
        D.make_dataset(jax.random.PRNGKey(0), 2, cfg, speech_pool=pool[:, :100])


# ---------------------------------------------------------------- librispeech


def _fabricate_librispeech(root, url="train-clean-100", n_long=2, fs=16000):
    """Write a minimal LibriSpeech on-disk layout with scipy-readable wavs."""
    import os

    from scipy.io import wavfile

    base = os.path.join(str(root), "LibriSpeech", url)
    rng = np.random.RandomState(0)
    paths = []
    for spk, chp in (("19", "198"), ("26", "495")):
        d = os.path.join(base, spk, chp)
        os.makedirs(d, exist_ok=True)
        for utt in range(n_long):
            w = (rng.randn(4000) * 8000).astype(np.int16)
            path = os.path.join(d, f"{spk}-{chp}-{utt:04d}.wav")
            wavfile.write(path, fs, w)
            paths.append(path)
    # One SHORT utterance that must be zero-padded.
    short = os.path.join(base, "19", "198", "19-198-9999.wav")
    wavfile.write(short, fs, (rng.randn(100) * 8000).astype(np.int16))
    return base


def test_load_librispeech_layout(tmp_path):
    """Walks the standard <root>/LibriSpeech/<url>/<spk>/<chp>/ layout
    without torchaudio, pads/crops to num_samples, normalizes int16."""
    from acoustic_locating_vq_vae_tpu.data.speech import load_librispeech

    _fabricate_librispeech(tmp_path)
    pool = load_librispeech(str(tmp_path), num_samples=2000)
    assert pool.shape == (5, 2000) and pool.dtype == np.float32
    assert np.abs(pool).max() <= 1.0
    # The short utterance (sorted last in its chapter -> index 2) is padded.
    assert np.all(pool[2, 100:] == 0.0) and np.any(pool[2, :100] != 0.0)
    # limit= caps the utterance count.
    assert load_librispeech(str(tmp_path), num_samples=2000, limit=3).shape[0] == 3
    # direct <root>/<url> layout (no LibriSpeech/ level) also resolves
    pool2 = load_librispeech(str(tmp_path / "LibriSpeech"), num_samples=2000)
    assert pool2.shape == (5, 2000)
    np.testing.assert_array_equal(pool, pool2)


def test_load_librispeech_flac_via_soundfile_stub(tmp_path, monkeypatch):
    """.flac utterances decode through soundfile when importable; without it
    the error names the package and the wav conversion escape hatch."""
    import os
    import sys
    import types

    from acoustic_locating_vq_vae_tpu.data.speech import load_librispeech

    d = os.path.join(str(tmp_path), "LibriSpeech", "dev-clean", "84", "121123")
    os.makedirs(d)
    flac = os.path.join(d, "84-121123-0000.flac")
    with open(flac, "wb") as f:
        f.write(b"fLaC-not-really")

    stub = types.ModuleType("soundfile")
    stub.read = lambda path, dtype="float32": (
        np.full(300, 0.25, np.float32), 16000
    )
    monkeypatch.setitem(sys.modules, "soundfile", stub)
    pool = load_librispeech(str(tmp_path), url="dev-clean", num_samples=500)
    assert pool.shape == (1, 500)
    assert np.allclose(pool[0, :300], 0.25) and np.all(pool[0, 300:] == 0.0)

    # Without soundfile the built-in decoder (data/flac.py, round 5) takes
    # over — and rejects this fake non-FLAC payload with a clear error
    # instead of the old ImportError (real-file decode is covered in
    # tests/test_flac.py::test_load_librispeech_builtin_flac_fallback).
    monkeypatch.setitem(sys.modules, "soundfile", None)  # import -> ImportError
    with pytest.raises(ValueError, match="truncated metadata"):
        load_librispeech(str(tmp_path), url="dev-clean", num_samples=500)


def test_load_librispeech_missing_split(tmp_path):
    from acoustic_locating_vq_vae_tpu.data.speech import load_librispeech

    with pytest.raises(FileNotFoundError, match="dev-other"):
        load_librispeech(str(tmp_path), url="dev-other")


# ---------------------------------------------------- rt60 domain randomization


def test_synthesize_batch_rt60_range():
    """Per-sample T60 ~ U(lo, hi) inside the one jitted program: a degenerate
    range reproduces the fixed-config batch (same angles/speech; the traced
    Sabine beta matches the static one to f32), and a wide range still yields
    finite spectra."""
    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(42)
    fixed = D.synthesize_batch(key, 4, cfg, rir_chunk=2048)
    degen = D.synthesize_batch(key, 4, cfg, rir_chunk=2048, rt60_range=(0.4, 0.4))
    np.testing.assert_array_equal(np.asarray(fixed.theta), np.asarray(degen.theta))
    np.testing.assert_array_equal(
        np.asarray(fixed.speech_spec), np.asarray(degen.speech_spec)
    )
    np.testing.assert_allclose(
        np.asarray(fixed.echoed_spec), np.asarray(degen.echoed_spec),
        rtol=5e-2, atol=1e-4,
    )

    wide = D.synthesize_batch(key, 4, cfg, rir_chunk=2048, rt60_range=(0.2, 0.6))
    for leaf in jax.tree_util.tree_leaves(wide):
        assert np.isfinite(np.asarray(leaf)).all()
    # randomized reverberation actually changes the echoed spectra
    assert not np.allclose(
        np.asarray(wide.echoed_spec), np.asarray(degen.echoed_spec), rtol=1e-2
    )


def test_synthesize_batch_radius_range():
    """Per-sample source radius R ~ U(lo, hi): a degenerate range at the
    config's R reproduces the fixed batch EXACTLY (the radius key is folded
    in, so the theta/speech/rt60 streams don't move), and a wide range
    changes the echoed spectra while labels stay the fixed angles."""
    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(43)
    fixed = D.synthesize_batch(key, 4, cfg, rir_chunk=2048)
    degen = D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(cfg.R, cfg.R))
    np.testing.assert_array_equal(np.asarray(fixed.theta), np.asarray(degen.theta))
    np.testing.assert_array_equal(
        np.asarray(fixed.speech_spec), np.asarray(degen.speech_spec)
    )
    np.testing.assert_allclose(
        np.asarray(fixed.echoed_spec), np.asarray(degen.echoed_spec),
        rtol=1e-5, atol=1e-6,
    )

    wide = D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(0.6, 1.4))
    np.testing.assert_array_equal(np.asarray(wide.theta), np.asarray(fixed.theta))
    for leaf in jax.tree_util.tree_leaves(wide):
        assert np.isfinite(np.asarray(leaf)).all()
    assert not np.allclose(
        np.asarray(wide.echoed_spec), np.asarray(fixed.echoed_spec), rtol=1e-2
    )

    with pytest.raises(ValueError, match="radius_range"):
        D.synthesize_batch(
            key, 4, cfg, rir_chunk=2048,
            rir_bank=jnp.zeros((8, cfg.n_sample)), radius_range=(0.6, 1.4),
        )


def test_synthesize_batch_radius_range_must_stay_in_room():
    """An oversized radius would push sources outside the room (the
    reference-quirk clip in source_coordinates only covers the UPPER walls),
    silently invalidating the image-source geometry and the static image
    culling — synthesize_batch must reject it up front. Default receiver
    (2.5, 1.5, 1.5) in a (4, 5, 3) room -> max in-room radius 1.5."""
    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="leave the room"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(0.5, 1.6))
    with pytest.raises(ValueError, match="leave the room"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(0.5, 1.5))
    with pytest.raises(ValueError, match="0 < lo <= hi"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(1.4, 0.6))
    with pytest.raises(ValueError, match="0 < lo <= hi"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, radius_range=(0.0, 1.0))


def test_synthesize_batch_snr_range():
    """Per-sample sensor noise at SNR ~ U(lo, hi) dB on the echoed waveform:
    the geometry/speech streams are fold_in-isolated (theta and speech_spec
    match the noiseless run exactly), the observed spectra change, and the
    injected noise power matches the requested SNR (recovered from the
    echoed-spec energy difference via Parseval — the noise is white, so its
    expected power spectrum is flat and the spec-energy delta estimates the
    waveform noise power)."""
    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(44)
    clean = D.synthesize_batch(key, 8, cfg, rir_chunk=2048)
    noisy = D.synthesize_batch(key, 8, cfg, rir_chunk=2048, snr_range=(10.0, 10.0))
    np.testing.assert_array_equal(np.asarray(clean.theta), np.asarray(noisy.theta))
    np.testing.assert_array_equal(
        np.asarray(clean.speech_spec), np.asarray(noisy.speech_spec)
    )
    assert not np.allclose(
        np.asarray(noisy.echoed_spec), np.asarray(clean.echoed_spec), rtol=1e-2
    )
    for leaf in jax.tree_util.tree_leaves(noisy):
        assert np.isfinite(np.asarray(leaf)).all()

    # Empirical SNR: spec energies are |STFT|^2 of signal vs signal+noise;
    # E[sum(noisy) - sum(clean)] = noise energy (cross terms vanish in
    # expectation). Averaged over the batch this recovers the 10 dB target
    # to within sampling noise.
    e_clean = np.asarray(clean.echoed_spec).sum(axis=(1, 2))
    e_noisy = np.asarray(noisy.echoed_spec).sum(axis=(1, 2))
    snr_db = 10.0 * np.log10(e_clean.mean() / max((e_noisy - e_clean).mean(), 1e-30))
    assert 8.0 < snr_db < 12.0, snr_db

    # a very low SNR buries the signal: echoed spec energy far above clean
    loud = D.synthesize_batch(key, 8, cfg, rir_chunk=2048, snr_range=(-20.0, -20.0))
    assert np.asarray(loud.echoed_spec).sum() > 10 * e_clean.sum()

    # composes with the other randomizations in one jitted program
    both = D.synthesize_batch(
        key, 8, cfg, rir_chunk=2048, snr_range=(0.0, 20.0),
        rt60_range=(0.2, 0.6), radius_range=(0.6, 1.4),
    )
    for leaf in jax.tree_util.tree_leaves(both):
        assert np.isfinite(np.asarray(leaf)).all()

    with pytest.raises(ValueError, match="snr_range"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, snr_range=(12.0, 6.0))


def test_synthesize_batch_snr_clean_prob():
    """Mixed clean/noisy curriculum (snr_clean_prob): p=1 reproduces the
    noiseless run exactly; 0<p<1 partitions the batch — every sample matches
    EITHER the clean run or the p=0 noisy run bit-for-bit (the keep mask has
    its own fold_in stream, so the non-clean samples' SNR/noise draws are
    unchanged); and the option validates its domain."""
    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(45)
    clean = D.synthesize_batch(key, 8, cfg, rir_chunk=2048)
    noisy = D.synthesize_batch(key, 8, cfg, rir_chunk=2048, snr_range=(5.0, 15.0))
    all_clean = D.synthesize_batch(
        key, 8, cfg, rir_chunk=2048, snr_range=(5.0, 15.0), snr_clean_prob=1.0
    )
    np.testing.assert_array_equal(
        np.asarray(all_clean.echoed_spec), np.asarray(clean.echoed_spec)
    )
    mixed = D.synthesize_batch(
        key, 8, cfg, rir_chunk=2048, snr_range=(5.0, 15.0), snr_clean_prob=0.5
    )
    is_clean = np.array([
        np.array_equal(np.asarray(mixed.echoed_spec[i]), np.asarray(clean.echoed_spec[i]))
        for i in range(8)
    ])
    is_noisy = np.array([
        np.array_equal(np.asarray(mixed.echoed_spec[i]), np.asarray(noisy.echoed_spec[i]))
        for i in range(8)
    ])
    assert (is_clean | is_noisy).all()  # every sample is one or the other
    assert is_clean.any() and is_noisy.any()  # p=0.5 on B=8: both present

    with pytest.raises(ValueError, match="snr_clean_prob"):
        D.synthesize_batch(
            key, 4, cfg, rir_chunk=2048, snr_range=(5.0, 15.0), snr_clean_prob=1.5
        )
    with pytest.raises(ValueError, match="requires snr_range"):
        D.synthesize_batch(key, 4, cfg, rir_chunk=2048, snr_clean_prob=0.5)


# ------------------------------------------------------------------ RIR bank


def test_rir_bank_rows_match_direct_generation():
    """Bank row i IS generate_rir at the grid angle theta_i."""
    from acoustic_locating_vq_vae_tpu import dsp
    from acoustic_locating_vq_vae_tpu.data.synth import bank_thetas, make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    bank = make_rir_bank(cfg, n_theta=8, chunk=2048, batch=4)
    assert bank.shape == (8, cfg.n_sample)
    thetas = bank_thetas(8)
    recv = jnp.asarray(cfg.receiver_position, jnp.float32)
    room = jnp.asarray(cfg.room_dimensions, jnp.float32)
    src = dsp.source_coordinates(jnp.asarray(thetas), recv, room, radius=cfg.R, z_loc=cfg.Z_LOC_SOURCE)
    for i in (0, 3, 7):
        want = dsp.generate_rir(
            src[i], recv, room=tuple(cfg.room_dimensions), nsample=cfg.n_sample,
            fs=float(cfg.fs), c=cfg.c, rt60=cfg.reverberation_time, chunk=2048,
        )
        np.testing.assert_allclose(np.asarray(bank[i]), np.asarray(want), rtol=1e-5, atol=1e-8)


def test_synthesize_batch_from_bank_matches_direct_pipeline():
    """Bank-based OTF synthesis: each sample's theta label lands on the grid
    and its echoed spectrogram equals the full image-source pipeline run at
    exactly that angle with the same speech."""
    from acoustic_locating_vq_vae_tpu import dsp
    from acoustic_locating_vq_vae_tpu.data.synth import bank_thetas, make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    bank = make_rir_bank(cfg, n_theta=16, chunk=2048, batch=8)
    key = jax.random.PRNGKey(3)
    speech = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (4, cfg.audio_samples)) * 0.1
    )
    b = D.synthesize_batch(key, 4, cfg, speech=jnp.asarray(speech), rir_bank=bank, rir_chunk=2048)
    thetas = np.asarray(b.theta)
    grid = bank_thetas(16)
    for t in thetas:
        assert np.min(np.abs(grid - t)) < 1e-6  # labels on the grid

    # re-synthesize the echoed specs the slow way at the same angles
    recv = jnp.asarray(cfg.receiver_position, jnp.float32)
    room = jnp.asarray(cfg.room_dimensions, jnp.float32)
    src = dsp.source_coordinates(jnp.asarray(thetas), recv, room, radius=cfg.R, z_loc=cfg.Z_LOC_SOURCE)
    h = dsp.generate_rir_batch(
        src, recv, room=tuple(cfg.room_dimensions), nsample=cfg.n_sample,
        fs=float(cfg.fs), c=cfg.c, rt60=cfg.reverberation_time, chunk=2048,
    )
    echoed = dsp.fft_convolve(jnp.asarray(speech), h, mode="same")
    spec = dsp.spectrogram(echoed, n_fft=cfg.NFFT, hop_length=cfg.HOP_LENGTH, power=None, normalized=True)
    want = (np.abs(np.asarray(spec)) ** 2)[..., : cfg.num_frames]
    np.testing.assert_allclose(np.asarray(b.echoed_spec), want, rtol=1e-4, atol=1e-7)


def test_rir_bank_3d_t60_axis():
    """A (n_t60, n_theta, n_sample) bank draws a per-sample T60 grid index;
    excludes rt60_range."""
    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    bank = make_rir_bank(cfg, n_theta=4, rt60s=(0.3, 0.5), chunk=2048, batch=4)
    assert bank.shape == (2, 4, cfg.n_sample)
    assert not np.allclose(np.asarray(bank[0]), np.asarray(bank[1]))
    b = D.synthesize_batch(jax.random.PRNGKey(5), 6, cfg, rir_bank=bank, rir_chunk=2048)
    for leaf in jax.tree_util.tree_leaves(b):
        assert np.isfinite(np.asarray(leaf)).all()
    with pytest.raises(ValueError, match="rt60_range"):
        D.synthesize_batch(
            jax.random.PRNGKey(5), 2, cfg, rir_bank=bank, rt60_range=(0.2, 0.6)
        )


def test_rir_bank_radius_axis_matches_direct_pipeline():
    """A radius-gridded bank (make_rir_bank radii=) draws per-sample
    (theta, radius) grid labels whose echoed spectrograms equal the exact
    image-source pipeline at that geometry — 2-D polar training can draw
    from the bank and its labels stay exact at grid points."""
    from acoustic_locating_vq_vae_tpu import dsp
    from acoustic_locating_vq_vae_tpu.data.synth import bank_thetas, make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    radii = (0.7, 1.2)
    bank = make_rir_bank(cfg, n_theta=8, radii=radii, chunk=2048, batch=4)
    # radii= ALWAYS yields the 4-D layout (n_t60=1 without rt60s): a 3-D
    # radius bank would be shape-indistinguishable from a T60 bank and,
    # consumed without its radii values, would silently mislabel radii
    assert bank.shape == (1, 2, 8, cfg.n_sample)
    assert not np.allclose(np.asarray(bank[0, 0]), np.asarray(bank[0, 1]))

    speech = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (6, cfg.audio_samples)) * 0.1
    )
    b = D.synthesize_batch(
        jax.random.PRNGKey(9), 6, cfg, speech=jnp.asarray(speech),
        rir_bank=bank, rir_bank_radii=jnp.asarray(radii, jnp.float32),
        rir_chunk=2048,
    )
    th = np.asarray(b.theta)
    rr = np.asarray(b.radius)
    grid = bank_thetas(8)
    for t in th:
        assert np.min(np.abs(grid - t)) < 1e-6  # theta labels on the grid
    dist = np.abs(rr[:, None] - np.asarray(radii, np.float32)[None, :])
    assert (dist.min(axis=1) < 1e-6).all()  # radius labels on the grid
    assert len(set(dist.argmin(axis=1).tolist())) == 2  # seed-pinned: both drawn

    # re-synthesize the echoed specs the slow way at the same (theta, radius)
    recv = jnp.asarray(cfg.receiver_position, jnp.float32)
    room = jnp.asarray(cfg.room_dimensions, jnp.float32)
    src = dsp.source_coordinates(
        jnp.asarray(th), recv, room, radius=jnp.asarray(rr), z_loc=cfg.Z_LOC_SOURCE
    )
    h = dsp.generate_rir_batch(
        src, recv, room=tuple(cfg.room_dimensions), nsample=cfg.n_sample,
        fs=float(cfg.fs), c=cfg.c, rt60=cfg.reverberation_time, chunk=2048,
    )
    echoed = dsp.fft_convolve(jnp.asarray(speech), h, mode="same")
    spec = dsp.spectrogram(echoed, n_fft=cfg.NFFT, hop_length=cfg.HOP_LENGTH, power=None, normalized=True)
    want = (np.abs(np.asarray(spec)) ** 2)[..., : cfg.num_frames]
    np.testing.assert_allclose(np.asarray(b.echoed_spec), want, rtol=1e-4, atol=1e-7)


def test_rir_bank_4d_and_radius_validation():
    """The full (n_t60, n_r, n_theta, n_sample) bank synthesizes finitely;
    the radius-axis plumbing rejects every inconsistent combination."""
    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    radii = jnp.asarray((0.8, 1.1), jnp.float32)
    bank = make_rir_bank(
        cfg, n_theta=4, rt60s=(0.3, 0.5), radii=(0.8, 1.1), chunk=2048, batch=4
    )
    assert bank.shape == (2, 2, 4, cfg.n_sample)
    b = D.synthesize_batch(
        jax.random.PRNGKey(2), 6, cfg, rir_bank=bank, rir_bank_radii=radii,
        rir_chunk=2048,
    )
    for leaf in jax.tree_util.tree_leaves(b):
        assert np.isfinite(np.asarray(leaf)).all()
    dist = np.abs(np.asarray(b.radius)[:, None] - np.asarray(radii)[None, :])
    assert (dist.min(axis=1) < 1e-6).all()  # radius labels on the grid

    key = jax.random.PRNGKey(2)
    with pytest.raises(ValueError, match="rir_bank_radii"):
        # 4-D bank without its radius grid values
        D.synthesize_batch(key, 2, cfg, rir_bank=bank, rir_chunk=2048)
    with pytest.raises(ValueError, match="requires rir_bank"):
        D.synthesize_batch(key, 2, cfg, rir_bank_radii=radii, rir_chunk=2048)
    with pytest.raises(ValueError, match="radius axis"):
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank,
            rir_bank_radii=jnp.asarray((0.8, 1.1, 1.4), jnp.float32),
            rir_chunk=2048,
        )
    with pytest.raises(ValueError, match="given radius excludes"):
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank, rir_bank_radii=radii,
            radius=jnp.full((2,), 0.8), rir_chunk=2048,
        )
    with pytest.raises(ValueError, match="ndim"):
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank[0, 0], rir_bank_radii=radii,
            rir_chunk=2048,
        )
    with pytest.raises(ValueError, match="4-D"):
        # a 3-D bank is unambiguously T60-gridded — pairing it with radius
        # grid values is the layout mistake the 4-D-only contract catches
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank[:, 0], rir_bank_radii=radii,
            rir_chunk=2048,
        )
    with pytest.raises(ValueError, match="rir_bank_radii"):
        # a radius-only bank (4-D with n_t60=1) dropped its radii values:
        # before the 4-D-always contract this silently fell into the T60
        # branch and mislabeled every radius as config.R
        radius_only = make_rir_bank(cfg, n_theta=4, radii=(0.8, 1.1), chunk=2048, batch=4)
        assert radius_only.shape == (1, 2, 4, cfg.n_sample)
        D.synthesize_batch(key, 2, cfg, rir_bank=radius_only, rir_chunk=2048)
    with pytest.raises(ValueError, match="leave the room"):
        # default receiver (2.5, 1.5, 1.5) in a (4, 5, 3) room -> max 1.5
        make_rir_bank(cfg, n_theta=4, radii=(0.8, 1.5), chunk=2048, batch=4)


def test_rir_bank_coarse_radius_grid_warns():
    """Radius grids coarser than ~5 cm get the off-grid near-field advisory
    (the run-G finding, VALIDATION.md): bank-only training on a coarse grid
    localizes ON the grid but collapses centimeters off it at near range.
    Fine grids stay silent."""
    import warnings

    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank

    cfg = D.DatasetConfig(n_sample=256, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    with pytest.warns(UserWarning, match="OFF-grid"):
        make_rir_bank(cfg, n_theta=4, radii=(0.8, 1.1), chunk=2048, batch=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # 4 cm spacing (and a single radius) stay under the advisory
        make_rir_bank(cfg, n_theta=4, radii=(0.8, 0.84), chunk=2048, batch=4)
        make_rir_bank(cfg, n_theta=4, radii=(0.8,), chunk=2048, batch=4)


# ------------------------------------------------------------ batch sampler


def test_sample_without_replacement_uniform():
    """The O(k^2) virtual Fisher-Yates sampler: distinct in-range indices,
    and exactly uniform over subsets (chi-square-loose over n=6, k=3)."""
    from collections import Counter

    from acoustic_locating_vq_vae_tpu.data.dataset import sample_without_replacement

    for seed in range(10):
        out = np.asarray(sample_without_replacement(jax.random.PRNGKey(seed), 1000, 32))
        assert len(set(out.tolist())) == 32
        assert out.min() >= 0 and out.max() < 1000

    f = jax.jit(lambda k: sample_without_replacement(k, 6, 3))
    cnt = Counter(
        tuple(sorted(np.asarray(f(jax.random.PRNGKey(s))).tolist()))
        for s in range(3000)
    )
    assert len(cnt) == 20  # all C(6,3) subsets occur
    exp = 3000 / 20
    assert max(abs(v - exp) for v in cnt.values()) / exp < 0.3, cnt


def test_synthesize_batch_given_geometry():
    """Given-geometry synthesis (synthesize_batch(theta=, radius=)): the
    random streams are consumed identically either way, so feeding back the
    geometry a random draw produced reproduces that draw. Labels land
    verbatim. The spectrogram fields are compared to f32-accumulation
    tolerance, not bitwise: the replay program takes theta/radius as
    OPERANDS where the drawn program folded a constant radius, and XLA may
    fuse the two programs differently (measured: bit-equal on TPU, ~4e-8
    on CPU). rir_spec is a near-null-bin ratio that amplifies e-8 waveform
    noise, so it is compared only on well-conditioned bins — the same
    caveat test_synthesize_batch_geom_cull_equivalence documents. A
    concrete given radius also reuses the drawn path's geometry-boxed cull
    (static bound = max(radius)), so the culled lattice is identical."""
    key = jax.random.PRNGKey(11)
    drawn = D.synthesize_batch(key, 3, SMALL, rir_chunk=2048)
    replay = D.synthesize_batch(
        key, 3, SMALL, rir_chunk=2048, theta=drawn.theta, radius=drawn.radius
    )
    for name in ("theta", "radius"):
        np.testing.assert_array_equal(
            np.asarray(getattr(drawn, name)), np.asarray(getattr(replay, name))
        )
    for name in ("speech_spec", "echoed_spec"):
        np.testing.assert_allclose(
            np.asarray(getattr(drawn, name)),
            np.asarray(getattr(replay, name)),
            atol=1e-6,
        )
    ok = np.asarray(drawn.echoed_spec) > 1e-4  # well-conditioned ratio bins
    np.testing.assert_allclose(
        np.asarray(drawn.rir_spec)[ok], np.asarray(replay.rir_spec)[ok], atol=1e-3
    )

    theta = jnp.asarray([-3.0, 0.0, 2.0], jnp.float32)
    radius = jnp.asarray([0.6, 1.0, 1.3], jnp.float32)
    b = D.synthesize_batch(key, 3, SMALL, rir_chunk=2048, theta=theta, radius=radius)
    np.testing.assert_array_equal(np.asarray(b.theta), np.asarray(theta))
    np.testing.assert_array_equal(np.asarray(b.radius), np.asarray(radius))
    # scalar radius broadcasts
    b1 = D.synthesize_batch(key, 3, SMALL, rir_chunk=2048, theta=theta, radius=0.8)
    np.testing.assert_array_equal(np.asarray(b1.radius), np.full(3, 0.8, np.float32))
    # distinct geometry -> distinct acoustics
    e = np.asarray(b.echoed_spec)
    assert not np.array_equal(e[0], e[1])


def test_synthesize_batch_given_geometry_exclusions():
    key = jax.random.PRNGKey(12)
    bank = jnp.zeros((4, SMALL.n_sample), jnp.float32)
    with pytest.raises(ValueError, match="theta excludes rir_bank"):
        D.synthesize_batch(key, 2, SMALL, rir_bank=bank, theta=jnp.zeros(2))
    with pytest.raises(ValueError, match="radius excludes radius_range"):
        D.synthesize_batch(
            key, 2, SMALL, radius=jnp.ones(2), radius_range=(0.8, 1.2), rir_chunk=2048
        )


def test_synthesize_batch_geom_cull_equivalence():
    """geom_cull (round 4: geometry-boxed static image culling, on by
    default) changes nothing beyond f32 accumulation order. The raw
    spectrogram leaves agree to ~1e-6; rir_spec is a near-null-bin RATIO
    (speech/(echoed+1e-8)) that amplifies e-8 waveform noise, so it is
    compared only on well-conditioned bins (the same conditioning caveat
    applies to ANY e-8 perturbation — chunking, bf16, accumulation order)."""
    key = jax.random.PRNGKey(11)
    for kwargs in ({}, {"radius_range": (0.2, 0.8)}, {"rt60_range": (0.25, 0.55)}):
        a = D.synthesize_batch(key, 3, SMALL, rir_chunk=2048, geom_cull=True, **kwargs)
        b = D.synthesize_batch(key, 3, SMALL, rir_chunk=2048, geom_cull=False, **kwargs)
        np.testing.assert_allclose(np.asarray(a.speech_spec), np.asarray(b.speech_spec), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.echoed_spec), np.asarray(b.echoed_spec), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.wiener_est), np.asarray(b.wiener_est), atol=1e-7)
        np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))
        np.testing.assert_array_equal(np.asarray(a.radius), np.asarray(b.radius))
        ok = np.asarray(b.echoed_spec) > 1e-4  # well-conditioned ratio bins
        np.testing.assert_allclose(
            np.asarray(a.rir_spec)[ok], np.asarray(b.rir_spec)[ok], atol=1e-3
        )


def test_synthesize_batch_bank_mix():
    """Per-sample mixed bank/exact synthesis (bank_mix_prob, round 5 —
    the fit_joint_recipe boundary softener): bank-chosen samples snap their
    continuous draws to the bank grid (labels match the gathered RIR);
    exact-chosen samples are BIT-IDENTICAL to a bank_mix_prob=None run with
    the same key (the mix mask and bank T60 index ride their own fold_in
    streams)."""
    from acoustic_locating_vq_vae_tpu.data.synth import bank_thetas, make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    radii = (0.7, 1.2)
    bank = make_rir_bank(cfg, n_theta=8, rt60s=(0.3, 0.5), radii=radii, chunk=2048, batch=4)
    assert bank.shape == (2, 2, 8, cfg.n_sample)
    key = jax.random.PRNGKey(21)
    kw = dict(
        rt60_range=(0.3, 0.5), radius_range=(0.6, 1.3), rir_chunk=2048,
    )
    mixed = D.synthesize_batch(
        key, 16, cfg, rir_bank=bank,
        rir_bank_radii=jnp.asarray(radii, jnp.float32),
        bank_mix_prob=0.5, **kw,
    )
    exact = D.synthesize_batch(key, 16, cfg, **kw)

    grid = bank_thetas(8)
    th_m, th_e = np.asarray(mixed.theta), np.asarray(exact.theta)
    r_m, r_e = np.asarray(mixed.radius), np.asarray(exact.radius)
    on_grid = np.min(np.abs(grid[None, :] - th_m[:, None]), axis=1) < 1e-6
    # p=0.5 at B=16: both kinds present for this seed
    assert on_grid.any() and (~on_grid).any()

    cell = 2 * np.pi / 8
    for i in range(16):
        if on_grid[i]:
            # snapped: theta is the center of the cell the exact draw hit,
            # radius is the nearest bank radius to the exact draw
            want_cell = np.clip(np.floor((th_e[i] + np.pi) / cell), 0, 7)
            assert abs(th_m[i] - grid[int(want_cell)]) < 1e-6
            assert r_m[i] in np.asarray(radii, np.float32)
            assert abs(r_m[i] - radii[int(np.argmin(np.abs(np.asarray(radii) - r_e[i])))]) < 1e-7
        else:
            # exact side: the whole sample reproduces the pure-exact run
            assert th_m[i] == th_e[i] and r_m[i] == r_e[i]
            np.testing.assert_array_equal(
                np.asarray(mixed.echoed_spec[i]), np.asarray(exact.echoed_spec[i])
            )
    for leaf in jax.tree_util.tree_leaves(mixed):
        assert np.isfinite(np.asarray(leaf)).all()


def test_synthesize_batch_bank_mix_guards():
    """bank_mix_prob validation: requires a bank, strict (0,1), excludes
    fixed_rir / given geometry, and refuses radius_range without a
    radius-gridded bank (labels could not match the gathered RIRs)."""
    from acoustic_locating_vq_vae_tpu.data.synth import make_rir_bank

    cfg = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
    key = jax.random.PRNGKey(22)
    bank2d = jnp.zeros((8, cfg.n_sample), jnp.float32)
    with pytest.raises(ValueError, match="requires rir_bank"):
        D.synthesize_batch(key, 2, cfg, bank_mix_prob=0.5, rir_chunk=2048)
    with pytest.raises(ValueError, match="strictly between"):
        D.synthesize_batch(key, 2, cfg, rir_bank=bank2d, bank_mix_prob=1.0, rir_chunk=2048)
    with pytest.raises(ValueError, match="excludes fixed_rir"):
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank2d, bank_mix_prob=0.5, fixed_rir=True, rir_chunk=2048
        )
    with pytest.raises(ValueError, match="radius-gridded"):
        D.synthesize_batch(
            key, 2, cfg, rir_bank=bank2d, bank_mix_prob=0.5,
            radius_range=(0.6, 1.3), rir_chunk=2048,
        )
    # a 2-D bank without radius_range is fine (both sides at config.R)
    b = D.synthesize_batch(
        key, 4, cfg, rir_bank=make_rir_bank(cfg, n_theta=8, chunk=2048, batch=4),
        bank_mix_prob=0.5, rir_chunk=2048,
    )
    assert np.isfinite(np.asarray(b.echoed_spec)).all()
    np.testing.assert_array_equal(np.asarray(b.radius), np.full(4, cfg.R, np.float32))
