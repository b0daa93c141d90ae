"""Frozen-latent cache tests: cached echoed/location training matches the
uncached path (same sampled batches, same quantized latents via codebook
lookup, same jitter stream, same metrics) up to f32 rounding — the uncached
path's straight-through value ``x + sg(q - x)`` differs from the exact
codebook row in the last bit, so short trainings agree to ~1e-3 relative.
Also: codes round-trip through codes_to_latent in both VQ flatten modes, and
the cache co-samples correctly under a data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.train import (
    EchoedSpeechTask,
    EncoderFinetuneTask,
    LocationTask,
    Trainer,
)

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


@pytest.fixture(scope="module")
def datasets():
    train = D.make_dataset(jax.random.PRNGKey(0), 32, SMALL, batch=16, rir_chunk=2048)
    val = D.make_dataset(jax.random.PRNGKey(1), 16, SMALL, batch=16, rir_chunk=2048)
    return train, val


@pytest.mark.parametrize("compat_flatten", [True, False])
def test_codes_roundtrip_both_flatten_modes(datasets, compat_flatten):
    """codes_to_latent(get_latent_codes(x)) equals the quantized latent of
    get_latent_representation (up to STE f32 rounding) in both flatten
    modes."""
    train, _ = datasets
    task = EchoedSpeechTask(
        config=SMALL, width_scale=WS, batch_size=4, compat_vq_flatten=compat_flatten
    )
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(2), train)
    x, x_rir = task.model_inputs(jax.tree_util.tree_map(lambda a: a[:4], train))
    model = tr.model
    for sub, inp in (("speech_model", x), ("rir_model", x_rir)):
        m = getattr(model, sub)
        params = {"params": st.params[sub]}
        _, q, _, _ = m.apply(params, inp, method=m.get_latent_representation)
        codes = m.apply(params, inp, method=m.get_latent_codes)
        q2 = m.apply(params, codes, method=m.codes_to_latent)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), rtol=1e-4, atol=1e-6)


def _fit_histories(task, datasets, cache_frozen, mesh=None, composite_params=None, updates=20):
    train, val = datasets
    tr = Trainer(
        task, mesh=mesh, verbose=False, cache_frozen=cache_frozen,
        composite_params=composite_params,
    )
    st = tr.init_state(jax.random.PRNGKey(3), train)
    st, hist = tr.fit(st, train, val, num_updates=updates)
    return hist.finalize(), st


@pytest.mark.parametrize("compat_flatten", [True, False])
def test_cached_echoed_training_is_bit_equivalent(datasets, compat_flatten):
    task = EchoedSpeechTask(
        config=SMALL, width_scale=WS, batch_size=8, eval_every=10,
        compat_vq_flatten=compat_flatten,
    )
    ref, st_ref = _fit_histories(task, datasets, cache_frozen=False)
    got, st_got = _fit_histories(task, datasets, cache_frozen=True)
    for split in ("train", "val"):
        for k in ref[split]:
            np.testing.assert_allclose(
                got[split][k], ref[split][k], rtol=3e-3, atol=1e-5,
                err_msg=f"{split}/{k} diverged under caching",
            )
    # trained decoder params match too (tolerance covers STE-rounding drift
    # amplified through 20 Adam steps; the drift magnitude is trajectory-
    # dependent — changing the batch sampler moves which elements land near
    # the bound, so this is deliberately looser than the metric check above)
    a = jax.device_get(st_ref.params["_decoder"])
    b = jax.device_get(st_got.params["_decoder"])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-2, atol=2e-4), a, b
    )


def test_cache_matches_uncached_on_bf16_dataset(datasets):
    """--dataset-bf16 + cache_frozen: the cache must encode the DECOMPRESSED
    f32 spectra the step trains on, not the raw bf16 storage — VQ argmin
    assignments near code boundaries flip between the two precisions, so an
    undecompressed cache silently diverges from the uncached path."""
    train, val = datasets
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a.ndim == 3 else a, t
    )
    train16, val16 = to_bf16(train), to_bf16(val)
    task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8, eval_every=10)
    ref, _ = _fit_histories(task, (train16, val16), cache_frozen=False)
    got, _ = _fit_histories(task, (train16, val16), cache_frozen=True)
    for split in ("train", "val"):
        for k in ref[split]:
            np.testing.assert_allclose(
                got[split][k], ref[split][k], rtol=3e-3, atol=1e-5,
                err_msg=f"{split}/{k} diverged under caching on a bf16 dataset",
            )


def test_cache_refused_for_unfrozen_or_anchored():
    assert not EncoderFinetuneTask(config=SMALL, width_scale=WS).supports_cache
    assert not EchoedSpeechTask(
        config=SMALL, width_scale=WS, commitment_weight=0.25
    ).supports_cache
    assert EchoedSpeechTask(config=SMALL, width_scale=WS).supports_cache
    assert LocationTask(config=SMALL, width_scale=WS).supports_cache


@pytest.mark.parametrize("input_mode", ["encodings", "quantized"])
def test_cached_location_training_is_bit_equivalent(datasets, input_mode):
    train, _ = datasets
    # a composite to read latents from (fresh init params suffice here)
    echoed = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8)
    comp_tr = Trainer(echoed, verbose=False)
    comp_params = comp_tr.init_state(jax.random.PRNGKey(5), train).params

    task = LocationTask(
        config=SMALL, width_scale=WS, batch_size=8, eval_every=10, input_mode=input_mode
    )
    ref, _ = _fit_histories(task, datasets, False, composite_params=comp_params)
    got, _ = _fit_histories(task, datasets, True, composite_params=comp_params)
    for split in ("train", "val"):
        for k in ref[split]:
            np.testing.assert_allclose(
                got[split][k], ref[split][k], rtol=3e-3, atol=1e-5,
                err_msg=f"{split}/{k} diverged under caching ({input_mode})",
            )


def test_cached_training_under_dp_mesh(datasets):
    """Cache rows co-sample with batch rows under an 8-way data mesh: the
    cached run equals the uncached run on the same mesh."""
    task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8, eval_every=10)
    mesh = make_mesh(data=8)
    ref, _ = _fit_histories(task, datasets, False, mesh=mesh)
    got, _ = _fit_histories(task, datasets, True, mesh=mesh)
    for k in ref["train"]:
        np.testing.assert_allclose(
            got["train"][k], ref["train"][k], rtol=3e-3, atol=1e-5
        )


def test_cached_training_with_resume(datasets, tmp_path):
    """Resume rebuilds the cache AFTER restoring the checkpoint (fit order),
    from the restored params: the resumed state starts bit-equal to the
    interrupted run's step-10 checkpoint and training continues to 20.
    (Trajectory equality with an uninterrupted run is not claimed: the
    sampling rng is not part of the checkpoint.)"""
    train, val = datasets

    def make():
        task = EchoedSpeechTask(config=SMALL, width_scale=WS, batch_size=8, ckpt_every=10)
        tr = Trainer(
            task, verbose=False, cache_frozen=True, checkpoint_dir=str(tmp_path)
        )
        st = tr.init_state(jax.random.PRNGKey(7), train)
        return tr, st

    tr, st = make()
    st10, _ = tr.fit(st, train, val, num_updates=10)
    kern10 = np.asarray(
        jax.device_get(st10.params["_decoder"]["conv_1"]["Conv_0"]["kernel"])
    )

    tr2, st2 = make()
    restored = tr2.restore_latest(st2)
    assert restored is not None and restored[1] == 10
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored[0].params["_decoder"]["conv_1"]["Conv_0"]["kernel"])),
        kern10,
    )
    st3, hist = tr2.fit(st2, train, val, num_updates=20, resume=True)
    assert int(jax.device_get(st3.step)) == 20
    f = hist.finalize()
    assert np.isfinite(f["train"]["recon_error"]).all()
    kern20 = np.asarray(
        jax.device_get(st3.params["_decoder"]["conv_1"]["Conv_0"]["kernel"])
    )
    assert not np.array_equal(kern10, kern20)  # training continued post-resume
