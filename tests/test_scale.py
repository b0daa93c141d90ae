"""20k-scale dataset paths (round-3, reference 20k_set train_rir.py:121):
field pruning + bf16 resident storage, and the host-staged chunk-rotation
dataset. Tested at toy scale; VALIDATION.md records the real-chip 20k run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.train import RirVQVAETask, SpeechVQVAETask, Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


def test_pruned_bf16_dataset_trains():
    """Speech stage on a dataset pruned to its fields and stored in bf16:
    ~6x less HBM per sample, loss still decreases."""
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    train = D.make_dataset(
        jax.random.PRNGKey(0), 24, SMALL, batch=8, rir_chunk=2048,
        keep_fields=task.resident_fields, store_dtype=jnp.bfloat16,
    )
    assert train.speech_spec.dtype == jnp.bfloat16
    assert train.echoed_spec.shape[1:] == (0, 0)  # pruned placeholder
    assert train.rir_spec.shape[1:] == (0, 0)
    assert train.wiener_est.shape[1] == 0
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(1), train)
    st, hist = tr.fit(st, train, None, num_updates=25)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert np.mean(f["train"]["recon_error"][-5:]) < np.mean(f["train"]["recon_error"][:5])


def test_bf16_storage_close_to_f32():
    """One eval step from bf16-stored data matches the f32-stored step to
    bf16 mantissa precision (same rows, same params)."""
    task = RirVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    f32 = D.make_dataset(jax.random.PRNGKey(2), 8, SMALL, batch=8, rir_chunk=2048)
    bf16 = D.prune_batch(f32, task.resident_fields, jnp.bfloat16)
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(3), f32)
    _, m_f32 = tr._step_fn(st, f32, 8, False)
    st2 = tr.init_state(jax.random.PRNGKey(3), f32)
    _, m_bf16 = tr._step_fn(st2, bf16, 8, False)
    for k in m_f32:
        np.testing.assert_allclose(
            float(m_f32[k]), float(m_bf16[k]), rtol=3e-2, err_msg=k
        )


def test_pruned_dataset_field_mismatch_raises():
    """Feeding a speech-pruned dataset to the rir stage fails fast with a
    named-field error, not a conv shape crash."""
    speech_fields = SpeechVQVAETask(config=SMALL).resident_fields
    train = D.make_dataset(
        jax.random.PRNGKey(4), 8, SMALL, batch=8, rir_chunk=2048,
        keep_fields=speech_fields,
    )
    task = RirVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(5), D.make_dataset(jax.random.PRNGKey(6), 2, SMALL, batch=2, rir_chunk=2048))
    with pytest.raises(ValueError, match="rir_spec"):
        tr.fit(st, train, None, num_updates=1)


def test_host_staged_rotation_trains(capsys):
    """HostStagedDataset: 32 rows in host memory, 8-row resident chunks
    rotated every 5 steps — training runs through multiple rotations, loss
    decreases, and every chunk window has the fixed size."""
    host = D.make_host_dataset(
        jax.random.PRNGKey(7), 32, SMALL, batch=8, chunk_size=8, rotate_every=5,
        rir_chunk=2048,
    )
    assert host.size == 32 and host.num_chunks == 4
    for i in range(6):  # cyclic, incl. wraparound
        assert int(host.chunk(i).theta.shape[0]) == 8
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    tr = Trainer(task, verbose=True)
    st = tr.init_state(jax.random.PRNGKey(8), host)
    st, hist = tr.fit(st, host, None, num_updates=25)
    out = capsys.readouterr().out
    assert "host-staged dataset: 32 rows, 4 chunks" in out
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert np.mean(f["train"]["recon_error"][-5:]) < np.mean(f["train"]["recon_error"][:5])


def test_host_staged_sliding_tail_chunk():
    """A size not divisible by chunk_size slides the last window back
    instead of shrinking it (jit-stable shapes)."""
    host = D.make_host_dataset(
        jax.random.PRNGKey(9), 10, SMALL, batch=5, chunk_size=4, rotate_every=5,
        rir_chunk=2048,
    )
    assert host.num_chunks == 3
    c2 = host.chunk(2)
    assert int(c2.theta.shape[0]) == 4
    np.testing.assert_array_equal(
        np.asarray(c2.theta), host.arrays.theta[6:10]
    )
