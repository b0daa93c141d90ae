"""Mixed-precision (bfloat16 compute) training: params/losses stay f32, VQ
assignment stays f32, and the stages still learn."""

import numpy as np

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import data as D
from acoustic_locating_vq_vae_tpu.train import EchoedSpeechTask, SpeechVQVAETask, Trainer

SMALL = D.DatasetConfig(n_sample=512, audio_samples=3200, num_frames=100, NFFT=64, HOP_LENGTH=32)
WS = 1 / 32


def test_bf16_speech_task_learns():
    train = D.make_dataset(jax.random.PRNGKey(0), 24, SMALL, batch=12, rir_chunk=2048)
    task = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8, compute_dtype="bfloat16")
    tr = Trainer(task, verbose=False)
    st = tr.init_state(jax.random.PRNGKey(1), train)
    # params stay f32
    assert all(a.dtype == jnp.float32 for a in jax.tree_util.tree_leaves(st.params))
    st, hist = tr.fit(st, train, None, num_updates=20)
    f = hist.finalize()
    assert np.isfinite(f["train"]["loss"]).all()
    assert f["train"]["recon_error"][-1] < f["train"]["recon_error"][0]
    # loss/metrics come back f32
    assert f["train"]["loss"].dtype == np.float32


def test_bf16_and_f32_agree_on_assignments():
    """VQ code assignments are f32-exact regardless of compute dtype at init
    (same params, same input -> same codes before any training)."""
    train = D.make_dataset(jax.random.PRNGKey(2), 8, SMALL, batch=8, rir_chunk=2048)
    t32 = SpeechVQVAETask(config=SMALL, width_scale=WS, batch_size=8)
    m32 = t32.build_model()
    m16 = SpeechVQVAETask(
        config=SMALL, width_scale=WS, batch_size=8, compute_dtype="bfloat16"
    ).build_model()
    x = t32.model_inputs(train)[0]
    v = m32.init({"params": jax.random.PRNGKey(3), "jitter": jax.random.PRNGKey(4)}, x)
    _, _, p32, e32 = m32.apply(v, x, method=m32.get_latent_representation)
    _, _, p16, e16 = m16.apply(v, x, method=m16.get_latent_representation)
    # bf16 conv outputs differ slightly -> some assignments may flip, but
    # code usage statistics must stay close
    agree = float(jnp.mean(jnp.all(e32 == e16, axis=1)))
    assert agree > 0.8
    assert abs(float(p32) - float(p16)) / max(float(p32), 1.0) < 0.2
