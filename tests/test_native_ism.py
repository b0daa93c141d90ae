"""Native C++ ISM library vs the XLA op — three-way validation (the numpy
oracle lives in test_dsp_rir.py) plus binding edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import dsp
from acoustic_locating_vq_vae_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain for the native ISM library"
)

ROOM = (4.0, 5.0, 3.0)
RECEIVER = np.array([2.5, 1.5, 1.5])
SOURCE = np.array([3.2, 2.1, 1.0])
FS = 16000.0
NSAMPLE = 512
BETA = 0.7


def test_native_matches_xla_op():
    ours = np.asarray(
        dsp.generate_rir(
            jnp.asarray(SOURCE, jnp.float32), jnp.asarray(RECEIVER, jnp.float32),
            room=ROOM, nsample=NSAMPLE, fs=FS, beta=BETA, hp=True, chunk=256,
        )
    )
    cpp = native.generate_rir_native(SOURCE, RECEIVER, ROOM, NSAMPLE, FS, beta=BETA, hp=True)
    scale = np.abs(cpp).max()
    np.testing.assert_allclose(ours, cpp, atol=5e-4 * scale, rtol=1e-2)


def test_native_batched():
    sources = np.stack([SOURCE, SOURCE + [0.0, 0.4, 0.3]])
    out = native.generate_rir_native(sources, RECEIVER, ROOM, NSAMPLE, FS, beta=BETA)
    assert out.shape == (2, NSAMPLE)
    single = native.generate_rir_native(sources[1], RECEIVER, ROOM, NSAMPLE, FS, beta=BETA)
    np.testing.assert_allclose(out[1], single)


def test_native_rt60_and_validation():
    out = native.generate_rir_native(SOURCE, RECEIVER, ROOM, NSAMPLE, FS, rt60=0.4)
    assert out.shape == (NSAMPLE,)
    with pytest.raises(ValueError):
        native.generate_rir_native(SOURCE, RECEIVER, ROOM, NSAMPLE, FS)  # neither
    with pytest.raises(ValueError):
        native.generate_rir_native(
            SOURCE, RECEIVER, ROOM, NSAMPLE, FS, rt60=0.4, beta=0.5
        )  # both
    with pytest.raises(ValueError):
        native.generate_rir_native(
            np.zeros((2, 4)), RECEIVER, ROOM, NSAMPLE, FS, beta=0.5
        )  # bad shape


def test_threads_reported():
    assert native.num_threads() >= 1
