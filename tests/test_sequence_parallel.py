"""Sequence-parallel conv: halo-exchange sharded conv equals the unsharded
SAME convolution on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.parallel.sequence import sequence_sharded_conv


def _reference_conv(x, kernel, bias=None):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + bias if bias is not None else out


@pytest.mark.parametrize("k", [1, 3])
def test_sharded_conv_matches_unsharded(k):
    rng = np.random.default_rng(0)
    mesh = make_mesh(data=8)
    x = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, 5, 7)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    got = sequence_sharded_conv(x, kernel, mesh, mesh_axis="data", bias=bias)
    want = _reference_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sharded_conv_rejects_indivisible_length():
    mesh = make_mesh(data=8)
    x = jnp.ones((1, 30, 4))
    kernel = jnp.ones((3, 4, 4))
    with pytest.raises(ValueError):
        sequence_sharded_conv(x, kernel, mesh)


def test_halo_is_only_cross_device_traffic():
    """The sharded conv result stays correct when each shard's interior is
    perturbed only locally — i.e. boundary handling is exactly the halo."""
    rng = np.random.default_rng(1)
    mesh = make_mesh(data=8)
    x = jnp.asarray(rng.standard_normal((1, 80, 3)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3)).astype(np.float32))
    got = sequence_sharded_conv(x, kernel, mesh)
    want = _reference_conv(x, kernel)
    # boundaries between shards (every 10 frames) are seamless
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_param_partition_rules():
    """sharding_rules: conv column/row parallel pairs, codebook rows, dense."""
    from acoustic_locating_vq_vae_tpu.parallel.sharding_rules import param_partition_spec
    from jax.sharding import PartitionSpec as P

    # conv_1-style kernel (k, in, out): column-parallel on large out
    assert param_partition_spec(("a", "conv_1", "kernel"), (3, 201, 1024), 2) == P(None, None, "model")
    # conv_2 1x1 (k, in, out): row-parallel on large in
    assert param_partition_spec(("a", "conv_2", "kernel"), (1, 1024, 1024), 2) == P(None, "model", None)
    # codebook (K, D): row sharding
    assert param_partition_spec(("_vq", "codebook"), (1024, 128), 2) == P("model", None)
    # small tensors stay replicated
    assert param_partition_spec(("x", "kernel"), (3, 16, 16), 2) == P()
    # dense (in, out): shard the big input dim
    assert param_partition_spec(("fc_1", "Dense_0", "kernel"), (205824, 1024), 2) == P("model", None)
    # indivisible dims stay replicated
    assert param_partition_spec(("a", "conv_1", "kernel"), (3, 201, 1023), 2) == P()
