"""Multi-slice (DCN) mesh layout: slice-major device order, in-slice model/seq.

SURVEY.md §5.8 sketches "×DCN for multi-slice later". The TPU-native design
needs no fourth mesh axis: pure data parallelism across slices is a device
ORDERING property (make_mesh(slices=N)) — the data axis's outer blocks land
on whole slices, so XLA lowers the gradient psum hierarchically while
model/seq collectives stay within a slice's ICI. These tests pin the
layout contract and that a permuted (slice-major) device order leaves the
training step's numerics untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.parallel.dp_step import make_shard_map_train_step


def interleaved(devices, slices=2):
    """Fake topology: device i lives on slice i % slices (worst case for a
    naive contiguous grouping — exercises the reorder)."""
    return {d: i % slices for i, d in enumerate(devices)}


def test_slice_major_data_axis_and_in_slice_model_pairs():
    devices = jax.devices()
    smap = interleaved(devices)
    mesh = make_mesh(model=2, slices=2, slice_map=dict(smap))
    arr = mesh.devices  # (data=4, model=2, seq=1)
    assert arr.shape == (4, 2, 1)
    # every model pair lies within ONE slice (its collectives never ride DCN)
    for row in arr.reshape(4, 2):
        assert smap[row[0]] == smap[row[1]]
    # data axis is slice-major: first half of rows on slice 0, rest on slice 1
    row_slices = [smap[r[0]] for r in arr.reshape(4, 2)]
    assert row_slices == [0, 0, 1, 1]


def test_callable_slice_map_and_no_topology_fallback():
    devices = jax.devices()
    mesh = make_mesh(slices=2, slice_map=lambda d: d.id % 2)
    assert mesh.shape == {"data": 8, "model": 1, "seq": 1}
    # CPU devices expose no slice_index: contiguous-chunk fallback
    mesh = make_mesh(slices=4)
    assert [d.id for d in mesh.devices.ravel()] == [d.id for d in devices]


def test_model_axis_straddling_a_slice_is_rejected():
    with pytest.raises(ValueError, match="straddle"):
        make_mesh(model=8, slices=2)


def test_unequal_slice_assignment_is_rejected():
    devices = jax.devices()
    bad = {d: (0 if i < 3 else 1) for i, d in enumerate(devices)}
    with pytest.raises(ValueError, match="equal"):
        make_mesh(slices=2, slice_map=bad)
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(slices=3)


def test_partial_mesh_draws_evenly_from_every_slice():
    """Requesting fewer devices than exist must still honor the multi-slice
    layout: a plain prefix cut after the slice-major reorder would take all
    devices from slice 0, silently collapsing the requested 2-slice dp
    layout into one slice."""
    devices = jax.devices()
    smap = interleaved(devices)
    mesh = make_mesh(data=4, slices=2, slice_map=dict(smap))
    assert mesh.shape == {"data": 4, "model": 1, "seq": 1}
    rows = [smap[d] for d in mesh.devices.ravel()]
    # two data rows on each slice, slice-major order
    assert rows == [0, 0, 1, 1]
    # same for a model-parallel sub-mesh: pairs stay in-slice
    mesh = make_mesh(data=2, model=2, slices=2, slice_map=dict(smap))
    arr = mesh.devices.reshape(2, 2)
    assert [smap[r[0]] for r in arr] == [0, 1]
    for row in arr:
        assert smap[row[0]] == smap[row[1]]
    # an indivisible data axis cannot give every slice an equal block
    with pytest.raises(ValueError, match="data=3 not divisible"):
        make_mesh(data=3, slices=2, slice_map=dict(smap))


def test_sliced_mesh_step_matches_single_device():
    """The slice-major permutation of device order must not change numerics."""
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    batch = {"x": x, "y": y}

    def loss_fn(p, b):
        loss = jnp.mean((b["x"] @ p["w"] - b["y"]) ** 2)
        return loss, {"mse": loss}

    opt = optax.adam(1e-2)
    (l0, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
    upd, _ = opt.update(g0, opt.init(params), params)
    ref = optax.apply_updates(params, upd)

    mesh = make_mesh(data=8, slices=2, slice_map=interleaved(jax.devices()))
    step = make_shard_map_train_step(loss_fn, opt, mesh)
    new_params, _, metrics = step(params, opt.init(params), batch)

    np.testing.assert_allclose(
        np.asarray(new_params["w"]), np.asarray(ref["w"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(l0), rtol=1e-5)
