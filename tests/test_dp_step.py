"""Explicit shard_map DP step == single-device step (identical updates)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from acoustic_locating_vq_vae_tpu.parallel import make_mesh
from acoustic_locating_vq_vae_tpu.parallel.dp_step import make_shard_map_train_step


def test_shard_map_step_matches_single_device():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    params = {"w": w}
    x = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    batch = {"x": x, "y": y}

    def loss_fn(p, b):
        pred = b["x"] @ p["w"]
        loss = jnp.mean((pred - b["y"]) ** 2)
        return loss, {"mse": loss}

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    # single-device reference update
    (l0, m0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
    upd, ref_opt_state = opt.update(g0, opt_state, params)
    ref_params = optax.apply_updates(params, upd)

    mesh = make_mesh(data=8)
    step = make_shard_map_train_step(loss_fn, opt, mesh)
    new_params, new_opt_state, metrics = step(params, opt_state, batch)

    np.testing.assert_allclose(
        np.asarray(new_params["w"]), np.asarray(ref_params["w"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(l0), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["mse"]), float(m0["mse"]), rtol=1e-5)


def test_shard_map_step_iterates():
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((3, 2)).astype(np.float32))}
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    mesh = make_mesh(data=8)

    def loss_fn(p, b):
        loss = jnp.mean((b["x"] @ p["w"]) ** 2)
        return loss, {}

    step = make_shard_map_train_step(loss_fn, opt, mesh)
    batch = {"x": jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))}
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
