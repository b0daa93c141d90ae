"""Numerical parity of the NN ops against torch implementations of the
reference equations (vector_quantizer.py, residual.py, residual_stack.py,
jitter.py), with weights copied between frameworks."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu import ops


def _j2t_conv(kernel):  # flax (k, in, out) -> torch (out, in, k)
    return torch.from_numpy(np.asarray(kernel).transpose(2, 1, 0).copy())


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 11)).astype(np.float32)  # (B, C, L) torch layout
    conv = ops.Conv1d(features=7, kernel_size=3, padding=1)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 1)))
    y = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    kernel = params["params"]["Conv_0"]["kernel"]
    bias = params["params"]["Conv_0"]["bias"]
    golden = tF.conv1d(
        torch.from_numpy(x), _j2t_conv(kernel), torch.from_numpy(np.asarray(bias)), padding=1
    ).numpy()
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), golden, rtol=1e-4, atol=1e-5)


def test_stride1_convtranspose_equals_flipped_conv():
    """Design claim behind ConvTranspose1d: with stride 1, k=3, pad=1,
    conv_transpose1d(x, W) == conv1d(x, W^T flipped)."""
    rng = np.random.default_rng(1)
    x = torch.from_numpy(rng.standard_normal((2, 4, 9)).astype(np.float32))
    w = torch.from_numpy(rng.standard_normal((4, 6, 3)).astype(np.float32))  # (in, out, k)
    a = tF.conv_transpose1d(x, w, padding=1)
    b = tF.conv1d(x, w.transpose(0, 1).flip(-1), padding=1)
    np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-5, atol=1e-6)


class TorchResidual(torch.nn.Module):
    """Reference residual math (residual.py:36-66), torch rendition INCLUDING
    the in-place-ReLU quirk: ``Sequential(ReLU(True), ...)`` mutates the
    skip input, so the block computes relu(x) + c2(relu(c1(relu(x))))."""

    def __init__(self, in_ch, hid, res_hid):
        super().__init__()
        self.c1 = torch.nn.Conv1d(in_ch, res_hid, 3, padding=1, bias=False)
        self.c2 = torch.nn.Conv1d(res_hid, hid, 1, bias=False)

    def forward(self, x):
        rx = torch.relu(x)
        return rx + self.c2(torch.relu(self.c1(rx)))


def test_residual_stack_tied_matches_torch():
    rng = np.random.default_rng(2)
    H, RH, N = 6, 4, 3
    x = rng.standard_normal((2, H, 13)).astype(np.float32)
    stack = ops.ResidualStack(num_hiddens=H, num_residual_layers=N, num_residual_hiddens=RH)
    params = stack.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 1)))
    # tied: exactly one residual block's parameters exist
    assert set(params["params"].keys()) == {"residual"}

    tblock = TorchResidual(H, H, RH)
    res = params["params"]["residual"]
    tblock.c1.weight.data = _j2t_conv(res["conv_1"]["Conv_0"]["kernel"])
    tblock.c2.weight.data = _j2t_conv(res["conv_2"]["Conv_0"]["kernel"])
    tx = torch.from_numpy(x)
    for _ in range(N):  # same instance applied N times == tied weights
        tx = tblock(tx)
    golden = torch.relu(tx).detach().numpy()

    y = stack.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), golden, rtol=1e-4, atol=1e-5)


def test_residual_stack_untied_has_distinct_layers():
    stack = ops.ResidualStack(
        num_hiddens=6, num_residual_layers=3, num_residual_hiddens=4, tied=False
    )
    params = stack.init(jax.random.PRNGKey(0), jnp.ones((1, 5, 6)))
    assert set(params["params"].keys()) == {"residual_0", "residual_1", "residual_2"}


def _torch_vq(flat_x: torch.Tensor, codebook: torch.Tensor, beta: float, train_vq: bool):
    """Reference VQ equations (vector_quantizer.py:29-58) in torch."""
    d = (
        flat_x.pow(2).sum(1, keepdim=True)
        + codebook.pow(2).sum(1)
        - 2 * flat_x @ codebook.t()
    )
    idx = d.argmin(1)
    onehot = torch.zeros(flat_x.shape[0], codebook.shape[0])
    onehot.scatter_(1, idx[:, None], 1)
    q = onehot @ codebook
    e_latent = tF.mse_loss(q.detach(), flat_x)
    q_latent = tF.mse_loss(q, flat_x.detach()) if train_vq else tF.mse_loss(q.detach(), flat_x.detach())
    loss = q_latent + beta * e_latent
    ste = flat_x + (q - flat_x).detach()
    avg = onehot.mean(0)
    perp = torch.exp(-torch.sum(avg * torch.log(avg + 1e-10)))
    return loss, ste, perp, onehot


def test_vq_forward_matches_reference_equations():
    rng = np.random.default_rng(3)
    N, D, K = 50, 4, 8
    x = rng.standard_normal((N, D)).astype(np.float32)
    vq = ops.VectorQuantizer(num_embeddings=K, embedding_dim=D, commitment_cost=0.25)
    params = vq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cb = np.asarray(params["params"]["codebook"])

    out = vq.apply(params, jnp.asarray(x), need_encodings=True)
    tx = torch.from_numpy(x).requires_grad_(True)
    tloss, tste, tperp, tonehot = _torch_vq(tx, torch.from_numpy(cb), 0.25, True)

    np.testing.assert_allclose(float(out.loss), float(tloss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.quantized), tste.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.perplexity), float(tperp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.encodings), tonehot.numpy())


def test_vq_gradients_match_torch():
    """STE + commitment gradients wrt inputs; q-latent gradient wrt codebook."""
    rng = np.random.default_rng(4)
    N, D, K = 30, 4, 8
    x = rng.standard_normal((N, D)).astype(np.float32)
    vq = ops.VectorQuantizer(num_embeddings=K, embedding_dim=D, commitment_cost=0.25)
    params = vq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cb = np.asarray(params["params"]["codebook"])

    def loss_fn(p, xin):
        out = vq.apply(p, xin)
        # recon-like consumer of the STE output + the VQ loss, as the
        # trainers combine them (train_speech.py:88)
        return jnp.sum(out.quantized**2) + out.loss

    gp, gx = jax.grad(loss_fn, argnums=(0, 1))(params, jnp.asarray(x))

    tx = torch.from_numpy(x).requires_grad_(True)
    tcb = torch.from_numpy(cb).requires_grad_(True)
    tloss, tste, _, _ = _torch_vq(tx, tcb, 0.25, True)
    total = (tste**2).sum() + tloss
    total.backward()

    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp["params"]["codebook"]), tcb.grad.numpy(), rtol=1e-4, atol=1e-5
    )


def test_vq_frozen_codebook_gets_no_gradient():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    vq = ops.VectorQuantizer(num_embeddings=8, embedding_dim=4, commitment_cost=0.25)
    params = vq.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        out = vq.apply(p, x, train_vq=False)
        return jnp.sum(out.quantized**2) + out.loss

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["params"]["codebook"]).max()) == 0.0
    # but the loss VALUE still includes the (frozen) q-latent term
    out_frozen = vq.apply(params, x, train_vq=False)
    out_live = vq.apply(params, x, train_vq=True)
    np.testing.assert_allclose(float(out_frozen.loss), float(out_live.loss), rtol=1e-6)


def test_jitter_semantics():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    # p=0: identity
    np.testing.assert_array_equal(np.asarray(ops.jitter(x, key, 0.0)), np.asarray(x))
    # p=1: every step replaced by a neighbor, shared across batch
    y = np.asarray(ops.jitter(x, key, 1.0))
    xn = np.asarray(x)
    for t in range(10):
        if t == 0:
            np.testing.assert_array_equal(y[:, t], xn[:, 1])
        elif t == 9:
            np.testing.assert_array_equal(y[:, t], xn[:, 8])
        else:
            assert (y[:, t] == xn[:, t - 1]).all() or (y[:, t] == xn[:, t + 1]).all()
    # batch-shared decisions: the time-shift pattern is identical across batch
    shift0 = (y[0, :, 0] - xn[0, :, 0]) / 3.0
    shift1 = (y[1, :, 0] - xn[1, :, 0]) / 3.0
    np.testing.assert_array_equal(shift0, shift1)


def test_jitter_replaced_slots_stop_gradient():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((1, 6, 2))

    def f(xin):
        return jnp.sum(ops.jitter(xin, key, 1.0))

    g = np.asarray(jax.grad(f)(x))
    # all slots replaced (p=1) -> no gradient anywhere (reference assigns
    # from the detached clone, jitter.py:47-53)
    assert np.all(g == 0.0)


def test_jitter_per_batch_mode():
    """Fixed-variant: independent decisions per sample (vs the reference's
    batch-shared quirk)."""
    key = jax.random.PRNGKey(5)
    x = jnp.arange(4 * 50 * 2, dtype=jnp.float32).reshape(4, 50, 2)
    y = np.asarray(ops.jitter(x, key, 0.5, per_batch=True))
    xn = np.asarray(x)
    # shapes preserved, values always come from some neighbor or self
    assert y.shape == xn.shape
    shifts = []
    for b in range(4):
        shift = (y[b, 1:-1, 0] - xn[b, 1:-1, 0]) / 2.0  # -1, 0, +1 steps
        assert np.isin(shift, [-1.0, 0.0, 1.0]).all()
        shifts.append(shift)
    # with p=0.5 over 48 positions, identical patterns across 4 samples are
    # astronomically unlikely -> decisions are per-sample
    assert any(not np.array_equal(shifts[0], s) for s in shifts[1:])
