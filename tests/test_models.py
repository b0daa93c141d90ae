"""Model-level tests: full ConvolutionalVQVAE forward parity against a torch
replica of the reference architecture (weights copied), composite freeze
semantics, and the location MLP."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu.models import (
    ConvolutionalVQVAE,
    EchoedSpeechReconModel,
    LocationModule,
)


def _j2t(kernel):  # flax conv (k, in, out) -> torch (out, in, k)
    return torch.from_numpy(np.asarray(kernel).transpose(2, 1, 0).copy())


class TorchRef(torch.nn.Module):
    """Reference ConvolutionalVQVAE math (convolutional_vq_vae.py:93-100 with
    encoder convolutional_encoder.py:39-44, decoder deconvolutional_decoder.py:62-79,
    tied residual stacks, eval mode / no jitter), weights injected from flax."""

    def __init__(self, p, in_ch, H, D, RH, N, K, out_ch, beta):
        super().__init__()
        self.N = N
        self.beta = beta

        def conv(tree, in_c, out_c, k, bias=True):
            m = torch.nn.Conv1d(in_c, out_c, k, padding=k // 2, bias=bias)
            m.weight.data = _j2t(tree["Conv_0"]["kernel"])
            if bias:
                m.bias.data = torch.from_numpy(np.asarray(tree["Conv_0"]["bias"]).copy())
            return m

        e = p["_encoder"]
        self.enc_conv = conv(e["conv_1"], in_ch, H, 3)
        self.enc_res1 = conv(e["residual_stack"]["residual"]["conv_1"], H, RH, 3, bias=False)
        self.enc_res2 = conv(e["residual_stack"]["residual"]["conv_2"], RH, H, 1, bias=False)
        self.pre_vq = conv(p["_pre_vq_conv"], H, D, 3)
        self.codebook = torch.from_numpy(np.asarray(p["_vq"]["codebook"]).copy())
        d = p["_decoder"]
        self.dec_conv = conv(d["conv_1"], D, H, 3)
        self.dec_res1 = conv(d["residual_stack"]["residual"]["conv_1"], H, RH, 3, bias=False)
        self.dec_res2 = conv(d["residual_stack"]["residual"]["conv_2"], RH, H, 1, bias=False)
        self.dec_t1 = conv(d["conv_trans_1"], H, H, 3)
        self.dec_t2 = conv(d["conv_trans_2"], H, H, 3)
        self.dec_t3 = conv(d["conv_trans_3"], H, out_ch, 3)

    def _stack(self, x, c1, c2):
        # reference in-place-ReLU semantics: skip = relu(x) per block
        for _ in range(self.N):
            rx = torch.relu(x)
            x = rx + c2(torch.relu(c1(rx)))
        return torch.relu(x)

    def forward(self, x):
        x1 = self.enc_conv(x)
        # outer skip adds relu(x1): the first block mutated x1 in place
        z = self._stack(x1, self.enc_res1, self.enc_res2) + torch.relu(x1)
        z = self.pre_vq(z)  # (B, D, L)
        # Reference memory-order flatten (vector_quantizer.py:32): view(-1, D)
        # on the channels-first tensor, NO permute.
        flat = z.reshape(-1, z.shape[1])
        dist = (
            flat.pow(2).sum(1, keepdim=True)
            + self.codebook.pow(2).sum(1)
            - 2 * flat @ self.codebook.t()
        )
        idx = dist.argmin(1)
        onehot = torch.zeros(flat.shape[0], self.codebook.shape[0])
        onehot.scatter_(1, idx[:, None], 1)
        q = (onehot @ self.codebook).reshape(z.shape)
        e_latent = tF.mse_loss(q.reshape(-1, z.shape[1]), flat)
        loss = e_latent + self.beta * e_latent  # q==sg(q) numerically at fwd
        q = z + (q - z)
        avg = onehot.mean(0)
        perp = torch.exp(-torch.sum(avg * torch.log(avg + 1e-10)))
        h = self.dec_conv(q)
        h = self._stack(h, self.dec_res1, self.dec_res2)
        h = torch.relu(self.dec_t1(h))
        h = torch.relu(self.dec_t2(h))
        return loss, self.dec_t3(h), perp


CFG = dict(
    in_channels=5, num_hiddens=8, embedding_dim=4, num_residual_layers=2,
    num_residual_hiddens=6, commitment_cost=0.25, num_embeddings=16,
)


def test_vqvae_forward_matches_torch_replica():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 17)).astype(np.float32)
    model = ConvolutionalVQVAE(**CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, jnp.asarray(x)
    )
    loss, recon, perp = model.apply(variables, jnp.asarray(x), train=False)

    tref = TorchRef(variables["params"], 5, 8, 4, 6, 2, 16, 5, 0.25)
    with torch.no_grad():
        tloss, trecon, tperp = tref(torch.from_numpy(x))

    np.testing.assert_allclose(np.asarray(recon), trecon.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(loss), float(tloss), rtol=1e-4)
    np.testing.assert_allclose(float(perp), float(tperp), rtol=1e-5)


def test_latent_representation_layout():
    x = jnp.ones((2, 5, 17))
    model = ConvolutionalVQVAE(**CFG)
    variables = model.init({"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, x)
    loss, quantized, perp, encodings = model.apply(
        variables, x, method=model.get_latent_representation
    )
    assert quantized.shape == (2, 4, 17)  # (B, D, L) as convolutional_vq_vae.py:102-105
    assert encodings.shape == (2 * 17, 16)  # flat one-hot (B*L, K)
    np.testing.assert_allclose(np.asarray(encodings.sum(axis=1)), 1.0)


def test_average_pooling_mode():
    x = jnp.ones((2, 5, 17))
    model = ConvolutionalVQVAE(**CFG, encoder_average_pooling=True)
    variables = model.init({"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, x)
    _, quantized, _, _ = model.apply(variables, x, method=model.get_latent_representation)
    assert quantized.shape == (2, 4, 1)  # time pooled to 1 (convolutional_vq_vae.py:96-97)


def _make_composite():
    rir = ConvolutionalVQVAE(
        in_channels=17, num_hiddens=8, embedding_dim=4, num_residual_layers=2,
        num_residual_hiddens=6, commitment_cost=0.25, num_embeddings=16,
        use_jitter=False, out_channels=1,
    )
    speech = ConvolutionalVQVAE(**CFG)
    comp = EchoedSpeechReconModel(
        rir_model=rir, speech_model=speech, out_channels=5,
        num_hiddens=8, num_residual_layers=2, num_residual_hiddens=6, use_jitter=True,
    )
    x = jnp.ones((2, 5, 17))
    x_rir = jnp.swapaxes(x, 1, 2)
    variables = comp.init(
        {"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, x, x_rir
    )
    return comp, variables, x, x_rir


def test_composite_shapes_and_pad():
    comp, variables, x, x_rir = _make_composite()
    recon, sp, rp = comp.apply(
        variables, x, x_rir, train=False
    )
    assert recon.shape == x.shape
    assert sp.shape == () and rp.shape == ()


def test_composite_freeze_semantics():
    """With train_encoder=False only the fresh decoder gets gradients; with
    True, encoders train but codebooks stay frozen (echoed_speech_model.py:17-18,51-54)."""
    comp, variables, x, x_rir = _make_composite()

    def loss_fn(params, train_encoder):
        recon, _, _ = comp.apply(
            {"params": params}, x, x_rir, train=False, train_encoder=train_encoder
        )
        return jnp.mean((recon - x) ** 2)

    g_frozen = jax.grad(loss_fn)(variables["params"], False)
    flat = jax.tree_util.tree_leaves_with_path(g_frozen)

    def maxabs(tree):
        return max(float(jnp.abs(v).max()) for v in jax.tree_util.tree_leaves(tree))

    assert maxabs(g_frozen["_decoder"]) > 0.0
    assert maxabs(g_frozen["rir_model"]) == 0.0
    assert maxabs(g_frozen["speech_model"]) == 0.0

    g_live = jax.grad(loss_fn)(variables["params"], True)
    assert maxabs(g_live["rir_model"]["_encoder"]) > 0.0
    assert maxabs(g_live["speech_model"]["_encoder"]) > 0.0
    # codebooks still frozen (train_vq=False in get_latent_representation)
    assert float(jnp.abs(g_live["rir_model"]["_vq"]["codebook"]).max()) == 0.0
    assert float(jnp.abs(g_live["speech_model"]["_vq"]["codebook"]).max()) == 0.0


def test_location_module_shapes_and_gradients():
    loc = LocationModule(encoder_output_dim=17, num_hiddens=16, output_dim=1)
    x = jnp.ones((4, 17, 16))
    variables = loc.init(jax.random.PRNGKey(0), x)
    y = loc.apply(variables, x)
    assert y.shape == (4, 1)
    # hidden sizes per location_model.py:10-18
    p = variables["params"]
    assert p["fc_1"]["Dense_0"]["kernel"].shape == (17 * 16, 1024)
    assert p["fc_2"]["Dense_0"]["kernel"].shape == (1024, 512)
    assert p["fc_3"]["Dense_0"]["kernel"].shape == (512, 512)
    assert p["fc_4"]["Dense_0"]["kernel"].shape == (512, 64)
    assert p["fc_5"]["Dense_0"]["kernel"].shape == (64, 1)

    def loss_fn(params):
        theta = loc.apply({"params": params}, x)
        return jnp.mean((theta - 0.5) ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    assert float(jnp.abs(g["fc_1"]["Dense_0"]["kernel"]).max()) > 0.0


def test_encodings_not_materialized_unless_requested():
    """Training paths never pay for the (B*L, K) one-hot: VQOutput.encodings
    defaults to None; get_latent_representation(need_encodings=False) skips it."""
    x = jnp.ones((2, 5, 17))
    model = ConvolutionalVQVAE(**CFG)
    variables = model.init({"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, x)
    _, _, _, enc = model.apply(
        variables, x, method=model.get_latent_representation, need_encodings=False
    )
    assert enc is None
    _, _, _, enc = model.apply(variables, x, method=model.get_latent_representation)
    assert enc is not None and enc.shape == (2 * 17, 16)
