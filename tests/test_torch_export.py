"""Torch export: a torch rendition of the reference ConvolutionalVQVAE loaded
from our exported state dict reproduces our model's forward outputs —
including through real torch ConvTranspose1d layers (flip-transpose mapping)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from acoustic_locating_vq_vae_tpu.eval.torch_export import (
    location_state_dict,
    save_reference_state_dicts,
    vqvae_state_dict,
)
from acoustic_locating_vq_vae_tpu.models import ConvolutionalVQVAE, LocationModule

CFG = dict(
    in_channels=5, num_hiddens=8, embedding_dim=4, num_residual_layers=2,
    num_residual_hiddens=6, commitment_cost=0.25, num_embeddings=16,
)


class TorchRefVQVAE(torch.nn.Module):
    """Reference module structure with the reference attribute names, built
    so ``load_state_dict`` keys match the exported dict exactly."""

    def __init__(self, in_ch, H, D, N, RH, K, out_ch):
        super().__init__()
        self.N = N

        class Residual(torch.nn.Module):
            # reference structure: the Sequential lives under ``_block``
            # (residual.py:58-64)
            def __init__(self):
                super().__init__()
                self._block = torch.nn.Sequential(
                    torch.nn.ReLU(True),
                    torch.nn.Conv1d(H, RH, 3, padding=1, bias=False),
                    torch.nn.ReLU(True),
                    torch.nn.Conv1d(RH, H, 1, bias=False),
                )

            def forward(self, x):
                return x + self._block(x)

        class Stack(torch.nn.Module):
            def __init__(self, n):
                super().__init__()
                self._layers = torch.nn.ModuleList([Residual() for _ in range(n)])

            def forward(self, x):
                for layer in self._layers:
                    x = layer(x)
                return torch.relu(x)

        class Enc(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._conv_1 = torch.nn.Conv1d(in_ch, H, 3, padding=1)
                self._residual_stack = Stack(N)

            def forward(self, x):
                x1 = self._conv_1(x)
                return self._residual_stack(x1) + x1

        class Dec(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._conv_1 = torch.nn.Conv1d(D, H, 3, padding=1)
                self._residual_stack = Stack(N)
                self._conv_trans_1 = torch.nn.ConvTranspose1d(H, H, 3, padding=1)
                self._conv_trans_2 = torch.nn.ConvTranspose1d(H, H, 3, padding=1)
                self._conv_trans_3 = torch.nn.ConvTranspose1d(H, out_ch, 3, padding=1)

            def forward(self, x):
                x = self._residual_stack(self._conv_1(x))
                x = torch.relu(self._conv_trans_1(x))
                x = torch.relu(self._conv_trans_2(x))
                return self._conv_trans_3(x)

        class VQ(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self._embedding = torch.nn.Embedding(K, D)

            def forward(self, z):  # z (B, D, L)
                # memory-order flatten, as the real reference
                # (vector_quantizer.py:32): view(-1, D) with NO permute
                flat = z.reshape(-1, z.shape[1])
                d = (
                    flat.pow(2).sum(1, keepdim=True)
                    + self._embedding.weight.pow(2).sum(1)
                    - 2 * flat @ self._embedding.weight.t()
                )
                idx = d.argmin(1)
                return self._embedding.weight[idx].reshape(z.shape)

        self._encoder = Enc()
        self._pre_vq_conv = torch.nn.Conv1d(H, D, 3, padding=1)
        self._vq = VQ()
        self._decoder = Dec()

    def forward(self, x):
        z = self._pre_vq_conv(self._encoder(x))
        q = self._vq(z)
        return self._decoder(q)


def test_exported_vqvae_matches_flax_forward():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 19)).astype(np.float32)
    model = ConvolutionalVQVAE(**CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, jnp.asarray(x)
    )
    _, recon, _ = model.apply(variables, jnp.asarray(x), train=False)

    sd = vqvae_state_dict(variables["params"], num_residual_layers=2)
    tm = TorchRefVQVAE(5, 8, 4, 2, 6, 16, 5)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    with torch.no_grad():
        trecon = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(recon), trecon.numpy(), rtol=1e-3, atol=1e-4)


def test_exported_location_matches_flax():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 6)).astype(np.float32)
    loc = LocationModule(encoder_output_dim=7, num_hiddens=6, output_dim=1)
    variables = loc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = loc.apply(variables, jnp.asarray(x))

    sd = location_state_dict(variables["params"])
    layers = torch.nn.ModuleDict(
        {
            "fc_1": torch.nn.Linear(42, 1024), "fc_2": torch.nn.Linear(1024, 512),
            "fc_3": torch.nn.Linear(512, 512), "fc_4": torch.nn.Linear(512, 64),
            "fc_5": torch.nn.Linear(64, 1),
        }
    )
    for name, layer in layers.items():
        layer.weight.data = torch.from_numpy(sd[f"{name}.weight"].copy())
        layer.bias.data = torch.from_numpy(sd[f"{name}.bias"].copy())
    t = torch.from_numpy(x).flatten(1)
    with torch.no_grad():
        for i in (1, 2, 3, 4):
            t = torch.relu(layers[f"fc_{i}"](t))
        t = layers["fc_5"](t)
    np.testing.assert_allclose(np.asarray(y), t.numpy(), rtol=1e-4, atol=1e-5)


def test_save_bundle_roundtrip(tmp_path):
    model = ConvolutionalVQVAE(**CFG)
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "jitter": jax.random.PRNGKey(3)}, jnp.ones((1, 5, 19))
    )
    sd = vqvae_state_dict(variables["params"], num_residual_layers=2)
    path = str(tmp_path / "bundle.pt")
    save_reference_state_dicts(path, {"speech": sd})
    back = torch.load(path, weights_only=True)
    assert set(back) == {"speech"}
    np.testing.assert_allclose(
        back["speech"]["_vq._embedding.weight"].numpy(),
        np.asarray(variables["params"]["_vq"]["codebook"]),
    )
