"""ConvolutionalVQVAE and its encoder/decoder halves.

Reference: vq_vae/convolutional_vq_vae.py:18-105, convolutional_encoder.py:7-44,
deconvolutional_decoder.py:7-79. Constructor fields mirror the reference's
signature one-for-one so the five stage configs translate directly
(BASELINE.json configs; e.g. train_speech.py:152-153).

Public tensor layout matches the reference: inputs and reconstructions are
(B, C, L) channels-first. Internally everything runs channels-last
((B, L, C), features in the TPU lane dimension); the two transposes at the
boundary are free under XLA fusion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv1d, ConvTranspose1d
from ..ops.jitter import Jitter
from ..ops.residual import ResidualStack
from ..ops.vq import VectorQuantizer, VQOutput

__all__ = ["ConvolutionalEncoder", "DeconvolutionalDecoder", "ConvolutionalVQVAE"]


class ConvolutionalEncoder(nn.Module):
    """Conv3 -> ResidualStack with an extra outer skip (convolutional_encoder.py:39-44).

    Operates channels-last: (B, L, C_in) -> (B, L, H)."""

    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    tied: bool = True
    compat_init: bool = True
    compat_inplace_relu: bool = True
    dtype: object = None
    sequence_axis: object = None  # time-sharded mode (see ops/conv.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = Conv1d(
            self.num_hiddens, kernel_size=3, padding=1, dtype=self.dtype, name="conv_1",
            sequence_axis=self.sequence_axis,
        )(x)
        stack = ResidualStack(
            self.num_hiddens,
            self.num_residual_layers,
            self.num_residual_hiddens,
            tied=self.tied,
            compat_init=self.compat_init,
            compat_inplace_relu=self.compat_inplace_relu,
            dtype=self.dtype,
            name="residual_stack",
            sequence_axis=self.sequence_axis,
        )
        out = stack(x1)
        # Reference quirk (see ops/residual.py docstring): the first block's
        # in-place ReLU mutated x1, so the outer skip adds relu(x1).
        if self.compat_inplace_relu and self.num_residual_layers > 0:
            return out + nn.relu(x1)
        return out + x1


class DeconvolutionalDecoder(nn.Module):
    """[Jitter] -> Conv3 -> ResidualStack -> 3x ConvTranspose3 (last linear)
    (deconvolutional_decoder.py:62-79). Channels-last (B, L, D) -> (B, L, C_out)."""

    out_channels: int
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    use_jitter: bool = True
    jitter_probability: float = 0.25
    tied: bool = True
    compat_init: bool = True
    compat_inplace_relu: bool = True
    dtype: object = None
    sequence_axis: object = None  # time-sharded mode (see ops/conv.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.use_jitter:
            x = Jitter(
                self.jitter_probability, name="jitter", sequence_axis=self.sequence_axis
            )(x, train=train)
        x = Conv1d(
            self.num_hiddens, kernel_size=3, padding=1, dtype=self.dtype, name="conv_1",
            sequence_axis=self.sequence_axis,
        )(x)
        x = ResidualStack(
            self.num_hiddens,
            self.num_residual_layers,
            self.num_residual_hiddens,
            tied=self.tied,
            compat_init=self.compat_init,
            compat_inplace_relu=self.compat_inplace_relu,
            dtype=self.dtype,
            name="residual_stack",
            sequence_axis=self.sequence_axis,
        )(x)
        seq = dict(sequence_axis=self.sequence_axis)
        x = nn.relu(ConvTranspose1d(self.num_hiddens, dtype=self.dtype, name="conv_trans_1", **seq)(x))
        x = nn.relu(ConvTranspose1d(self.num_hiddens, dtype=self.dtype, name="conv_trans_2", **seq)(x))
        out = ConvTranspose1d(self.out_channels, dtype=self.dtype, name="conv_trans_3", **seq)(x)
        # losses always accumulate in f32
        return out.astype(jnp.float32)


class ConvolutionalVQVAE(nn.Module):
    """Encoder -> pre-VQ conv -> [mean-pool] -> VQ -> Decoder
    (convolutional_vq_vae.py:93-100). Public layout (B, C, L)."""

    in_channels: int
    num_hiddens: int
    embedding_dim: int
    num_residual_layers: int
    num_residual_hiddens: int
    commitment_cost: float
    num_embeddings: int
    use_jitter: bool = True
    encoder_average_pooling: bool = False
    out_channels: Optional[int] = None
    # The reference hard-codes decoder jitter p=0.25 (convolutional_vq_vae.py:52).
    jitter_probability: float = 0.25
    tied: bool = True
    compat_init: bool = True
    compat_inplace_relu: bool = True
    vq_backend: str = "xla"
    # EMA codebook learning (van den Oord appendix) instead of the
    # reference's gradient-trained codebook; the codebook then lives in the
    # "vq_stats" variable collection, updated during forward passes.
    vq_ema: bool = False
    vq_ema_decay: float = 0.99
    # Dead-code restart threshold for the EMA codebook (0 = off); see
    # ops/vq.py ema_reset_threshold.
    vq_ema_reset: float = 0.0
    # Mixed precision: conv stacks compute in this dtype (e.g. jnp.bfloat16
    # for full MXU rate), parameters and losses stay f32, and the VQ
    # assignment always runs in f32 so code selection is exact.
    compute_dtype: object = None
    # Reference quirk (vector_quantizer.py:32): the torch VQ does
    # ``inputs.view(-1, D)`` on the CHANNELS-FIRST (B, D, L) latent without
    # permuting, so each quantized "vector" is D consecutive samples along
    # the time axis of one channel (chunks cross channel boundaries when
    # L % D != 0) — NOT the D-dim embedding across channels that the VQ-VAE
    # paper (and the code's apparent intent) quantizes. Row count is B*L
    # either way, so every downstream shape is identical; only the vector
    # contents differ. True (memory-order) semantics are the compat default;
    # ``compat_vq_flatten=False`` quantizes proper channels-last D-vectors.
    compat_vq_flatten: bool = True
    # Sequence parallelism (SURVEY.md §5.7): name of the mesh axis sharding
    # the TIME dimension when the model is applied inside a shard_map (see
    # parallel.sequence.sequence_parallel_apply). Convs halo-exchange their
    # k-1 boundary frames over ICI; VQ statistics and loss means reduce over
    # the axis; assignment stays position-local. Requires
    # compat_vq_flatten=False — the reference's memory-order flatten chunks
    # across time positions, which a sharded time axis cannot reproduce.
    sequence_axis: object = None

    def setup(self):
        if self.sequence_axis is not None and self.compat_vq_flatten:
            raise ValueError(
                "sequence_axis requires compat_vq_flatten=False: the reference's "
                "memory-order VQ flatten chunks across time positions and cannot "
                "be computed with the time axis sharded"
            )
        self._encoder = ConvolutionalEncoder(
            self.num_hiddens,
            self.num_residual_layers,
            self.num_residual_hiddens,
            tied=self.tied,
            compat_init=self.compat_init,
            compat_inplace_relu=self.compat_inplace_relu,
            dtype=self.compute_dtype,
            sequence_axis=self.sequence_axis,
        )
        self._pre_vq_conv = Conv1d(
            self.embedding_dim, kernel_size=3, padding=1, dtype=self.compute_dtype,
            sequence_axis=self.sequence_axis,
        )
        self._vq = VectorQuantizer(
            num_embeddings=self.num_embeddings,
            embedding_dim=self.embedding_dim,
            commitment_cost=self.commitment_cost,
            backend=self.vq_backend,
            ema=self.vq_ema,
            ema_decay=self.vq_ema_decay,
            ema_reset_threshold=self.vq_ema_reset,
            sequence_axis=self.sequence_axis,
        )
        self._decoder = DeconvolutionalDecoder(
            out_channels=self.out_channels if self.out_channels is not None else self.in_channels,
            num_hiddens=self.num_hiddens,
            num_residual_layers=self.num_residual_layers,
            num_residual_hiddens=self.num_residual_hiddens,
            use_jitter=self.use_jitter,
            jitter_probability=self.jitter_probability,
            tied=self.tied,
            compat_init=self.compat_init,
            compat_inplace_relu=self.compat_inplace_relu,
            dtype=self.compute_dtype,
            sequence_axis=self.sequence_axis,
        )

    def get_embedding_dim(self) -> int:
        return self.embedding_dim

    def _encode(self, x: jnp.ndarray, train_vq: bool, need_encodings: bool = False) -> VQOutput:
        z = jnp.swapaxes(x, -1, -2)  # (B, C, L) -> (B, L, C)
        z = self._encoder(z)
        z = self._pre_vq_conv(z)
        if self.encoder_average_pooling:
            # Mean over time (convolutional_vq_vae.py:96-97), keepdims like torch.
            z = jnp.mean(z, axis=1, keepdims=True)
            if self.sequence_axis is not None:
                import jax

                z = jax.lax.pmean(z, self.sequence_axis)
        # VQ assignment in f32 regardless of compute dtype.
        if self.compat_vq_flatten:
            # Feed the VQ the reference's channels-first layout: jnp reshape
            # is row-major like torch's contiguous .view, so the quantizer's
            # internal reshape(-1, D) of (B, D, L) reproduces
            # vector_quantizer.py:32 exactly. Convert quantized back to
            # channels-last for the decoder (pure layout ops; free under XLA).
            out = self._vq(
                jnp.swapaxes(z, 1, 2).astype(jnp.float32),
                train_vq=train_vq,
                need_encodings=need_encodings,
            )
            return out.replace(quantized=jnp.swapaxes(out.quantized, 1, 2))
        return self._vq(
            z.astype(jnp.float32), train_vq=train_vq, need_encodings=need_encodings
        )

    def __call__(
        self, x: jnp.ndarray, train: bool = True, train_vq: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(vq_loss, x_recon, perplexity), x and x_recon (B, C, L)."""
        out = self._encode(x, train_vq)
        recon = self._decoder(out.quantized, train=train)
        return out.loss, jnp.swapaxes(recon, -1, -2), out.perplexity

    def get_latent_codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """VQ code indices, (B, rows_per_sample) — a compact exact encoding of
        the frozen-VQ latent (500 int32 per speech sample instead of the
        (D, L) f32 tensor). With a frozen codebook,
        ``codes_to_latent(get_latent_codes(x))`` reproduces the quantized
        latent of ``get_latent_representation`` up to f32 rounding (the
        latter returns the straight-through value ``x + sg(q - x)``, which
        differs from the exact codebook row ``q`` in the last bit); the trainer's
        frozen-latent cache stores these per dataset row so the frozen
        branches of the echoed/location stages (train_echoed_speech.py:89
        recomputes them every step) run once per dataset instead of once per
        step."""
        out = self._encode(x, train_vq=False)
        return out.indices.reshape(x.shape[0], -1)

    def codes_to_latent(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`get_latent_codes`: (B, R) code ids -> quantized
        latent (B, D, L), honoring the VQ flatten mode (R == L in both: the
        memory-order flatten's rows-per-sample D*L/D and the vectors
        flatten's L coincide because the VQ width equals embedding_dim)."""
        b, r = codes.shape
        q = self._vq.lookup(codes.reshape(-1)).reshape(b, r * self.embedding_dim)
        if self.compat_vq_flatten:
            # Rows are memory-order chunks of the (B, D, L) latent
            # (vector_quantizer.py:32): the flat buffer IS that tensor.
            return q.reshape(b, self.embedding_dim, r)
        return jnp.swapaxes(q.reshape(b, r, self.embedding_dim), 1, 2)

    def get_latent_representation(
        self, x: jnp.ndarray, train_vq: bool = False, need_encodings: bool = True
    ):
        """(loss, quantized (B, D, L), perplexity, encodings (B*L, K)) —
        the reference return layout (convolutional_vq_vae.py:102-105).
        ``need_encodings=False`` returns None in the last slot and skips
        materializing the (B*L, K) one-hot (64 MB at speech scale)."""
        out = self._encode(x, train_vq, need_encodings=need_encodings)
        return out.loss, jnp.swapaxes(out.quantized, -1, -2), out.perplexity, out.encodings
