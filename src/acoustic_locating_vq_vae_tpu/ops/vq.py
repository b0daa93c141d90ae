"""Vector quantizer (reference: vq_vae/vector_quantizer.py:8-58).

Semantics reproduced exactly:

* codebook (K, D) initialized U(-1/K, 1/K) (vector_quantizer.py:15-16)
* nearest-codebook assignment via the ||x||^2 + ||e||^2 - 2 x e^T expansion
  (vector_quantizer.py:34-36) — on TPU the x e^T term is one MXU matmul
* loss = q_latent + beta * e_latent where q_latent trains the codebook by
  gradient (NOT EMA, matching :48); with ``train_vq=False`` both terms are
  gradient-stopped so the codebook freezes but the loss value is unchanged
  (:26-27,47-50 ``set_train_vq``)
* straight-through estimator ``x + sg(q - x)`` (:54)
* perplexity = exp(entropy of batch code usage) (:55-56). Under a
  data-parallel mesh the code-count mean is taken over the **global** batch
  (XLA inserts the cross-chip reduction), matching single-device semantics
  as required by SURVEY.md §5.8.

An EMA codebook update (van den Oord appendix) is provided as an option the
reference lacks; gradient mode stays the default for parity.

The assignment core is factored as :func:`nearest_codebook` so the fused
Pallas kernel (ops/vq_pallas.py) can drop in; set ``backend="pallas"``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

__all__ = ["VectorQuantizer", "nearest_codebook", "VQOutput", "perplexity_from_indices"]


def perplexity_from_indices(indices: jnp.ndarray, num_embeddings: int) -> jnp.ndarray:
    """exp(entropy of code usage) over all given assignments — the same
    statistic VectorQuantizer computes over a batch (vector_quantizer.py:55-56),
    recomputable from stored code ids alone (used by the frozen-latent cache,
    where the one-hot rows are never materialized)."""
    flat = indices.reshape(-1)
    counts = jnp.zeros(num_embeddings, jnp.float32).at[flat].add(1.0)
    avg_probs = counts / flat.shape[0]
    return jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))


def nearest_codebook(flat_x: jnp.ndarray, codebook: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-neighbor assignment: (N, D) x (K, D) -> (indices (N,), quantized (N, D)).

    Differentiable in ``codebook`` through the gathered rows (exactly the
    paths the reference's one-hot @ embedding matmul exposes); the argmin is
    treated as locally constant.
    """
    x2 = jnp.sum(flat_x**2, axis=1, keepdims=True)  # (N, 1)
    e2 = jnp.sum(codebook**2, axis=1)  # (K,)
    # HIGHEST precision: on TPU the default f32 matmul multiplies in
    # bfloat16, which can flip near-tie argmins vs the reference's exact
    # f32 distances.
    cross = jnp.dot(flat_x, codebook.T, precision=jax.lax.Precision.HIGHEST)  # (N, K)
    distances = x2 + e2[None, :] - 2.0 * cross
    indices = jnp.argmin(distances, axis=1)
    quantized = jnp.take(codebook, indices, axis=0)
    return indices, quantized


class VQOutput(struct.PyTreeNode):
    loss: jnp.ndarray
    quantized: jnp.ndarray  # straight-through, input shape
    perplexity: jnp.ndarray
    indices: jnp.ndarray  # (N,) code ids (extra, not in reference)
    # One-hot (N, K), reference return layout. Only materialized when the
    # caller passes need_encodings=True: at speech scale this is a
    # (16k, 1024) f32 tensor (64 MB of HBM) that only the location stage
    # ever reads — training steps never pay for it.
    encodings: Optional[jnp.ndarray] = None


class VectorQuantizer(nn.Module):
    num_embeddings: int
    embedding_dim: int
    commitment_cost: float
    backend: str = "xla"  # "xla" | "pallas"
    ema: bool = False  # optional EMA codebook update (off = reference parity)
    ema_decay: float = 0.99
    ema_eps: float = 1e-5
    # Dead-code restart (Jukebox-style) for the EMA codebook: any code whose
    # EMA usage count falls below this threshold is re-seeded from a current
    # batch row, keeping the whole codebook live. 0.0 = off (default).
    ema_reset_threshold: float = 0.0
    # Set when traced inside a shard_map that shards the time axis (SURVEY.md
    # §5.7): loss means, code-usage counts, and EMA statistics are reduced
    # over the axis so they equal the unsharded computation (assignment
    # itself is position-local and needs no communication).
    sequence_axis: object = None

    def setup(self):
        k = self.num_embeddings

        def cb_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, minval=-1.0 / k, maxval=1.0 / k)

        if self.ema:
            # EMA mode (van den Oord appendix A.1): the codebook is a
            # NON-trainable variable updated from exponentially averaged
            # assignment statistics during the forward pass (like BatchNorm
            # statistics). Under a data-parallel mesh the count/sum
            # reductions are over the global batch — XLA inserts the
            # cross-chip allreduce (SURVEY.md §5.8).
            self.codebook_var = self.variable(
                "vq_stats",
                "codebook",
                lambda: cb_init(self.make_rng("params"), (k, self.embedding_dim)),
            )
            self.ema_counts = self.variable("vq_stats", "ema_counts", lambda: jnp.ones(k))
            self.ema_sums = self.variable(
                "vq_stats", "ema_sums", lambda: jnp.array(self.codebook_var.value)
            )
        else:
            self.codebook = self.param(
                "codebook", cb_init, (self.num_embeddings, self.embedding_dim)
            )

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Codebook rows for stored code ids — the inverse of the assignment,
        used to rebuild quantized latents from a frozen-latent cache."""
        codebook = self.codebook_var.value if self.ema else self.codebook
        return jnp.take(codebook, indices, axis=0)

    def __call__(
        self, inputs: jnp.ndarray, train_vq: bool = True, need_encodings: bool = False
    ) -> VQOutput:
        """``inputs``: (..., D) latents (channels last). Returns VQOutput whose
        ``quantized`` has the input shape; ``encodings`` is None unless
        ``need_encodings=True``."""
        input_shape = inputs.shape
        flat = inputs.reshape(-1, self.embedding_dim)
        codebook = self.codebook_var.value if self.ema else self.codebook

        if self.backend == "pallas":
            from .vq_pallas import nearest_codebook_pallas

            indices, quantized = nearest_codebook_pallas(flat, codebook)
        else:
            indices, quantized = nearest_codebook(flat, codebook)

        # Shard-local mean == global mean after pmean (equal shard sizes).
        gmean = (
            (lambda v: jax.lax.pmean(v, self.sequence_axis))
            if self.sequence_axis is not None
            else (lambda v: v)
        )
        e_latent_loss = gmean(jnp.mean((jax.lax.stop_gradient(quantized) - flat) ** 2))
        if self.ema:
            # Codebook learned from statistics, not gradient: loss carries
            # only the commitment term.
            q_latent_loss = jnp.asarray(0.0, flat.dtype)
            if train_vq and not self.is_initializing():
                sg_flat = jax.lax.stop_gradient(flat)
                if self.backend == "pallas":
                    from .vq_pallas import codebook_stats_pallas

                    counts, sums = codebook_stats_pallas(
                        indices, sg_flat, self.num_embeddings
                    )
                else:
                    counts = jnp.zeros(self.num_embeddings, flat.dtype).at[indices].add(1.0)
                    sums = (
                        jnp.zeros((self.num_embeddings, self.embedding_dim), flat.dtype)
                        .at[indices]
                        .add(sg_flat)
                    )
                if self.sequence_axis is not None:
                    counts = jax.lax.psum(counts, self.sequence_axis)
                    sums = jax.lax.psum(sums, self.sequence_axis)
                new_counts = self.ema_decay * self.ema_counts.value + (1 - self.ema_decay) * counts
                new_sums = self.ema_decay * self.ema_sums.value + (1 - self.ema_decay) * sums
                if self.ema_reset_threshold > 0.0:
                    # Re-seed dead codes from current batch rows (row choice
                    # is deterministic — code id mod batch rows — so the
                    # restart is reproducible).
                    dead = new_counts < self.ema_reset_threshold
                    seed_rows = sg_flat[
                        jnp.arange(self.num_embeddings) % sg_flat.shape[0]
                    ]
                    if self.sequence_axis is not None:
                        # Each shard indexes its LOCAL rows; average them so
                        # the replicated codebook stays identical across
                        # shards after a restart.
                        seed_rows = jax.lax.pmean(seed_rows, self.sequence_axis)
                    new_sums = jnp.where(dead[:, None], seed_rows, new_sums)
                    new_counts = jnp.where(dead, 1.0, new_counts)
                self.ema_counts.value = new_counts
                self.ema_sums.value = new_sums
                n = jnp.sum(new_counts)
                smoothed = (
                    (new_counts + self.ema_eps)
                    / (n + self.num_embeddings * self.ema_eps)
                    * n
                )
                self.codebook_var.value = new_sums / smoothed[:, None]
        elif train_vq:
            q_latent_loss = gmean(jnp.mean((quantized - jax.lax.stop_gradient(flat)) ** 2))
        else:
            # Frozen codebook: same value, no gradient (vector_quantizer.py:50).
            q_latent_loss = jax.lax.stop_gradient(
                gmean(jnp.mean((quantized - flat) ** 2))
            )
        loss = q_latent_loss + self.commitment_cost * e_latent_loss

        quantized = quantized.reshape(input_shape)
        ste = inputs + jax.lax.stop_gradient(quantized - inputs)

        # Global (all-shards) code-usage statistics.
        counts = jnp.zeros(self.num_embeddings, flat.dtype).at[indices].add(1.0)
        n_rows = flat.shape[0]
        if self.sequence_axis is not None:
            counts = jax.lax.psum(counts, self.sequence_axis)
            n_rows = n_rows * jax.lax.axis_size(self.sequence_axis)
        avg_probs = counts / n_rows
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        encodings = (
            jax.nn.one_hot(indices, self.num_embeddings, dtype=flat.dtype)
            if need_encodings
            else None
        )
        return VQOutput(
            loss=loss, quantized=ste, perplexity=perplexity, indices=indices, encodings=encodings
        )

