"""Fused Pallas TPU kernel for the vector-quantizer assignment core.

The XLA path (ops/vq.py:nearest_codebook) materializes the full (N, K)
distance matrix in HBM between the matmul and the argmin. For the reference
speech config that is (32*500, 1024) floats = 64 MB of HBM traffic per step
each way. This kernel fuses distance -> argmin -> one-hot -> gather inside
VMEM: the codebook lives in VMEM across the whole grid, each block of input
rows computes its cross-products on the MXU, reduces to indices on the VPU,
and emits the quantized rows via a one-hot matmul (MXU) — the (N, K)
intermediate never touches HBM.

Two algebraic facts the kernel uses:
  * argmin_k ||x - e_k||^2 == argmin_k (||e_k||^2 - 2 x.e_k) — the ||x||^2
    term is row-constant and cannot change the argmin, so it is never
    computed;
  * quantized = one_hot(idx) @ codebook is an MXU matmul, avoiding a
    serialized VMEM gather.

The backward pass (custom VJP, matching the differentiable paths of the
XLA version exactly) needs only d codebook = one_hot(idx)^T @ g — a second
Pallas kernel that accumulates across row blocks into a (K, D) output.

Wrapper handles padding: rows to the block multiple, D and K to lane/tile
multiples (zero-padded dims change no distances; padded codebook rows are
pushed to +inf distance so they are never selected).

On non-TPU backends the kernels run in interpreter mode so the full test
suite exercises them on CPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nearest_codebook_pallas", "codebook_stats_pallas"]

_BLOCK_N = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, cb_ref, e2_ref, idx_ref):
    """One row-block: x (BN, D), cb (K, D), e2 (1, K) -> idx (BN, 1).

    f32 multiplication precision (HIGHEST) so ties/near-ties resolve exactly
    as the reference's f32 distance matrix does; the row gather happens
    outside the kernel (jnp.take — exact, and only (N, D) of HBM traffic)."""
    x = x_ref[:]
    cb = cb_ref[:]
    # scores = -2 x.e + ||e||^2 ; argmin == nearest codebook
    cross = jax.lax.dot_general(
        x, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (BN, K)
    scores = e2_ref[:] - 2.0 * cross
    idx = jnp.argmin(scores, axis=1).astype(jnp.int32)  # (BN,)
    idx_ref[:] = idx[:, None]


def _bwd_kernel(idx_ref, g_ref, dcb_ref):
    """Accumulate d codebook += one_hot(idx)^T @ g over row blocks."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    idx = idx_ref[:][:, 0]  # (BN,)
    g = g_ref[:]  # (BN, D)
    k = dcb_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], k), 1) == idx[:, None]).astype(
        jnp.float32
    )
    dcb_ref[:] += jax.lax.dot_general(
        onehot, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_to(x: jnp.ndarray, mult: int, axis: int, value: float = 0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _fwd_impl(flat_x: jnp.ndarray, codebook: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n, d = flat_x.shape
    k = codebook.shape[0]

    x = _pad_to(flat_x.astype(jnp.float32), _BLOCK_N, 0)
    x = _pad_to(x, 128, 1)
    cb = _pad_to(codebook.astype(jnp.float32), 128, 1)
    cb = _pad_to(cb, 128, 0)
    kp = cb.shape[0]
    e2 = jnp.sum(cb * cb, axis=1)[None, :]  # (1, Kp)
    if kp > k:  # padded codebook rows must never win the argmin
        e2 = e2.at[:, k:].set(jnp.inf)

    npad, dp = x.shape
    grid = (npad // _BLOCK_N,)
    idx = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_N, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        interpret=_interpret(),
    )(x, cb, e2)
    indices = idx[:n, 0]
    quantized = jnp.take(codebook, indices, axis=0)  # exact rows
    return indices, quantized


def _dcb_impl(indices: jnp.ndarray, g: jnp.ndarray, k: int, d: int) -> jnp.ndarray:
    idx = _pad_to(indices[:, None].astype(jnp.int32), _BLOCK_N, 0, value=-1)
    gp = _pad_to(_pad_to(g.astype(jnp.float32), _BLOCK_N, 0), 128, 1)
    kp = -(-k // 128) * 128
    npad, dp = gp.shape
    grid = (npad // _BLOCK_N,)
    dcb = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_N, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, dp), jnp.float32),
        interpret=_interpret(),
    )(idx, gp)
    return dcb[:k, :d]


def codebook_stats_pallas(
    indices: jnp.ndarray, flat_x: jnp.ndarray, num_embeddings: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-code usage counts and input sums in ONE blocked kernel pass:
    (indices (N,), flat_x (N, D)) -> (counts (K,), sums (K, D)).

    These are the statistics the EMA codebook update and the perplexity need
    (vector_quantizer.py:55-56 / van den Oord appendix A.1). Rather than two
    scatter-adds over HBM, augment the rows with a ones column and reuse the
    backward kernel's blocked one-hot-transpose matmul:
    one_hot(idx)^T @ [x | 1] = [sums | counts] on the MXU.
    """
    n, d = flat_x.shape
    aug = jnp.concatenate([flat_x, jnp.ones((n, 1), flat_x.dtype)], axis=1)
    out = _dcb_impl(indices.astype(jnp.int32), aug, num_embeddings, d + 1)
    return out[:, d], out[:, :d]


@jax.custom_vjp
def nearest_codebook_pallas(flat_x: jnp.ndarray, codebook: jnp.ndarray):
    """Drop-in for ops.vq.nearest_codebook: (N, D) x (K, D) -> (idx, quantized)."""
    return _fwd_impl(flat_x, codebook)


def _vjp_fwd(flat_x, codebook):
    idx, q = _fwd_impl(flat_x, codebook)
    # Residuals must be jax types; the codebook array carries its own static
    # shape/dtype into the backward trace (it is alive as a param anyway).
    return (idx, q), (idx, codebook)


def _vjp_bwd(res, grads):
    idx, codebook = res
    k, d = codebook.shape
    _, gq = grads  # idx output is integer: no gradient
    dcb = _dcb_impl(idx, gq, k, d).astype(codebook.dtype)
    # argmin is locally constant: no gradient to the inputs through the
    # gather (identical to the XLA path's differentiable structure).
    return jnp.zeros((gq.shape[0], d), gq.dtype), dcb


nearest_codebook_pallas.defvjp(_vjp_fwd, _vjp_bwd)
