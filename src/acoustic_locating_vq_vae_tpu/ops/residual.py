"""Residual blocks and stacks (reference: vq_vae/modules/residual.py:31-66,
residual_stack.py:34-46).

Two reference quirks are reproduced behind flags, with the reference
behavior as the default so output parity holds (SURVEY.md hard part #3):

* **Tied stack weights** (``tied=True``): the reference builds its stack as
  ``nn.ModuleList([Residual(...)] * N)`` — Python list-multiply, so all N
  "layers" are the SAME module instance and share weights
  (residual_stack.py:40-41). In flax, calling one submodule N times gives
  exactly that sharing.
* **conv_2 default init** (``compat_init=True``): residual.py:45,55 applies
  kaiming init to conv_1 twice and never to conv_2, leaving conv_2 at
  torch's default init.
* **In-place ReLU mutates the skip** (``compat_inplace_relu=True``): the
  reference builds its block as ``Sequential(ReLU(inplace=True), conv_1,
  ReLU(inplace=True), conv_2)`` (residual.py:37,49) and computes
  ``x + self._block(x)``. The first in-place ReLU mutates ``x`` itself
  BEFORE the addition, so the block actually computes
  ``relu(x) + conv2(relu(conv1(relu(x))))`` — and the encoder's outer skip
  (convolutional_encoder.py:42 ``resstack(x1) + x1``) adds ``relu(x1)``
  because the first block mutated ``x1`` in place. Both reproduced here as
  the compat default; ``compat_inplace_relu=False`` gives the clean
  pre-activation residual the code *looks like* it implements.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv1d

__all__ = ["Residual", "ResidualStack"]


class Residual(nn.Module):
    """x + Conv1x1(ReLU(Conv3(ReLU(x)))), both convs bias-free."""

    num_hiddens: int
    num_residual_hiddens: int
    compat_init: bool = True
    compat_inplace_relu: bool = True
    dtype: object = None
    sequence_axis: object = None  # time-sharded mode (see ops/conv.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rx = nn.relu(x)
        h = Conv1d(
            self.num_residual_hiddens, kernel_size=3, padding=1, use_bias=False,
            init_mode="kaiming", name="conv_1", dtype=self.dtype,
            sequence_axis=self.sequence_axis,
        )(rx)
        h = nn.relu(h)
        h = Conv1d(
            self.num_hiddens, kernel_size=1, padding=0, use_bias=False,
            init_mode="torch_default" if self.compat_init else "kaiming", name="conv_2",
            dtype=self.dtype,
        )(h)
        # Reference: the in-place ReLU turned the skip into relu(x) (see
        # module docstring); non-compat keeps the un-activated skip.
        return (rx if self.compat_inplace_relu else x) + h


class ResidualStack(nn.Module):
    """N residual blocks followed by a final ReLU (residual_stack.py:43-46)."""

    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    tied: bool = True
    compat_init: bool = True
    compat_inplace_relu: bool = True
    dtype: object = None
    sequence_axis: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tied:
            block = Residual(
                self.num_hiddens, self.num_residual_hiddens, self.compat_init,
                compat_inplace_relu=self.compat_inplace_relu,
                dtype=self.dtype, name="residual",
                sequence_axis=self.sequence_axis,
            )
            for _ in range(self.num_residual_layers):
                x = block(x)
        else:
            for i in range(self.num_residual_layers):
                x = Residual(
                    self.num_hiddens, self.num_residual_hiddens, self.compat_init,
                    compat_inplace_relu=self.compat_inplace_relu,
                    dtype=self.dtype, name=f"residual_{i}",
                    sequence_axis=self.sequence_axis,
                )(x)
        return nn.relu(x)
