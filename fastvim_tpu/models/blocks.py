"""FastVim residual Block: Add → Norm → (rotate) → Mixer → (unrotate).

Mirrors the reference Block (models/fastvim.py:106-212): the fused
add+norm keeps an fp32 residual stream (prenorm=True), and odd layers
transpose the (rows, cols) token grid so pooling alternates between the
col and row axes ("rotate_every_block", models/fastvim.py:192-211). On
TPU the rotate is a reshape/transpose the compiler folds into layouts.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.models.layers import DropPath
from fastvim_tpu.models.mixer import MambaMixer
from fastvim_tpu.ops import add_norm

Array = jax.Array


def rotate_grid(x: Array, rows: int, cols: int) -> Array:
    """Transpose the token grid of a flattened (batch, rows*cols, d) seq."""
    b, L, d = x.shape
    return x.reshape(b, rows, cols, d).transpose(0, 2, 1, 3).reshape(b, L, d)


class Block(nn.Module):
    dim: int
    layer_idx: int
    token_size: Tuple[int, int]
    mixer_kwargs: Any = None
    rotate_every_block: bool = True
    rms_norm: bool = True
    residual_in_fp32: bool = True
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, residual: Optional[Array],
                 deterministic: bool = True):
        norm_w = self.param("norm_weight", nn.initializers.ones, (self.dim,))
        norm_b = (None if self.rms_norm else
                  self.param("norm_bias", nn.initializers.zeros, (self.dim,)))
        if residual is not None:
            hidden = DropPath(self.drop_path)(hidden, deterministic)
        hidden, residual = add_norm(
            hidden, norm_w, norm_b, residual=residual, prenorm=True,
            residual_in_fp32=self.residual_in_fp32, eps=self.norm_eps,
            rms=self.rms_norm, out_dtype=self.dtype)

        rows, cols = self.token_size
        rotated = self.rotate_every_block and self.layer_idx % 2 != 0
        if rotated:
            hidden = rotate_grid(hidden, rows, cols)
            mixer_token = (cols, rows)
        else:
            mixer_token = (rows, cols)

        kwargs = dict(self.mixer_kwargs or {})
        hidden = MambaMixer(
            d_model=self.dim, dtype=self.dtype, name="mixer", **kwargs
        )(hidden, mixer_token)

        if rotated:
            hidden = rotate_grid(hidden, cols, rows)
        return hidden, residual
