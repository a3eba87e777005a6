"""FastVim residual Block: Add → Norm → (rotate) → Mixer → (unrotate).

Mirrors the reference Block (models/fastvim.py:106-212) and its channel
variant (models_channel_mamba_faster.py:206-331): the fused add+norm keeps
an fp32 residual stream (prenorm=True), and odd layers transpose two axes
of the token grid so pooling alternates between the col and row axes
("rotate_every_block"). On TPU the rotate is a reshape/transpose the
compiler folds into layouts.

The grid is generic: ``grid_shape`` may be (rows, cols) for FastVim,
(C, rows, cols) for Spatial-First ChannelVim, or (rows, cols, C) for
Channel-First; ``transpose_axes`` names the two grid axes swapped on odd
layers and ``pool_axes`` the axes pooled before the scan.
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


def rotate_grid(x: Array, grid_shape: Tuple[int, ...],
                axes: Tuple[int, int] = (0, 1)) -> Array:
    """Swap two grid axes of a flattened (batch, prod(grid), d) sequence."""
    b, L, d = x.shape
    xg = x.reshape(b, *grid_shape, d)
    xg = jnp.swapaxes(xg, axes[0] + 1, axes[1] + 1)
    return xg.reshape(b, L, d)


def _swapped(grid_shape, axes):
    g = list(grid_shape)
    g[axes[0]], g[axes[1]] = g[axes[1]], g[axes[0]]
    return tuple(g)


class Block(nn.Module):
    dim: int
    layer_idx: int
    token_size: Tuple[int, ...]  # grid shape in base orientation
    mixer_kwargs: Any = None
    pool_axes: Optional[Tuple[int, ...]] = None
    transpose_axes: Tuple[int, int] = (0, 1)
    rotate_every_block: bool = True
    # Explicit per-layer rotate override (None → the default odd-layer
    # schedule). The 2dcompress variant rotates on its own
    # row→col→channel cycle ((i+2)%3==0, …_2dcompress.py:265-267).
    rotate: Optional[bool] = None
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
        import os as _os

        if "noaddnorm" in _os.environ.get("FASTVIM_COMPONENT_ABLATE", ""):
            # ablation ONLY (benchmarks/boundary_cost_tpu.py): skip the
            # inter-layer add+LN to measure the megakernel's layer-
            # boundary cost — the realizable upper bound of the
            # cross-layer B_k⊕A_{k+1} fusion lever (docs/PERF.md §6;
            # adjacent layers tile in transposed orders, so the x̂ HBM
            # round-trip itself is not avoidable). Numerics change;
            # speed is the signal.
            residual = (hidden.astype(jnp.float32) if residual is None
                        else residual + hidden.astype(residual.dtype))
            hidden = residual.astype(self.dtype)
        else:
            hidden, residual = add_norm(
                hidden, norm_w, norm_b, residual=residual, prenorm=True,
                residual_in_fp32=self.residual_in_fp32, eps=self.norm_eps,
                rms=self.rms_norm, out_dtype=self.dtype)

        grid = tuple(self.token_size)
        rotated = (self.rotate if self.rotate is not None else
                   self.rotate_every_block and self.layer_idx % 2 != 0)
        kwargs = dict(self.mixer_kwargs or {})
        # Rotated pooled layers on a 2-D grid run WITHOUT materializing
        # the transposed sequence: the mixer convs along the transposed
        # raster in-place (ops/conv.transposed_dual_conv1d) and pools the
        # other grid axis. Two full-HBM relayouts per odd block gone
        # (measured ~13% of the 2048px forward).
        mixer_fields = MambaMixer.__dataclass_fields__
        collapse_ok = kwargs.get(
            "collapse_method",
            mixer_fields["collapse_method"].default) in ("mean", "max")
        fused_off = kwargs.get(
            "fused_kernels",
            mixer_fields["fused_kernels"].default) == "never"
        transposed = (
            rotated and len(grid) == 2
            and self.transpose_axes == (0, 1)
            and self.pool_axes is None
            and collapse_ok and fused_off)
        # ChannelVim Channel-First (rows, cols, C): the rotated raster is
        # (col, row, ch) — a shift along it is a C-axis shift with a
        # one-row wrap, so the odd-layer conv CAN run flip-free too
        # (ops/conv.channel_grid_dual_conv1d; needs C ≥ conv width).
        # MEASURED NEGATIVE on v5e (interleaved, @224 ps16 C=8 b8):
        # flip-free 87.8 ms vs materialized rotate 83.1 ms. The two
        # transposes are ~0.4 ms of bytes — the odd-layer overhead is
        # schedule/fusion breakage, which the C-axis (sublane) shift
        # concat trees trigger just as badly. Kept opt-in
        # (FASTVIM_CHANNEL_FLIPFREE=1), parity-locked by
        # tests/test_channel.py::test_channel_flipfree_rotated_conv_parity.
        import os
        d_conv = kwargs.get("d_conv", mixer_fields["d_conv"].default)
        if (rotated and not transposed and len(grid) == 3
                and self.transpose_axes == (0, 1)
                and self.pool_axes == (1,)
                and grid[2] >= d_conv
                and collapse_ok and fused_off
                and os.environ.get("FASTVIM_CHANNEL_FLIPFREE", "0") == "1"):
            transposed = True
        mixer = MambaMixer(
            d_model=self.dim, dtype=self.dtype, name="mixer", **kwargs)
        if transposed:
            hidden = mixer(hidden, grid, pool_axes=(0,), transposed=True)
        elif rotated:
            hidden = rotate_grid(hidden, grid, self.transpose_axes)
            mixer_grid = _swapped(grid, self.transpose_axes)
            hidden = mixer(hidden, mixer_grid, pool_axes=self.pool_axes)
            hidden = rotate_grid(hidden, mixer_grid, self.transpose_axes)
        else:
            hidden = mixer(hidden, grid, pool_axes=self.pool_axes)
        return hidden, residual
