"""Conv patch embedding, channels-last.

TPU-native re-design of the reference PatchEmbed (models/fastvim.py:25-103):
images are NHWC (TPU layout; the reference uses NCHW), patchify is a
stride-p conv that XLA lowers to one MXU GEMM over unfolded patches.
``scanpath_type="colwise"`` transposes the grid after patchify
(models/fastvim.py:97-98) so the trunk's raster order is column-major;
``dynamic_img_pad`` zero-pads odd resolutions up to a multiple of the
patch size (models/fastvim.py:90-93).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class _PatchProj(nn.Module):
    """Stride-p patchify via reshape + GEMM, with conv-shaped params."""

    embed_dim: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, gh: int, gw: int) -> Array:
        B, H, W, C = x.shape
        p = self.patch
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, C, self.embed_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        patches = x.reshape(B, gh, p, gw, p, C)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)  # B gh gw p p C
        patches = patches.reshape(B, gh, gw, p * p * C)
        w = kernel.reshape(p * p * C, self.embed_dim).astype(self.dtype)
        y = jnp.dot(patches.astype(self.dtype), w,
                    preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)[None, None, None]


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    scanpath_type: str = "rowwise"  # rowwise = Pool_col in the paper
    dynamic_img_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Tuple[int, int]]:
        """x: (batch, H, W, C) → tokens (batch, rows*cols, D), (rows, cols)
        in scan orientation."""
        p = self.patch_size
        B, H, W, C = x.shape
        if self.dynamic_img_pad:
            pad_h = (-H) % p
            pad_w = (-W) % p
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                H, W = H + pad_h, W + pad_w
        else:
            assert H % p == 0 and W % p == 0, (H, W, p)
        # Patchify as space-to-depth + one MXU GEMM instead of a strided
        # conv: stride-p convs trigger an input layout copy on TPU
        # (profiled ~1ms at 2048px); the reshape path is mathematically
        # identical and layout-free. Params keep nn.Conv's exact
        # shape/naming (proj/kernel (p,p,C,D), proj/bias) for checkpoint
        # compatibility.
        gh, gw = H // p, W // p
        x = _PatchProj(self.embed_dim, p, dtype=self.dtype,
                       name="proj")(x, gh, gw)
        if self.scanpath_type == "colwise":
            x = x.transpose(0, 2, 1, 3)
            rows, cols = gw, gh
        else:
            rows, cols = gh, gw
        return x.reshape(B, rows * cols, self.embed_dim), (rows, cols)


def resize_pos_embed(pos_embed: Array, new_hw: Tuple[int, int],
                     old_hw: Tuple[int, int],
                     scanpath_type: str = "rowwise") -> Array:
    """Bicubic-resize a (1, L, D) pos-embed between token grids.

    Mirrors MM_FastVim.resize_pos_embed (models/fastvim.py:645-682),
    including the colwise transpose dance.
    """
    oh, ow = old_hw
    nh, nw = new_hw
    _, L, D = pos_embed.shape
    assert L == oh * ow, (L, old_hw)
    grid = pos_embed.reshape(1, oh, ow, D)
    if scanpath_type == "colwise":
        grid = grid.transpose(0, 2, 1, 3)
        oh, ow = ow, oh
        nh, nw = nw, nh
    grid = jax.image.resize(grid.astype(jnp.float32), (1, nh, nw, D),
                            method="bicubic")
    if scanpath_type == "colwise":
        grid = grid.transpose(0, 2, 1, 3)
        nh, nw = nw, nh
    return grid.reshape(1, nh * nw, D).astype(pos_embed.dtype)
