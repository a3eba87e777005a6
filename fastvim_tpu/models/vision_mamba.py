"""VisionMamba trunk: patchify → pos-embed → N blocks → norm → pool → head.

TPU-native re-design of the reference VisionMamba
(models/fastvim.py:342-557) and its MM_FastVim feature-extractor mode
(models/fastvim.py:560-691). One class serves both: pass ``out_indices``
to get multi-scale NHWC feature maps (per-index LayerNorm applied),
otherwise the classification path runs (final norm → pool → head).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.models.blocks import Block
from fastvim_tpu.models.layers import DropPath
from fastvim_tpu.models.patch_embed import PatchEmbed, resize_pos_embed
from fastvim_tpu.ops import add_norm, layer_norm

Array = jax.Array


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class VisionMamba(nn.Module):
    img_size: Any = 224  # int or (H, W) — rect supported like the
    # reference PatchEmbed's to_2tuple(img_size) (models/fastvim.py:42)
    patch_size: int = 16
    depth: int = 24
    embed_dim: int = 192
    channels: int = 3
    num_classes: int = 1000
    ssm_cfg: Any = None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    fused_add_norm: bool = True  # kept for config parity; always fused here
    final_pool_type: str = "mean"
    if_abs_pos_embed: bool = True
    if_cls_token: bool = False
    use_middle_cls_token: bool = False
    init_layer_scale: Optional[float] = None
    scanpath_type: str = "rowwise"
    use_norm_after_ssm: bool = True
    rotate_every_block: bool = True
    collapse_method: str = "mean"
    scaling_factor: float = 1.0
    out_indices: Optional[Sequence[int]] = None
    scan_impl: str = "auto"
    # Full-layer megakernel dispatch (see MambaMixer.layer_fused):
    # "auto" | "on" | "off"; FASTVIM_LAYER_FUSED env overrides.
    layer_fused: str = "auto"
    layer_fused_bwd: str = "fused"
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM)
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, int]:
        """Token grid at the training resolution, in scan orientation
        (colwise swaps, mirroring models/fastvim.py:46-58)."""
        hw = (self.img_size if isinstance(self.img_size, (tuple, list))
              else (self.img_size, self.img_size))
        gh, gw = hw[0] // self.patch_size, hw[1] // self.patch_size
        return (gw, gh) if self.scanpath_type == "colwise" else (gh, gw)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 return_features: bool = False):
        """x: (batch, H, W, C) NHWC images.

        Returns logits (batch, num_classes); with ``return_features``,
        pooled features; with ``out_indices`` set, a list of NHWC feature
        maps (the MM backbone contract, models/fastvim.py:684-691).
        """
        B = x.shape[0]
        tokens, (rows, cols) = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            scanpath_type=self.scanpath_type, dtype=self.dtype,
            name="patch_embed")(x)

        cls_position = None
        if self.if_cls_token:
            # Vim baseline: cls token in the middle of the (non-pooled)
            # scan sequence (models/vim.py:417-431)
            assert self.collapse_method == "none" and \
                not self.rotate_every_block, (
                    "cls token is only supported for the non-pooled, "
                    "non-rotating Vim baseline")
            assert self.out_indices is None
            M = tokens.shape[1]
            cls_tok = self.param("cls_token", trunc_normal_init(0.02),
                                 (1, 1, self.embed_dim))
            cls_tok = jnp.broadcast_to(
                cls_tok.astype(tokens.dtype), (B, 1, self.embed_dim))
            cls_position = M // 2 if self.use_middle_cls_token else 0
            tokens = jnp.concatenate(
                [tokens[:, :cls_position], cls_tok,
                 tokens[:, cls_position:]], axis=1)

        if self.if_abs_pos_embed:
            n_pos = self.num_patches + (1 if self.if_cls_token else 0)
            pos = self.param("pos_embed", trunc_normal_init(0.02),
                             (1, n_pos, self.embed_dim))
            if (rows, cols) != self._train_grid() and not self.if_cls_token:
                pos = resize_pos_embed(pos, (rows, cols), self._train_grid(),
                                       self.scanpath_type)
            tokens = tokens + pos.astype(tokens.dtype)
            if self.drop_rate > 0:
                tokens = nn.Dropout(self.drop_rate)(
                    tokens, deterministic=deterministic)

        mixer_kwargs = dict(
            use_norm_after_ssm=self.use_norm_after_ssm,
            init_layer_scale=self.init_layer_scale,
            collapse_method=self.collapse_method,
            scaling_factor=self.scaling_factor,
            n_layer=self.depth,
            scan_impl=self.scan_impl,
            layer_fused=self.layer_fused,
            layer_fused_bwd=self.layer_fused_bwd,
            **(self.ssm_cfg or {}),
        )
        import numpy as np

        dpr = [float(r) for r in
               np.linspace(0, self.drop_path_rate, self.depth)]
        inter_dpr = [0.0] + dpr[:-1] if self.depth > 1 else [0.0]

        from fastvim_tpu.parallel.mesh import maybe_shard_tokens

        # jax.checkpoint per block: recompute activations in backward
        # instead of storing 24× full-length intermediates (the TPU
        # counterpart of the reference's checkpoint_lvl recompute,
        # selective_scan_interface.py:303-306)
        block_cls = (nn.remat(Block, static_argnums=(3,))
                     if self.remat else Block)

        hidden, residual = maybe_shard_tokens(tokens), None
        outs = []
        for i in range(self.depth):
            hidden, residual = block_cls(
                dim=self.embed_dim, layer_idx=i, token_size=(rows, cols),
                mixer_kwargs=mixer_kwargs,
                rotate_every_block=self.rotate_every_block,
                rms_norm=self.rms_norm,
                residual_in_fp32=self.residual_in_fp32,
                norm_eps=self.norm_epsilon, drop_path=inter_dpr[i],
                dtype=self.dtype, name=f"layers_{i}",
            )(hidden, residual, deterministic)
            if self.out_indices is not None and i in self.out_indices:
                outs.append(hidden)

        if self.out_indices is not None:
            assert len(outs) == len(self.out_indices)
            feats = []
            for j, o in enumerate(outs):
                w = self.param(f"outnorm_{j}_weight", nn.initializers.ones,
                               (self.embed_dim,))
                b = self.param(f"outnorm_{j}_bias", nn.initializers.zeros,
                               (self.embed_dim,))
                o = layer_norm(o.astype(jnp.float32), w, b)
                feats.append(o.reshape(B, rows, cols, self.embed_dim))
            return feats

        norm_w = self.param("norm_f_weight", nn.initializers.ones,
                            (self.embed_dim,))
        norm_b = (None if self.rms_norm else
                  self.param("norm_f_bias", nn.initializers.zeros,
                             (self.embed_dim,)))
        hidden = DropPath(self.drop_path_rate)(hidden, deterministic)
        hidden = add_norm(hidden, norm_w, norm_b, residual=residual,
                          prenorm=False,
                          residual_in_fp32=self.residual_in_fp32,
                          eps=self.norm_epsilon, rms=self.rms_norm,
                          out_dtype=self.dtype)

        if cls_position is not None:
            # return only the cls token (models/vim.py:484-486)
            feat = hidden[:, cls_position]
        elif self.final_pool_type == "mean":
            feat = hidden.mean(axis=1)
        elif self.final_pool_type == "none":
            feat = hidden[:, -1]
        elif self.final_pool_type in ("max", "all"):
            feat = hidden  # (batch, L, D); 'max' pools after the head
        else:
            raise NotImplementedError(self.final_pool_type)

        if return_features:
            return feat
        if self.num_classes <= 0:
            return feat
        logits = nn.Dense(self.num_classes,
                          kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="head")(feat)
        if self.final_pool_type == "max":
            logits = logits.max(axis=1)
        return logits

    def _train_grid(self) -> Tuple[int, int]:
        return self.grid_size
