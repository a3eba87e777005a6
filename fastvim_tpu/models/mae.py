"""FastMaskVim: masked-autoencoder pretraining for FastVim.

TPU-native re-design of the reference MAE stack
(models/mae/models_mamba_faster_mae_vimdecoder.py:515-890):

* fixed 2-D sin-cos pos embeds (:25-72,645-655)
* sorted random masking — the kept 25% of ``ids_shuffle`` is re-sorted so
  the visible subsequence preserves raster scan order (:757, load-bearing
  for Mamba)
* encoder of masked pooled-mixer blocks; odd layers rotate by permuting
  ``ids_keep`` through the transposed grid and argsorting back to raster
  order (Block_masked, :372-394)
* plain (non-pooled, non-rotating) Vim decoder blocks (:616-632)
* norm-pix MSE on masked patches (:864-880)

Static shapes: ``len_keep`` is fixed at trace time from the (static)
mask_ratio, and all gathers/permutations are fixed-size argsort/gather —
no dynamic shapes under jit (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastvim_tpu.models.blocks import Block
from fastvim_tpu.models.mixer import MambaMixer
from fastvim_tpu.models.patch_embed import PatchEmbed
from fastvim_tpu.ops import add_norm

Array = jax.Array


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding, (grid*grid, embed_dim).

    Standard MAE construction (models/mae/..._vimdecoder.py:25-72):
    half the channels encode the row coordinate, half the column, each as
    interleaved sin/cos of geometrically spaced frequencies.
    """
    assert embed_dim % 4 == 0
    d_half = embed_dim // 2

    def embed_1d(pos: np.ndarray) -> np.ndarray:
        omega = np.arange(d_half // 2, dtype=np.float64)
        omega = 1.0 / 10000 ** (omega / (d_half / 2.0))
        out = np.einsum("p,f->pf", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    gw, gh = np.meshgrid(grid_w, grid_h)  # gh varies over rows
    # Reference order (models/mae/..._vimdecoder.py:42-50): the first
    # half encodes grid[0] — the COLUMN coordinate (meshgrid 'xy' puts w
    # first), the second half the row. Locked by test_torch_parity.
    emb_col = embed_1d(gw)
    emb_row = embed_1d(gh)
    return np.concatenate([emb_col, emb_row], axis=1).astype(np.float32)


def sorted_random_masking(rng: Array, batch: int, L: int, len_keep: int,
                          noise: Optional[Array] = None):
    """Per-sample random masking with scan-order-preserving kept subset.

    Returns (ids_keep (batch, len_keep) ascending, mask (batch, L) with
    1=removed, ids_restore (batch, L)). Mirrors
    models/mae/..._vimdecoder.py:738-772. ``noise`` overrides the random
    draw (parity tests inject the torch side's noise).
    """
    if noise is None:
        noise = jax.random.uniform(rng, (batch, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    kept_sorted = jnp.sort(ids_shuffle[:, :len_keep], axis=1)
    ids_shuffle = jnp.concatenate(
        [kept_sorted, ids_shuffle[:, len_keep:]], axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    mask = jnp.ones((batch, L))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return kept_sorted, mask, ids_restore


class BlockMasked(nn.Module):
    """Masked FastVim block: Add→Norm→(ids-rotate)→masked-mixer→(unrotate).

    Mirrors Block_masked (models/mae/..._vimdecoder.py:279-396).
    """

    dim: int
    layer_idx: int
    token_size: Tuple[int, int]
    mixer_kwargs: Any = None
    rotate_every_block: bool = True
    rms_norm: bool = True
    residual_in_fp32: bool = True
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, residual: Optional[Array],
                 ids_keep: Array, deterministic: bool = True):
        norm_w = self.param("norm_weight", nn.initializers.ones, (self.dim,))
        norm_b = (None if self.rms_norm else
                  self.param("norm_bias", nn.initializers.zeros, (self.dim,)))
        hidden, residual = add_norm(
            hidden, norm_w, norm_b, residual=residual, prenorm=True,
            residual_in_fp32=self.residual_in_fp32, eps=self.norm_eps,
            rms=self.rms_norm, out_dtype=self.dtype)

        rows, cols = self.token_size
        rotated = self.rotate_every_block and self.layer_idx % 2 != 0
        if rotated:
            # raster index (i, j) → transposed raster index j*rows + i
            i = ids_keep // cols
            j = ids_keep % cols
            ids_keep = j * rows + i
            order = jnp.argsort(ids_keep, axis=1)
            inv_order = jnp.argsort(order, axis=1)
            ids_keep = jnp.take_along_axis(ids_keep, order, axis=1)
            hidden = jnp.take_along_axis(hidden, order[..., None], axis=1)
            mixer_rows, mixer_cols = cols, rows
        else:
            mixer_rows, mixer_cols = rows, cols

        row_ids = ids_keep // mixer_cols
        row_onehot = jax.nn.one_hot(row_ids, mixer_rows, dtype=self.dtype)

        kwargs = dict(self.mixer_kwargs or {})
        hidden = MambaMixer(
            d_model=self.dim, dtype=self.dtype, name="mixer", **kwargs
        )(hidden, (mixer_rows, mixer_cols), row_onehot=row_onehot)

        if rotated:
            hidden = jnp.take_along_axis(hidden, inv_order[..., None], axis=1)
        return hidden, residual


class MaskedAutoencoderVim(nn.Module):
    """FastMaskVim MAE (encoder: masked pooled mixer; decoder: plain Vim)."""

    img_size: int = 224
    patch_size: int = 16
    depth: int = 24
    embed_dim: int = 192
    decoder_embed_dim: int = 512
    decoder_depth: int = 2
    norm_pix_loss: bool = True
    channels: int = 3
    ssm_cfg: Any = None
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    fused_add_norm: bool = True
    init_layer_scale: Optional[float] = None
    use_norm_after_ssm: bool = True
    scanpath_type: str = "rowwise"
    rotate_every_block: bool = True
    collapse_method: str = "mean"
    encoder_type: str = "fastvim"  # "fastvim" (masked pooled mixer) |
    # "vim" (plain non-pooled blocks over the visible subsequence — the
    # Vim-MAE baseline, models/mae/fastvim_mae.py)
    use_cls_token: bool = False  # Vim-MAE inserts a cls token at the
    # middle of the visible sequence (fastvim_mae.py:575-581); the decoder
    # re-appends it at the end and drops it after prediction (:634-679).
    # Its pos-embed row is zeros (:38-39). Only meaningful with
    # encoder_type="vim" (FastMaskVim has no cls token).
    scan_impl: str = "auto"
    # Route exposed full-L scans to the Pallas chunked kernel on TPU
    # (the ChannelVim lesson, VERDICT r3 #1): the DECODER's non-pooled
    # scans (L=grid², d_inner=2·dec_dim=1024, n=16) match the exposure
    # pattern where scan temps dwarf the full-L stream; measured on
    # hardware in benchmarks/mae_cost_tpu.py. None → global default.
    pallas_min_l: Optional[int] = 64
    # Megakernel dispatch for the (dense, fusable-grid) blocks; the
    # masked encoder (row_onehot) never fuses, and 14x14 decoder grids
    # fail `fusable`, so this only matters for non-224 sizes.
    layer_fused: str = "auto"
    remat: bool = False  # rematerialize encoder blocks (Huge-scale)
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    def patchify(self, imgs: Array) -> Array:
        """imgs (batch, H, W, C) NHWC → (batch, L, p*p*C)."""
        p = self.patch_size
        B, H, W, C = imgs.shape
        h, w = H // p, W // p
        x = imgs.reshape(B, h, p, w, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * w, p * p * C)

    def unpatchify(self, x: Array) -> Array:
        p = self.patch_size
        B, L, _ = x.shape
        h = w = int(round(L ** 0.5))
        C = x.shape[2] // (p * p)
        x = x.reshape(B, h, w, p, p, C).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * p, w * p, C)

    @nn.compact
    def __call__(self, imgs: Array, mask_ratio: float = 0.75,
                 deterministic: bool = True, rng: Optional[Array] = None):
        """Returns (loss, pred (batch, L, p²C), mask (batch, L))."""
        latent, mask, ids_restore = self.encode(imgs, mask_ratio,
                                                deterministic, rng)
        pred = self.decode(latent, ids_restore, deterministic)
        loss = self.loss(imgs, pred, mask)
        return loss, pred, mask

    def encode(self, imgs, mask_ratio, deterministic=True, rng=None):
        tokens, (rows, cols) = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            scanpath_type=self.scanpath_type, dtype=self.dtype,
            name="patch_embed")(imgs)
        B, L, _ = tokens.shape
        pos = jnp.asarray(get_2d_sincos_pos_embed(self.embed_dim, self.grid))
        tokens = tokens + pos[None].astype(tokens.dtype)

        len_keep = int(L * (1 - mask_ratio))
        if rng is None:
            rng = self.make_rng("mask")
        ids_keep, mask, ids_restore = sorted_random_masking(
            rng, B, L, len_keep)
        visible = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)

        mixer_kwargs = dict(
            use_norm_after_ssm=self.use_norm_after_ssm,
            init_layer_scale=self.init_layer_scale,
            collapse_method=self.collapse_method,
            n_layer=self.depth,
            scan_impl=self.scan_impl,
            pallas_min_l=self.pallas_min_l,
            layer_fused=self.layer_fused,
            **(self.ssm_cfg or {}),
        )
        hidden, residual = visible, None
        if self.encoder_type == "vim":
            # Vim-MAE baseline: plain full-scan blocks over the visible
            # subsequence (no pooling, no ids plumbing)
            enc_len = len_keep
            if self.use_cls_token:
                # mid-sequence cls token (fastvim_mae.py:575-581); its
                # pos-embed row is zeros, so cls_token + pos[0] = cls_token
                cls = self.param(
                    "cls_token",
                    nn.initializers.truncated_normal(0.02, lower=-2.0,
                                                     upper=2.0),
                    (1, 1, self.embed_dim))
                tp = len_keep // 2
                cls_b = jnp.broadcast_to(
                    cls.astype(hidden.dtype), (B, 1, self.embed_dim))
                hidden = jnp.concatenate(
                    [hidden[:, :tp], cls_b, hidden[:, tp:]], axis=1)
                enc_len = len_keep + 1
            vim_kwargs = dict(mixer_kwargs)
            vim_kwargs["collapse_method"] = "none"
            block_cls = (nn.remat(Block, static_argnums=(3,))
                         if self.remat else Block)
            for i in range(self.depth):
                hidden, residual = block_cls(
                    dim=self.embed_dim, layer_idx=i,
                    token_size=(enc_len, 1), mixer_kwargs=vim_kwargs,
                    rotate_every_block=False, rms_norm=self.rms_norm,
                    residual_in_fp32=self.residual_in_fp32,
                    norm_eps=self.norm_epsilon, dtype=self.dtype,
                    name=f"layers_{i}",
                )(hidden, residual, deterministic)
        else:
            block_cls = (nn.remat(BlockMasked, static_argnums=(4,))
                         if self.remat else BlockMasked)
            for i in range(self.depth):
                hidden, residual = block_cls(
                    dim=self.embed_dim, layer_idx=i,
                    token_size=(rows, cols), mixer_kwargs=mixer_kwargs,
                    rotate_every_block=self.rotate_every_block,
                    rms_norm=self.rms_norm,
                    residual_in_fp32=self.residual_in_fp32,
                    norm_eps=self.norm_epsilon, dtype=self.dtype,
                    name=f"layers_{i}",
                )(hidden, residual, ids_keep, deterministic)

        w = self.param("norm_f_weight", nn.initializers.ones,
                       (self.embed_dim,))
        b = (None if self.rms_norm else
             self.param("norm_f_bias", nn.initializers.zeros,
                        (self.embed_dim,)))
        hidden = add_norm(hidden, w, b, residual=residual, prenorm=False,
                          residual_in_fp32=self.residual_in_fp32,
                          eps=self.norm_epsilon, rms=self.rms_norm,
                          out_dtype=self.dtype)
        return hidden, mask, ids_restore

    def decode(self, latent, ids_restore, deterministic=True):
        B, n_latent, _ = latent.shape
        L = ids_restore.shape[1]
        has_cls = self.encoder_type == "vim" and self.use_cls_token
        len_keep = n_latent - 1 if has_cls else n_latent
        x = nn.Dense(self.decoder_embed_dim,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=self.dtype, name="decoder_embed")(latent)
        cls_dec = None
        if has_cls:
            # pull the mid-sequence cls out before unshuffling; its
            # decoder pos-embed row is zeros (fastvim_mae.py:614-644)
            tp = (n_latent - 1) // 2
            cls_dec = x[:, tp:tp + 1]
            x = jnp.concatenate([x[:, :tp], x[:, tp + 1:]], axis=1)
        mask_token = self.param(
            "mask_token",
            nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
            (1, 1, self.decoder_embed_dim))
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(x.dtype),
            (B, L - len_keep, self.decoder_embed_dim))
        x = jnp.concatenate([x, mask_tokens], axis=1)
        x = jnp.take_along_axis(x, ids_restore[..., None], axis=1)
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(self.decoder_embed_dim, self.grid))
        x = x + pos[None].astype(x.dtype)
        if has_cls:
            # re-append the cls token at the END of the full sequence
            # (fastvim_mae.py:639-644)
            x = jnp.concatenate([x, cls_dec], axis=1)

        mixer_kwargs = dict(
            use_norm_after_ssm=self.use_norm_after_ssm,
            collapse_method="none",  # plain Vim decoder blocks
            n_layer=self.decoder_depth,
            scan_impl=self.scan_impl,
            # full-length (L=grid²) non-pooled scans — the exposed-scan
            # shape; see the class field's note
            pallas_min_l=self.pallas_min_l,
            layer_fused=self.layer_fused,
            **(self.ssm_cfg or {}),
        )
        residual = None
        dec_cls = (nn.remat(Block, static_argnums=(3,))
                   if self.remat else Block)
        for i in range(self.decoder_depth):
            x, residual = dec_cls(
                dim=self.decoder_embed_dim, layer_idx=i,
                token_size=(self.grid, self.grid),
                mixer_kwargs=mixer_kwargs, rotate_every_block=False,
                rms_norm=self.rms_norm,
                residual_in_fp32=self.residual_in_fp32,
                norm_eps=self.norm_epsilon, dtype=self.dtype,
                name=f"decoder_blocks_{i}",
            )(x, residual, deterministic)

        w = self.param("decoder_norm_weight", nn.initializers.ones,
                       (self.decoder_embed_dim,))
        b = (None if self.rms_norm else
             self.param("decoder_norm_bias", nn.initializers.zeros,
                        (self.decoder_embed_dim,)))
        x = add_norm(x, w, b, residual=residual, prenorm=False,
                     residual_in_fp32=self.residual_in_fp32,
                     eps=self.norm_epsilon, rms=self.rms_norm,
                     out_dtype=self.dtype)
        pred = nn.Dense(self.patch_size**2 * self.channels,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, name="decoder_pred")(x)
        if has_cls:
            pred = pred[:, :-1]  # drop the cls token (fastvim_mae.py:674-678)
        return pred

    def loss(self, imgs, pred, mask):
        target = self.patchify(imgs).astype(jnp.float32)
        pred = pred.astype(jnp.float32)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            # unbiased variance — torch .var() default
            # (models/mae/..._vimdecoder.py:870)
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(per_patch * mask) / jnp.sum(mask)


def _mae_factory(embed_dim, depth, patch_size, encoder_type="fastvim"):
    def factory(img_size=224, **kwargs):
        cfg = dict(img_size=img_size, patch_size=patch_size,
                   embed_dim=embed_dim, depth=depth, decoder_embed_dim=512,
                   decoder_depth=2, rms_norm=True, residual_in_fp32=True,
                   fused_add_norm=True, encoder_type=encoder_type,
                   # the Vim-MAE baseline carries a mid-sequence cls token
                   # (fastvim_mae.py:364,575-581)
                   use_cls_token=encoder_type == "vim")
        cfg.update(kwargs)
        return MaskedAutoencoderVim(**cfg)
    return factory


MAE_MODELS = {
    "mae_FastVim_base_dec512d2b": _mae_factory(768, 24, 16),
    "mae_FastVim_large_dec512d2b": _mae_factory(1024, 48, 16),
    "mae_FastVim_huge_dec512d2b": _mae_factory(1280, 64, 14),
    "mae_FastVim_tiny_dec512d2b": _mae_factory(192, 24, 16),
    "mae_FastVim_small_dec512d2b": _mae_factory(384, 24, 16),
    # Vim-MAE baselines (models/mae/fastvim_mae.py:713-767)
    "mae_vim_base_dec512d2b": _mae_factory(768, 24, 16, "vim"),
    "mae_vim_large_dec512d2b": _mae_factory(1024, 48, 16, "vim"),
    "mae_vim_huge_dec512d2b": _mae_factory(1280, 64, 14, "vim"),
}
