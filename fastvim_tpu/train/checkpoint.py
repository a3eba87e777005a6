"""Orbax checkpointing: raw + EMA params, opt state, step; cross-stage
weight surgery.

Port of the reference checkpoint semantics (SURVEY.md §5): Lightning
ModelCheckpoint keeps epoch checkpoints with EMA under a parallel key
(`supervised_imagenet.py:107-114` state_dict_ema); cross-stage transfer
strips prefixes and bicubic-resizes the pos-embed (`models/fastvim.py:
779-817` MAE→finetune, :601-643 supervised→det/seg with EMA-first loading
and patch-size mismatch pruning).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None,
                    keep: int = 5) -> str:
    """Save {params, ema_params, opt_state, step} at ckpt_dir/step_N."""
    ocp = _ocp()
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    payload = {"params": state.params, "step": np.asarray(step)}
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    payload["opt_state"] = state.opt_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    if not os.path.isdir(ckpt_dir):
        return
    steps = sorted(
        (int(d.split("_")[1]), d) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit())
    for _, d in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    # abspath: orbax rejects relative paths at restore time, and a relative
    # --model_save_dir otherwise crashes resume (save_checkpoint already
    # abspaths its side).
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        (int(d.split("_")[1]), d) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
        and not d.endswith(".orbax-checkpoint-tmp"))
    if not steps:
        return None
    return os.path.join(ckpt_dir, steps[-1][1])


def restore_checkpoint(path: str, template: Optional[Any] = None):
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def load_pretrained_backbone(
    path: str,
    target_params: Any,
    *,
    prefer_ema: bool = True,
    new_grid=None,
    old_grid=None,
    scanpath_type: str = "rowwise",
    subtree: str = None,
) -> Any:
    """Cross-stage transfer with surgery (models/fastvim.py:601-643,779-817):

    * EMA weights first when available (det/seg load_ema semantics)
    * bicubic pos-embed interpolation between token grids
    * prune mismatched-shape leaves (patch-size changes) keeping the
      target's init for those
    * ``subtree``: graft a standalone-backbone checkpoint under a wrapper
      module (e.g. "backbone" inside CascadeMaskRCNN — the det/seg
      ``cfg.model.backbone.pretrained`` injection, detection/tools/
      train.py:63-68)
    """
    restored = restore_checkpoint(path)
    src = restored.get("ema_params") if prefer_ema else None
    if src is None:
        src = restored.get("params", restored)

    from fastvim_tpu.models.patch_embed import resize_pos_embed

    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    if subtree:
        ins = jax.tree_util.DictKey(subtree)
        flat_s = {(k[0], ins) + tuple(k[1:]): v
                  for k, v in flat_s.items()}

    out = {}
    loaded, skipped, synthesized = 0, 0, 0
    for kpath, tleaf in flat_t.items():
        sleaf = flat_s.get(kpath)
        name = "/".join(str(getattr(k, "key", k)) for k in kpath)
        if sleaf is None:
            # MAE encoders use FIXED sincos position embeddings (a torch
            # buffer in the reference, so it rides state_dict into the
            # finetune/probe model — models_mamba_faster_mae_vimdecoder.py
            # pos_embed requires_grad=False); orbax stores only params, so
            # reproduce the buffer transfer by synthesizing the same table.
            grid = int(round(tleaf.shape[1] ** 0.5)) if tleaf.ndim == 3 \
                else 0
            if name.endswith("pos_embed") and tleaf.ndim == 3 \
                    and grid * grid == tleaf.shape[1]:
                from fastvim_tpu.models.mae import get_2d_sincos_pos_embed
                out[kpath] = jnp.asarray(get_2d_sincos_pos_embed(
                    tleaf.shape[2], grid))[None].astype(tleaf.dtype)
                synthesized += 1
                continue
            out[kpath] = tleaf
            skipped += 1
            continue
        sleaf = jnp.asarray(sleaf)
        if "pos_embed" in name and sleaf.shape != tleaf.shape and new_grid:
            sleaf = resize_pos_embed(sleaf, new_grid, old_grid,
                                     scanpath_type)
        if sleaf.shape != tleaf.shape:
            out[kpath] = tleaf  # patch-size mismatch pruning
            skipped += 1
            continue
        out[kpath] = sleaf.astype(tleaf.dtype)
        loaded += 1
    print(f"load_pretrained_backbone: loaded {loaded}, kept-init {skipped},"
          f" sincos-filled {synthesized}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target_params),
        [out[k] for k, _ in jax.tree_util.tree_flatten_with_path(
            target_params)[0]])
