"""Optimizers: AdamW with decay/no-decay groups, alternate-layer LR decay,
EMA.

TPU-native port of the reference optimizer plumbing:

* decay/no-decay split — no weight decay for biases/1-D params
  (`imagenet_classification/utils.py:52-69`) and the SSM's
  ``A_log``/``D``/``dt_proj_bias``/``pos_embed`` no-decay set
  (`mamba_simple_faster.py:140-144,173`, seg config :47-57).
* alternate-layer layer-wise LR decay for Vim — pairs of Mamba layers
  share a decay power since Vim has 2× ViT depth
  (`mae/lr_decay.py:17-26`).
* EMA of parameters (timm ModelEmaV2 semantics:
  ema ← d·ema + (1−d)·p, updated per step,
  `imagenet_classification/supervised_imagenet.py:52-57,145-147`).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = re.compile(
    r"(pos_embed|A_log|A_b_log|\bD\b|D_b|dt_proj_bias|dt_proj_b_bias|"
    r"mask_token|channel_embed|gamma)")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def wd_mask(params) -> Any:
    """True where weight decay applies: ndim>1 and not in the no-decay set."""

    def mask_leaf(path, leaf):
        name = _path_str(path)
        if leaf.ndim <= 1:
            return False
        if NO_DECAY_NAMES.search(name):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def layer_id_from_path(name: str, num_layers: int) -> int:
    """BEiT-style layer id (mae/lr_decay.py:66-80): embeddings/patch → 0,
    layers_i → i+1, everything else (head, final norm) → num_layers."""
    if "pos_embed" in name or "cls_token" in name:
        return 0
    if name.startswith("patch_embed") or "/patch_embed" in name:
        return 0
    m = re.search(r"layers_(\d+)", name)
    if m:
        return int(m.group(1)) + 1
    return num_layers


def layer_decay_scales(params, layer_decay: float, depth: int) -> Any:
    """Per-leaf LR scale pytree with the *alternate-layer* rule
    (mae/lr_decay.py:20-26): scale(layer k) = decay^((N-k)//2 + (N-k)%2)
    where N = depth+1, so consecutive Mamba layer pairs share a power."""
    num_layers = depth + 1

    def scale_for(k: int) -> float:
        n = num_layers - k
        return layer_decay ** (n // 2 + n % 2)

    def leaf_scale(path, leaf):
        return scale_for(layer_id_from_path(_path_str(path), num_layers))

    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def vitdet_layer_decay_scales(params, decay_rate: float,
                              num_layers: int) -> Any:
    """Per-leaf LR scale pytree with the ViTDet rule
    (detection/vitdet/layer_decay_optimizer_constructor.py:12-108):
    layer ids are patch_embed/pos_embed → 0, backbone block i → i+1,
    everything outside the backbone (neck, rpn, heads) →
    num_layers + 1; scale = decay^(num_layers + 1 - layer_id).
    Distinct from the MAE alternate-layer rule (layer_decay_scales):
    every backbone layer gets its own decay power."""

    def leaf_scale(path, leaf):
        name = _path_str(path)
        if "backbone" in name:
            if "pos_embed" in name or "cls_token" in name or \
                    "patch_embed" in name:
                lid = 0
            else:
                m = re.search(r"layers_(\d+)", name)
                lid = int(m.group(1)) + 1 if m else num_layers + 1
        else:
            lid = num_layers + 1
        return decay_rate ** (num_layers + 1 - lid)

    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def scale_by_leaf(scales) -> optax.GradientTransformation:
    """Multiply updates by a static per-leaf scale pytree."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        out = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return out, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr_schedule: Callable,
    weight_decay: float = 0.05,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    params=None,
    layer_decay: Optional[float] = None,
    depth: Optional[int] = None,
    grad_clip: Optional[float] = None,
    wd_schedule: Optional[Callable] = None,
    accum_steps: int = 1,
    layer_scales: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with the reference's grouping rules.

    params is required (to build masks/scales). wd_schedule (cells: both LR
    and WD cosine-scheduled, cell_imaging/supervised.py:117-120) overrides
    the constant weight_decay.
    """
    assert params is not None
    mask = wd_mask(params)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if wd_schedule is not None:
        def wd_tx(weight_decay):
            return optax.add_decayed_weights(weight_decay, mask=mask)

        chain.append(optax.inject_hyperparams(wd_tx)(
            weight_decay=wd_schedule))
    else:
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if layer_scales is not None:
        # pre-built per-leaf scales (e.g. the ViTDet rule,
        # vitdet_layer_decay_scales)
        chain.append(scale_by_leaf(layer_scales))
    elif layer_decay is not None:
        assert depth is not None
        chain.append(scale_by_leaf(
            layer_decay_scales(params, layer_decay, depth)))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_sgd(lr_schedule: Callable, momentum: float = 0.9,
             weight_decay: float = 0.0) -> optax.GradientTransformation:
    """SGD+momentum for the MAE linear probe (mae/linear_imagenet.py:219-236)."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(lr_schedule, momentum=momentum))
    return optax.chain(*chain)


def make_lars(lr_schedule: Callable, momentum: float = 0.9,
              weight_decay: float = 0.0) -> optax.GradientTransformation:
    """LARS — the reference ships it for the linear probe but leaves it
    commented out (mae/lars.py, linear_imagenet.py)."""
    return optax.lars(lr_schedule, weight_decay=weight_decay,
                      momentum=momentum)


def ema_update(ema_params, params, decay: float = 0.9999):
    """One EMA step (timm ModelEmaV2: ema ← d·ema + (1−d)·p)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        ema_params, params)
