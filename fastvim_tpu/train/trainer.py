"""Task train/eval steps: supervised classification, MAE pretraining,
linear probe — all as jitted pure functions over a device mesh.

TPU-native port of the reference Lightning modules
(`imagenet_classification/supervised_imagenet.py`, `mae/mae_imagenet.py`,
`mae/finetune_imagenet.py`, `mae/linear_imagenet.py`,
`cell_imaging/supervised.py`): mixup/EMA/schedules/metrics live inside one
jit-compiled step; gradients all-reduce implicitly through sharded-batch
SPMD (replacing Lightning DDP); metrics are computed on the global batch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fastvim_tpu.train.mixup import (
    accuracy,
    cross_entropy,
    mixup_cutmix,
    soft_target_cross_entropy,
)
from fastvim_tpu.train.state import TrainState

Array = jax.Array


def make_compressed_grads_fn(loss_fn: Callable, mesh,
                             compress_dtype, batch_spec=None) -> Callable:
    """Gradient all-reduce compression — the TPU-native equivalent of the
    reference's fp16 DDP comm hook (detection/vitdet/
    fp16_compression_hook.py:16-26).

    ``loss_fn(params, batch, rng) -> (loss, aux)``. Returns
    ``grads_fn(params, batch, rng) -> (aux_pmean, grads)``: per-shard
    grads under shard_map (batch pytree sharded over "data" by default;
    ``batch_spec`` overrides per-leaf, e.g. replicated channel-id
    vectors), cast to ``compress_dtype``, pmean'd over ICI, cast back
    for the fp32 update. DP-only — raises on meshes with a non-trivial
    seq axis (the comm hook mirrors DDP, which has no sequence
    parallelism).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if "seq" in mesh.shape and mesh.shape["seq"] > 1:
        raise ValueError(
            "compressed gradient all-reduce implements the DP-only comm "
            "hook; use seq=1 (got seq=%d)" % mesh.shape["seq"])
    if batch_spec is None:
        batch_spec = P("data")

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()), check_vma=False)
    def grads_fn(params, batch, rng):
        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(compress_dtype), grads)
        grads = jax.lax.pmean(grads, "data")
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, params)
        aux = jax.tree_util.tree_map(
            lambda v: jax.lax.pmean(v, "data"), aux)
        return aux, grads

    return grads_fn


def make_supervised_train_step(
    model,
    num_classes: int,
    mixup_config: Optional[Dict[str, Any]] = None,
    label_smoothing: float = 0.1,
    ema_decay: Optional[float] = 0.9999,
    channel_model: bool = False,
    grad_allreduce_dtype: Optional[Any] = None,
    mesh=None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"image": (B,H,W,C), "label": (B,)} (+ "channel_ids" for
    ChannelVim). Mirrors SupervisedModule.training_step
    (supervised_imagenet.py:128-151): mixup → forward → soft-target CE
    (or smoothed CE without mixup) → update → EMA.

    ``grad_allreduce_dtype`` (e.g. jnp.bfloat16): compress the gradient
    all-reduce over the data axis — the TPU-native equivalent of the
    reference's fp16 DDP comm hook (detection/vitdet/
    fp16_compression_hook.py:16-26). Per-shard grads are computed under
    shard_map, cast down, pmean'd over ICI in the compressed dtype, and
    cast back before the (fp32) optimizer update. DP-only (requires
    mesh seq=1).
    """

    def loss_fn(params, images, targets, rng):
        kwargs = {}
        if channel_model and "channel_ids" in targets:
            kwargs["channel_ids"] = targets["channel_ids"]
        logits = model.apply(params, images, deterministic=False,
                             rngs={"dropout": rng}, **kwargs)
        loss = soft_target_cross_entropy(logits, targets["soft"])
        return loss, logits

    grads_sharded = None
    if grad_allreduce_dtype is not None:
        from jax.sharding import PartitionSpec as P

        from fastvim_tpu.parallel.mesh import get_mesh

        mesh_ = mesh if mesh is not None else get_mesh()

        def _batched_loss(params, batch, rng):
            targets = {"soft": batch["soft"]}
            if "channel_ids" in batch:
                targets["channel_ids"] = batch["channel_ids"]
            loss, _ = loss_fn(params, batch["images"], targets, rng)
            return loss, loss

        grads_sharded = make_compressed_grads_fn(
            _batched_loss, mesh_, grad_allreduce_dtype)
        # channel-id vectors are per-batch metadata, replicated
        grads_sharded_chan = make_compressed_grads_fn(
            _batched_loss, mesh_, grad_allreduce_dtype,
            batch_spec={"images": P("data"), "soft": P("data"),
                        "channel_ids": P()}) if channel_model else None

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        rng_mix, rng_drop = jax.random.split(jax.random.fold_in(
            rng, state.step))
        images, labels = batch["image"], batch["label"]
        if mixup_config:
            images, soft = mixup_cutmix(
                rng_mix, images, labels, num_classes,
                smoothing=label_smoothing, **mixup_config)
        else:
            from fastvim_tpu.train.mixup import one_hot_smooth

            soft = one_hot_smooth(labels, num_classes, label_smoothing)
        if grads_sharded is not None:
            b = {"images": images, "soft": soft}
            fn = grads_sharded
            if "channel_ids" in batch and grads_sharded_chan is not None:
                b["channel_ids"] = batch["channel_ids"]
                fn = grads_sharded_chan
            loss, grads = fn(state.params, b, rng_drop)
        else:
            targets = {"soft": soft}
            if "channel_ids" in batch:
                targets["channel_ids"] = batch["channel_ids"]
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, targets,
                                       rng_drop)
        state = state.apply_gradients(grads, ema_decay=ema_decay)
        metrics = {"train_loss": loss,
                   "grad_norm": optax_global_norm(grads)}
        return state, metrics

    return train_step


def optax_global_norm(tree) -> Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def make_supervised_eval_step(model, channel_model: bool = False):
    """eval_step(params, batch) -> metrics (loss, top-1). Used for both raw
    and EMA params (the reference logs val_acc and val_acc_ema,
    supervised_imagenet.py:160-210)."""

    @jax.jit
    def eval_step(params, batch):
        kwargs = {}
        if channel_model and "channel_ids" in batch:
            kwargs["channel_ids"] = batch["channel_ids"]
        logits = model.apply(params, batch["image"], deterministic=True,
                             **kwargs)
        loss = cross_entropy(logits, batch["label"])
        acc = accuracy(logits, batch["label"])
        return {"loss": loss, "acc": acc}

    return eval_step


def make_mae_train_step(model, mask_ratio: float = 0.75,
                        ema_decay: Optional[float] = None) -> Callable:
    """MAE pretraining step (SSLModule.training_step,
    mae/mae_imagenet.py:60-98)."""

    def loss_fn(params, images, rng):
        loss, _, _ = model.apply(params, images, mask_ratio=mask_ratio,
                                 deterministic=False, rngs={"mask": rng})
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        rng_mask = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch["image"], rng_mask)
        state = state.apply_gradients(grads, ema_decay=ema_decay)
        return state, {"train_loss": loss}

    return train_step


def make_linear_probe_step(model, head_apply, num_classes: int):
    """Linear probe: frozen backbone features → BN(affine=False)+Linear
    (mae/linear_imagenet.py:39-53). Backbone runs under stop_gradient."""

    def loss_fn(head_params, feats, labels):
        logits = head_apply(head_params, feats)
        return cross_entropy(logits, labels), logits

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, feats, labels):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, feats, labels)
        state = state.apply_gradients(grads)
        return state, {"train_loss": loss,
                       "train_acc": accuracy(logits, labels)}

    return step
