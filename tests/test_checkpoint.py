"""Checkpoint save/restore roundtrip + cross-stage surgery tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models import VisionMamba
from fastvim_tpu.train import TrainState, cosine_with_warmup, make_optimizer
from fastvim_tpu.train.checkpoint import (
    latest_checkpoint,
    load_pretrained_backbone,
    restore_checkpoint,
    save_checkpoint,
)


def make_state(num_classes=5, img=16):
    model = VisionMamba(img_size=img, patch_size=8, depth=2, embed_dim=32,
                        num_classes=num_classes, ssm_cfg=dict(d_state=4))
    x = jnp.zeros((1, img, img, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = make_optimizer(cosine_with_warmup(1e-3, 0, 10, 1),
                        weight_decay=0.01, params=params)
    return model, TrainState.create(params, tx, ema=True)


def test_save_restore_roundtrip(tmp_path):
    model, state = make_state()
    ckpt_dir = str(tmp_path / "ckpt")
    path = save_checkpoint(ckpt_dir, state)
    assert latest_checkpoint(ckpt_dir) == path
    restored = restore_checkpoint(path)
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "ema_params" in restored
    assert int(restored["step"]) == 0


def test_restore_with_relative_path(tmp_path, monkeypatch):
    """Resume must work with a relative --model_save_dir: orbax rejects
    relative paths, so latest_checkpoint/restore_checkpoint abspath them
    (regression: the digits64 campaign resume crashed here)."""
    model, state = make_state()
    monkeypatch.chdir(tmp_path)
    save_checkpoint("ckpt", state)
    path = latest_checkpoint("ckpt")
    assert os.path.isabs(path)
    restored = restore_checkpoint(os.path.relpath(path))
    assert int(restored["step"]) == 0


def test_checkpoint_pruning(tmp_path):
    model, state = make_state()
    ckpt_dir = str(tmp_path / "ckpt")
    for s in range(7):
        save_checkpoint(ckpt_dir, state, step=s, keep=3)
    kept = sorted(os.listdir(ckpt_dir))
    assert len(kept) == 3
    assert kept == ["step_4", "step_5", "step_6"]


def test_load_pretrained_sincos_fill(tmp_path):
    """MAE checkpoints carry NO pos_embed param (fixed sincos, a torch
    buffer in the reference); transfer must synthesize the same sincos
    table into the target's learnable pos_embed instead of leaving its
    random init frozen (mae/models_mamba_faster_mae_vimdecoder.py)."""
    from fastvim_tpu.models.mae import get_2d_sincos_pos_embed

    model, state = make_state(img=16)  # grid 2x2, embed 32
    # simulate an MAE checkpoint: params WITHOUT pos_embed
    params = jax.device_get(state.params)
    del params["params"]["pos_embed"]
    pruned = TrainState.create(
        params, make_optimizer(cosine_with_warmup(1e-3, 0, 10, 1),
                               weight_decay=0.01, params=params))
    path = save_checkpoint(str(tmp_path / "c"), pruned)

    target = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)))
    merged = load_pretrained_backbone(path, target, prefer_ema=False)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["pos_embed"]),
        get_2d_sincos_pos_embed(32, 2)[None].astype(np.float32),
        rtol=1e-6)


def test_load_pretrained_with_pos_embed_resize(tmp_path):
    """MAE→finetune style transfer with grid change 2x2 → 4x4
    (models/fastvim.py:779-817)."""
    model_s, state_s = make_state(img=16)   # grid 2x2
    path = save_checkpoint(str(tmp_path / "c"), state_s)
    model_t = VisionMamba(img_size=32, patch_size=8, depth=2, embed_dim=32,
                          num_classes=7, ssm_cfg=dict(d_state=4))
    xt = jnp.zeros((1, 32, 32, 3))
    target = model_t.init(jax.random.PRNGKey(1), xt)
    merged = load_pretrained_backbone(path, target, prefer_ema=False,
                                      new_grid=(4, 4), old_grid=(2, 2))
    # pos embed was resized to target shape
    assert merged["params"]["pos_embed"].shape == (1, 16, 32)
    # backbone weights came from source
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["layers_0"]["mixer"]["A_log"]),
        np.asarray(state_s.params["params"]["layers_0"]["mixer"]["A_log"]))
    # head (5→7 classes, shape mismatch) kept target init
    assert merged["params"]["head"]["kernel"].shape[1] == 7
    # model still runs
    y = model_t.apply(merged, xt)
    assert y.shape == (1, 7)
