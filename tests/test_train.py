"""Training harness tests: schedules vs the reference array semantics,
wd masks, layer decay, EMA, mixup, and end-to-end loss decrease on a tiny
model, plus a sharded multi-device data-parallel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.models import VisionMamba
from fastvim_tpu.parallel import make_mesh, shard_batch
from fastvim_tpu.train import (
    TrainState,
    cosine_with_warmup,
    ema_update,
    layer_decay_scales,
    make_mae_train_step,
    make_optimizer,
    make_supervised_eval_step,
    make_supervised_train_step,
    mixup_cutmix,
    scale_lr,
    soft_target_cross_entropy,
    wd_mask,
)


def reference_cosine_array(base, final, total, warmup, winit=0.0):
    """numpy port of cosine_scheduler (utils.py:142-184)."""
    warm = (np.linspace(winit, base, warmup) if warmup > 0
            else np.array([]))
    iters = np.arange(total - warmup)
    sched = final + 0.5 * (base - final) * (
        1 + np.cos(np.pi * iters / len(iters)))
    return np.concatenate([warm, sched])


def test_cosine_schedule_matches_reference_array():
    base, final, total, warmup = 1e-3, 1e-6, 100, 10
    ref = reference_cosine_array(base, final, total, warmup)
    fn = cosine_with_warmup(base, final, total, warmup)
    got = np.array([float(fn(s)) for s in range(total)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-9)


def test_scale_lr_rules():
    assert scale_lr(1e-3, 128, 4, "deit") == pytest.approx(1e-3 * 512 / 512)
    assert scale_lr(1e-3, 128, 8, "linear") == pytest.approx(1e-3 * 4)
    assert scale_lr(1e-3, 256, 4, "sqrt") == pytest.approx(1e-3)


def test_wd_mask_excludes_ssm_params():
    params = {"params": {
        "layers_0": {"mixer": {
            "A_log": jnp.zeros((4, 2)),
            "D": jnp.zeros((4,)),
            "in_proj": {"kernel": jnp.zeros((4, 8))},
            "dt_proj_bias": jnp.zeros((4,)),
        }},
        "pos_embed": jnp.zeros((1, 4, 8)),
        "head": {"kernel": jnp.zeros((8, 10)), "bias": jnp.zeros((10,))},
    }}
    m = wd_mask(params)
    p = m["params"]
    assert p["head"]["kernel"] is True
    assert p["head"]["bias"] is False          # 1-D
    assert p["pos_embed"] is False             # named no-decay
    assert p["layers_0"]["mixer"]["A_log"] is False
    assert p["layers_0"]["mixer"]["in_proj"]["kernel"] is True


def test_layer_decay_alternate_pairs():
    """Adjacent Mamba layer pairs share a decay power (lr_decay.py:17-26)."""
    depth = 4
    params = {"params": {
        "patch_embed": {"k": jnp.zeros((2, 2))},
        **{f"layers_{i}": {"w": jnp.zeros((2, 2))} for i in range(depth)},
        "head": {"k": jnp.zeros((2, 2))},
    }}
    scales = layer_decay_scales(params, 0.5, depth)
    s = scales["params"]
    num_layers = depth + 1
    def expected(k):
        n = num_layers - k
        return 0.5 ** (n // 2 + n % 2)
    assert s["patch_embed"]["k"] == pytest.approx(expected(0))
    for i in range(depth):
        assert s[f"layers_{i}"]["w"] == pytest.approx(expected(i + 1))
    assert s["head"]["k"] == pytest.approx(expected(num_layers))
    # pairing: layer ids (1,2) share a power, (3,4) share the next
    assert s["layers_0"]["w"] == s["layers_1"]["w"]
    assert s["layers_2"]["w"] == s["layers_3"]["w"]
    assert s["layers_0"]["w"] < s["layers_2"]["w"]


def test_ema_update():
    ema = {"w": jnp.ones((2,))}
    params = {"w": jnp.zeros((2,))}
    out = ema_update(ema, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_mixup_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    labels = jnp.array([0, 1, 2, 3])
    mixed, soft = mixup_cutmix(rng, images, labels, 10, smoothing=0.1)
    assert mixed.shape == images.shape
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)


def test_mixup_zero_alpha_finite():
    """beta(0,0) is NaN — a disabled mode (alpha=0) must degrade to the
    other mode (or identity), never poison the batch (regression: the
    digits64 finetune leg NaN'd from step 0 with mixup=cutmix=0)."""
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    labels = jnp.array([0, 1, 2, 3])
    for m_a, c_a in [(0.0, 0.0), (0.0, 1.0), (0.8, 0.0)]:
        mixed, soft = mixup_cutmix(rng, images, labels, 10,
                                   mixup_alpha=m_a, cutmix_alpha=c_a,
                                   smoothing=0.1)
        assert np.isfinite(np.asarray(mixed)).all(), (m_a, c_a)
        assert np.isfinite(np.asarray(soft)).all(), (m_a, c_a)
        np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0,
                                   rtol=1e-5)
    # both-zero degrades to identity images
    mixed, _ = mixup_cutmix(rng, images, labels, 10, mixup_alpha=0.0,
                            cutmix_alpha=0.0, smoothing=0.0)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(images),
                               rtol=1e-6)


def tiny_model():
    return VisionMamba(img_size=16, patch_size=8, depth=2, embed_dim=32,
                       num_classes=5, drop_path_rate=0.0,
                       ssm_cfg=dict(d_state=4))


def test_supervised_training_loss_decreases():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    y = jnp.arange(8) % 5
    params = model.init(jax.random.PRNGKey(2), x)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 50, 5),
                        weight_decay=0.05, params=params)
    state = TrainState.create(params, tx, ema=True)
    step = make_supervised_train_step(model, 5, mixup_config=None,
                                      label_smoothing=0.0, ema_decay=0.99)
    batch = {"image": x, "label": y}
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    # EMA params differ from raw but track them
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.ema_params, state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_eval_step():
    model = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    y = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x)
    eval_step = make_supervised_eval_step(model)
    m = eval_step(params, {"image": x, "label": y})
    assert 0.0 <= float(m["acc"]) <= 1.0


def test_data_parallel_step_on_mesh():
    """Sharded-batch SPMD: one jit step with the batch sharded over an
    8-device data mesh (replaces Lightning DDP, SURVEY.md §2.6)."""
    assert jax.device_count() >= 8
    mesh = make_mesh(data=8, seq=1)
    model = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    y = jnp.arange(16) % 5
    params = model.init(jax.random.PRNGKey(2), x)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 10, 2),
                        weight_decay=0.05, params=params)
    step = make_supervised_train_step(model, 5, mixup_config=None,
                                      ema_decay=None)
    # the train step donates its state (param buffers get consumed):
    # deep-copy params into each fresh state
    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx, ema=False)

    batch = shard_batch({"image": x, "label": y}, mesh)
    state2, metrics = step(fresh_state(), batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train_loss"]))
    # params remain replicated and identical to an unsharded step
    state3, metrics3 = step(fresh_state(), {"image": x, "label": y},
                            jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["train_loss"]),
                               float(metrics3["train_loss"]), rtol=1e-4)


def test_mae_training_step():
    from fastvim_tpu.models.mae import MaskedAutoencoderVim

    model = MaskedAutoencoderVim(img_size=16, patch_size=8, depth=2,
                                 embed_dim=32, decoder_embed_dim=16,
                                 decoder_depth=1, ssm_cfg=dict(d_state=4))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(1),
                         "mask": jax.random.PRNGKey(2)}, x)
    tx = make_optimizer(cosine_with_warmup(1e-3, 0.0, 20, 2),
                        weight_decay=0.05, params=params,
                        betas=(0.9, 0.95))
    state = TrainState.create(params, tx)
    step = make_mae_train_step(model, mask_ratio=0.75)
    losses = []
    for i in range(10):
        state, m = step(state, {"image": x}, jax.random.PRNGKey(3))
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0]


def test_grad_compression_bf16_matches_fp32():
    """bf16 gradient all-reduce flag (the fp16_compression_hook
    equivalent, detection/vitdet/fp16_compression_hook.py:16-26): same
    step on an 8-device data mesh with and without compression yields
    matching loss and near-matching params."""
    assert jax.device_count() >= 8
    mesh = make_mesh(data=8, seq=1)
    model = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
    y = jnp.arange(16) % 5
    params = model.init(jax.random.PRNGKey(2), x)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 10, 0),
                        weight_decay=0.0, params=params)

    def fresh_state():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx, ema=False)

    batch = shard_batch({"image": x, "label": y}, mesh)
    step_fp32 = make_supervised_train_step(model, 5, mixup_config=None,
                                           ema_decay=None)
    step_bf16 = make_supervised_train_step(
        model, 5, mixup_config=None, ema_decay=None,
        grad_allreduce_dtype=jnp.bfloat16, mesh=mesh)
    s32, m32 = step_fp32(fresh_state(), batch, jax.random.PRNGKey(0))
    s16, m16 = step_bf16(fresh_state(), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m32["train_loss"]),
                               float(m16["train_loss"]), rtol=1e-2)
    flat32 = jax.tree_util.tree_leaves(s32.params)
    flat16 = jax.tree_util.tree_leaves(s16.params)
    for a, b in zip(flat32, flat16):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=0.2)


def test_grad_compression_rejects_seq_mesh():
    mesh = make_mesh(data=4, seq=2)
    with pytest.raises(ValueError, match="seq"):
        make_supervised_train_step(tiny_model(), 5,
                                   grad_allreduce_dtype=jnp.bfloat16,
                                   mesh=mesh)
    make_mesh(data=8, seq=1)  # restore the cached mesh for later tests


def test_linear_probe_bn_eval_batch_independent():
    """Probe BN must use running stats at eval (torch BN1d semantics,
    mae/linear_imagenet.py:39-53): per-sample eval logits are identical
    whether evaluated alone or inside a batch."""
    from fastvim_tpu.cli.linear_probe import ProbeHead

    head = ProbeHead(num_classes=3)
    feats = jax.random.normal(jax.random.PRNGKey(0), (32, 8)) * 2.0 + 1.0
    variables = head.init(jax.random.PRNGKey(1), feats)
    # a few train steps to move the running stats off init
    for i in range(5):
        batch = jax.random.normal(jax.random.PRNGKey(i + 2), (16, 8))
        _, upd = head.apply(variables, batch, train=True,
                            mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
    full = head.apply(variables, feats, train=False)
    single = jnp.concatenate([
        head.apply(variables, feats[i:i + 1], train=False)
        for i in range(8)])
    np.testing.assert_allclose(np.asarray(full[:8]), np.asarray(single),
                               rtol=1e-5, atol=1e-5)
    # and running stats actually moved (train used batch stats + EMA)
    rm = variables["batch_stats"]["bn"]["mean"]
    assert float(jnp.abs(rm).max()) > 0.0


def test_grad_compression_channel_model():
    """Channel models shard images/targets over data but REPLICATE the
    per-batch channel-id vector in the compressed all-reduce path."""
    from fastvim_tpu.models.channel import ChannelVisionMamba

    assert jax.device_count() >= 8
    mesh = make_mesh(data=8, seq=1)
    model = ChannelVisionMamba(img_size=16, patch_size=8, depth=2,
                               embed_dim=32, channels=4, num_classes=5,
                               ssm_cfg={"d_state": 4})
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 4))
    y = jnp.arange(16) % 5
    cids = jnp.arange(4)
    params = model.init(jax.random.PRNGKey(2), x, channel_ids=cids)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 10, 0),
                        weight_decay=0.0, params=params)

    def fresh():
        return TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx, ema=False)

    batch = shard_batch({"image": x, "label": y, "channel_ids": cids},
                        mesh)
    step16 = make_supervised_train_step(
        model, 5, mixup_config=None, ema_decay=None, channel_model=True,
        grad_allreduce_dtype=jnp.bfloat16, mesh=mesh)
    step32 = make_supervised_train_step(
        model, 5, mixup_config=None, ema_decay=None, channel_model=True)
    s16, m16 = step16(fresh(), batch, jax.random.PRNGKey(0))
    s32, m32 = step32(fresh(), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m16["train_loss"]),
                               float(m32["train_loss"]), rtol=1e-2)
