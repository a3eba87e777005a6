"""Gradient parity vs the actual PyTorch reference (VERDICT r2 missing #1).

The logits-parity suite (tests/test_torch_parity.py) runs forward-only
under ``torch.no_grad()``; these lock the *training dynamics*: same
weights (via the converter), same input, same loss — ``loss.backward()``
through the reference's differentiable slow path
(mamba_simple_faster.py:269-453 + selective_scan_ref,
selective_scan_interface.py:126-206) on CPU fp32 vs ``jax.grad``, asserting
every parameter gradient matches.

The converter (`fastvim_tpu.utils.torch_convert`) is a pure per-tensor
reshape/transpose map, so applying it to a state_dict-shaped mapping of
torch ``.grad`` tensors yields the flax-layout gradient tree directly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import torch_ref_harness as harness
from fastvim_tpu.models import VisionMamba
from fastvim_tpu.utils.torch_convert import (
    convert_channel_vim,
    convert_mae,
    convert_vision_mamba,
)


def _grad_sd(model) -> dict:
    """state_dict-shaped mapping of parameter gradients (numpy)."""
    return {name: p.grad.detach().numpy()
            for name, p in model.named_parameters()
            if p.grad is not None}


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _assert_grads_match(g_torch_tree, g_jax_tree, rtol=2e-4, atol=2e-5):
    gt = _flatten(g_torch_tree)
    gj = _flatten(g_jax_tree)
    assert set(gt) == set(gj), (
        f"param-grad key mismatch:\n only torch: {sorted(set(gt)-set(gj))}"
        f"\n only jax: {sorted(set(gj)-set(gt))}")
    for k in sorted(gt):
        a, b = gj[k], gt[k]
        assert a.shape == b.shape, (k, a.shape, b.shape)
        # mixed abs/rel tolerance scaled to the gradient's own magnitude
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol * scale,
            err_msg=f"gradient mismatch at {k}")


COMMON = dict(img_size=32, patch_size=16, depth=4, embed_dim=64,
              num_classes=10, drop_path_rate=0.0)


@pytest.mark.parametrize("collapse", ["mean", "none"])
def test_fastvim_grad_parity(collapse):
    """FastVim (pooled mean) and the Vim baseline (collapse 'none'):
    cross-entropy grads through patch-embed, all 4 bidirectional mixers
    (conv bwd, scan VJP, pooled broadcast/sum-fold of dout, dt/A/D grads),
    norms and head."""
    ref = harness.load_ref_fastvim()
    torch.manual_seed(20)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", if_abs_pos_embed=True,
        collapse_method=collapse if collapse != "none" else "mean",
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    if collapse == "none":
        # the reference's non-pooled baseline lives in models/vim.py
        ref_vim = harness.load_ref_vim()
        torch.manual_seed(20)
        m_ref = ref_vim.VisionMamba(
            rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
            final_pool_type="mean", if_abs_pos_embed=True,
            if_cls_token=True, use_middle_cls_token=True,
            ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    m_ref.eval()  # no dropout/drop-path; grads still flow

    x = torch.randn(2, 3, 32, 32)
    labels = torch.tensor([3, 7])
    logits = m_ref(x)
    loss = F.cross_entropy(logits, labels)
    m_ref.zero_grad()
    loss.backward()
    g_ref = convert_vision_mamba(_grad_sd(m_ref))

    params = convert_vision_mamba(m_ref.state_dict())
    if collapse == "none":
        mine = VisionMamba(collapse_method="none", rotate_every_block=False,
                           if_cls_token=True, use_middle_cls_token=True,
                           ssm_cfg=dict(d_state=8), **COMMON)
    else:
        mine = VisionMamba(collapse_method=collapse,
                           ssm_cfg=dict(d_state=8), **COMMON)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    yj = jnp.asarray(labels.numpy())

    def loss_fn(p):
        lg = mine.apply(p, xj)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, yj[:, None], 1))

    lj, g_jax = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    assert abs(float(lj) - float(loss)) < 1e-5
    _assert_grads_match(g_ref, g_jax)


def test_mae_grad_parity():
    """FastMaskVim: grads of the MAE loss through the masked scatter-pool
    mixer (constant-divisor pool backward, per-token gather transpose),
    decoder and norm-pix loss — identical masking noise both sides."""
    ref = harness.load_ref_mae()
    import fastvim_tpu.models.mae as mae_mod

    torch.manual_seed(21)
    m_ref = ref.MaskedAutoencoderViM(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False))
    m_ref.eval()
    B, L = 2, 16
    noise = np.random.RandomState(22).rand(B, L).astype(np.float32)
    x = torch.randn(B, 3, 64, 64)
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.from_numpy(noise)
    try:
        loss_ref, _, _ = m_ref(x, mask_ratio=0.75)
    finally:
        torch.rand = orig_rand
    m_ref.zero_grad()
    loss_ref.backward()
    g_ref = convert_mae(_grad_sd(m_ref))

    params = convert_mae(m_ref.state_dict())
    mine = mae_mod.MaskedAutoencoderVim(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, ssm_cfg=dict(d_state=8))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    orig_mask = mae_mod.sorted_random_masking
    mae_mod.sorted_random_masking = (
        lambda r, b, L_, k: orig_mask(r, b, L_, k, noise=jnp.asarray(noise)))
    try:
        def loss_fn(p):
            loss, _, _ = mine.apply(p, xj, 0.75,
                                    rngs={"mask": jax.random.PRNGKey(0)})
            return loss

        lj, g_jax = jax.value_and_grad(loss_fn)(
            jax.tree.map(jnp.asarray, params))
    finally:
        mae_mod.sorted_random_masking = orig_mask
    assert abs(float(lj) - float(loss_ref)) < 1e-5
    _assert_grads_match(g_ref, g_jax)


def test_channelvim_grad_parity():
    """FastChannelVim (Channel-First): CE grads through the per-channel
    patch embed (shared Conv3d ↔ flax conv kernel map), channel embedding
    table and the channel-aware pooled mixers."""
    ref = harness.load_ref_channel()
    from fastvim_tpu.models.channel import ChannelVisionMamba

    CH = dict(img_size=32, patch_size=16, depth=4, embed_dim=64,
              channels=5, num_classes=7)
    torch.manual_seed(23)
    m_ref = ref.VisionMamba(
        drop_path_rate=0.0, rms_norm=True, residual_in_fp32=True,
        fused_add_norm=True, final_pool_type="mean",
        scan_order="Channel-First", hcs=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **CH)
    m_ref.eval()
    x = torch.randn(2, 5, 32, 32)
    labels = torch.tensor([1, 6])
    logits = m_ref(x)
    loss = F.cross_entropy(logits, labels)
    m_ref.zero_grad()
    loss.backward()
    g_ref = convert_channel_vim(_grad_sd(m_ref))

    params = convert_channel_vim(m_ref.state_dict())
    mine = ChannelVisionMamba(scan_order="Channel-First",
                              ssm_cfg=dict(d_state=8), **CH)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    yj = jnp.asarray(labels.numpy())

    def loss_fn(p):
        lg = mine.apply(p, xj)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, yj[:, None], 1))

    lj, g_jax = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    assert abs(float(lj) - float(loss)) < 1e-5
    _assert_grads_match(g_ref, g_jax)
