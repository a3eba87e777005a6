"""Import the PyTorch reference (/root/reference) on CPU for parity tests.

The reference's slow paths (``use_fast_path=False``) are pure PyTorch
except for three import-time CUDA/Triton deps, stubbed here:

* ``causal_conv1d`` — 10-line depthwise causal conv + SiLU (the semantics
  of the pip package used at mamba_simple_faster.py:8,274-285).
* ``selective_scan_cuda`` / ``causal_conv1d_cuda`` — import-time only;
  raise if actually called. The scan itself is monkeypatched to the
  reference's own pure-torch golden model ``selective_scan_ref``
  (selective_scan_interface.py:126-206).
* ``mamba_ssm.ops.triton.layernorm`` — pure-torch fused add+norm with the
  exact semantics of the triton kernel's reference functions
  (triton/layernorm.py:18-50) incl. prenorm residual_in_fp32.

Plus tiny ``timm`` / ``mmdet`` / ``mmseg`` shims for the model files'
decorator imports. Nothing here is used by the framework — test-only.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"
_installed = False


def _make_module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec probes (e.g.
    # transformers' _is_package_available("timm")) don't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ---- causal_conv1d (pure torch) ----
    def causal_conv1d_fn(x, weight, bias=None, activation=None,
                         seq_idx=None):
        # x: (B, D, L); weight: (D, W)
        d, w = weight.shape
        out = F.conv1d(x, weight.unsqueeze(1), bias, padding=w - 1,
                       groups=d)[..., : x.shape[-1]]
        if activation in ("silu", "swish"):
            out = F.silu(out)
        return out

    def causal_conv1d_update(x, conv_state, weight, bias=None,
                             activation=None):
        conv_state.copy_(torch.roll(conv_state, shifts=-1, dims=-1))
        conv_state[:, :, -1] = x
        out = torch.einsum("bdw,dw->bd", conv_state, weight)
        if bias is not None:
            out = out + bias
        if activation in ("silu", "swish"):
            out = F.silu(out)
        return out

    cc = _make_module("causal_conv1d")
    cc.causal_conv1d_fn = causal_conv1d_fn
    cc.causal_conv1d_update = causal_conv1d_update

    def _raise(*a, **k):
        raise RuntimeError("CUDA kernel stub called in CPU parity test")

    for name in ("causal_conv1d_cuda", "selective_scan_cuda"):
        mod = _make_module(name)
        mod.fwd = mod.bwd = _raise
        mod.causal_conv1d_fwd = mod.causal_conv1d_bwd = _raise

    # ---- triton layernorm (pure torch, ref semantics) ----
    def _norm_fn(x, weight, bias, residual=None, prenorm=False,
                 residual_in_fp32=False, eps=1e-6, rms=False):
        dtype = x.dtype
        xf = x.float()
        if residual is not None:
            xf = xf + residual.float()
        residual_out = xf if residual_in_fp32 else xf.to(dtype)
        wf = weight.float()
        bf = bias.float() if bias is not None else None
        if rms:
            rstd = torch.rsqrt(xf.square().mean(-1, keepdim=True) + eps)
            out = xf * rstd * wf
            if bf is not None:
                out = out + bf
        else:
            out = F.layer_norm(xf, xf.shape[-1:], wf, bf, eps)
        out = out.to(dtype)
        return (out, residual_out) if prenorm else out

    def layer_norm_fn(x, weight, bias, residual=None, prenorm=False,
                      residual_in_fp32=False, eps=1e-6):
        return _norm_fn(x, weight, bias, residual, prenorm,
                        residual_in_fp32, eps, rms=False)

    def rms_norm_fn(x, weight, bias, residual=None, prenorm=False,
                    residual_in_fp32=False, eps=1e-6):
        return _norm_fn(x, weight, bias, residual, prenorm,
                        residual_in_fp32, eps, rms=True)

    class RMSNorm(nn.Module):
        def __init__(self, hidden_size, eps=1e-5, device=None, dtype=None):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(hidden_size))
            self.register_parameter("bias", None)

        def forward(self, x, residual=None, prenorm=False,
                    residual_in_fp32=False):
            return rms_norm_fn(x, self.weight, self.bias, residual=residual,
                               prenorm=prenorm,
                               residual_in_fp32=residual_in_fp32,
                               eps=self.eps)

    # Pre-register the triton leaf modules; the real mamba_ssm package
    # (and its ops/triton __init__s, which are empty) import from disk,
    # then `from mamba_ssm.ops.triton.layernorm import ...` finds these.
    tl_mod = _make_module("mamba_ssm.ops.triton.layernorm")
    tl_mod.layer_norm_fn = layer_norm_fn
    tl_mod.rms_norm_fn = rms_norm_fn
    tl_mod.RMSNorm = RMSNorm

    def selective_state_update(state, x, dt, A, B, C, D=None, z=None,
                               dt_bias=None, dt_softplus=False):
        # Reference semantics: selective_state_update_ref
        # (triton/selective_state_update.py:211).
        if dt_bias is not None:
            dt = dt + dt_bias
        if dt_softplus:
            dt = F.softplus(dt)
        dA = torch.exp(dt.unsqueeze(-1) * A)  # (b, d, n)
        dBx = dt.unsqueeze(-1) * B.unsqueeze(1) * x.unsqueeze(-1)
        state.copy_(state * dA + dBx)
        out = torch.einsum("bdn,bn->bd", state.to(C.dtype), C)
        if D is not None:
            out = out + x * D
        if z is not None:
            out = out * F.silu(z)
        return out.to(x.dtype)

    su_mod = _make_module("mamba_ssm.ops.triton.selective_state_update")
    su_mod.selective_state_update = selective_state_update

    # ---- timm shim ----
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1))
            mask.bernoulli_(keep)
            return x * mask / keep

    def to_2tuple(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a * std, b * std)
        return t

    def lecun_normal_(t):
        fan_in = t.shape[1] * (t[0][0].numel() if t.ndim > 2 else 1)
        return trunc_normal_(t, std=(1.0 / fan_in) ** 0.5)

    timm = _make_module("timm")
    tl = _make_module("timm.layers")
    tl.DropPath, tl.to_2tuple = DropPath, to_2tuple
    tl.trunc_normal_, tl.lecun_normal_ = trunc_normal_, lecun_normal_
    tm = _make_module("timm.models")
    tm.register_model = lambda fn: fn
    tv = _make_module("timm.models.vision_transformer")
    tv._cfg = lambda **kw: dict(kw)
    tv._load_weights = _raise
    timm.layers, timm.models = tl, tm
    tm.vision_transformer = tv

    # ---- mm registries ----
    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    mmdet = _make_module("mmdet")
    mmdet_reg = _make_module("mmdet.registry")
    mmdet_reg.MODELS = _Registry()
    mmdet.registry = mmdet_reg
    mmseg = _make_module("mmseg")
    mmseg_models = _make_module("mmseg.models")
    mmseg_builder = _make_module("mmseg.models.builder")
    mmseg_builder.BACKBONES = _Registry()
    mmseg_models.builder = mmseg_builder
    mmseg.models = mmseg_models

    for p in (f"{REF_ROOT}/mamba-1p1p1", REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)

    # Route every scan through the reference's own pure-torch golden model.
    import mamba_ssm.ops.selective_scan_interface as ssi

    ssi.selective_scan_fn = ssi.selective_scan_ref
    import mamba_ssm.modules.mamba_simple as ms

    ms.selective_scan_fn = ssi.selective_scan_ref
    # The vision fork dropped the stock ``Block`` from mamba_simple.py
    # (mixer_seq_simple.py:12 still imports it); the identical class
    # survives in mamba_simple_channel_faster.py:411 — reattach it so the
    # LM stack (MambaLMHeadModel) is importable for parity tests.
    if not hasattr(ms, "Block"):
        import mamba_ssm.modules.mamba_simple_channel_faster as mscf

        ms.Block = mscf.Block
    _installed = True


def load_ref_fastvim():
    install_stubs()
    import models.fastvim as ref_fastvim

    return ref_fastvim


def load_ref_vim():
    install_stubs()
    import models.vim as ref_vim

    return ref_vim


def load_ref_mae():
    install_stubs()
    import models.mae.models_mamba_faster_mae_vimdecoder as ref_mae

    return ref_mae


def load_ref_channel():
    install_stubs()
    import models.channel_wise_tokenization.models_channel_mamba_faster as m

    return m


def load_ref_channel_2dcompress():
    install_stubs()
    import models.channel_wise_tokenization.\
        models_channel_mamba_faster_2dcompress as m

    return m


def load_ref_channel_baseline():
    install_stubs()
    import models.channel_wise_tokenization.models_channel_mamba as m

    return m


def load_ref_vim_mae():
    install_stubs()
    import models.mae.fastvim_mae as m

    return m
