"""Convert reference (PyTorch FastVim/Vim) state_dicts to flax params.

Enables loading published FastVim checkpoints into the TPU framework and
is the basis of the direct torch-reference logits-parity tests
(tests/test_torch_parity.py). Works on any mapping of array-likes — no
torch import required (pass ``{k: v.numpy() for k, v in sd.items()}``).

Name/shape mapping (reference models/fastvim.py param names → flax tree):

==============================  =======================================
torch (``models/fastvim.py``)   flax (``fastvim_tpu.models``)
==============================  =======================================
patch_embed.proj.weight DCpp    patch_embed/proj/kernel  (p,p,C,D)
pos_embed                       pos_embed
cls_token                       cls_token
layers.{i}.norm.weight          layers_{i}/norm_weight
layers.{i}.mixer.in_proj.weight layers_{i}/mixer/in_proj/kernel (.T)
...mixer.conv1d{_b}.weight d1w  conv1d{_b}_weight (w,d)
...mixer.x_proj{_b}.weight      x_proj{_b}_weight (.T)
...mixer.dt_proj{_b}.weight     dt_proj{_b}_weight (.T)
...mixer.A{_b}_log / D{_b}      A{_b}_log / D{_b}
...mixer.layernorm.weight/bias  layernorm_weight / layernorm_bias
...mixer.out_proj.weight        out_proj/kernel (.T)
norm_f.weight                   norm_f_weight
head.weight / head.bias         head/kernel (.T) / head/bias
==============================  =======================================
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _layer_indices(sd: Mapping[str, Any], stack: str) -> range:
    """Contiguous layer indices of ``{stack}.{i}.…`` keys, validated —
    a gap means a truncated/filtered state_dict (silently converting it
    would fail later inside flax with an opaque scope error)."""
    idxs = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith(stack + ".")})
    if idxs != list(range(len(idxs))):
        missing = sorted(set(range(idxs[-1] + 1)) - set(idxs))
        raise ValueError(
            f"state_dict is missing {stack} indices {missing} — "
            f"truncated or over-filtered checkpoint?")
    return range(len(idxs))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_mixer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Convert one bidirectional mixer's params (``{prefix}.in_proj...``)."""
    out: Dict[str, Any] = {}
    out["in_proj"] = {"kernel": _np(sd[f"{prefix}.in_proj.weight"]).T}
    if f"{prefix}.in_proj.bias" in sd:
        out["in_proj"]["bias"] = _np(sd[f"{prefix}.in_proj.bias"])
    out["out_proj"] = {"kernel": _np(sd[f"{prefix}.out_proj.weight"]).T}
    if f"{prefix}.out_proj.bias" in sd:
        out["out_proj"]["bias"] = _np(sd[f"{prefix}.out_proj.bias"])
    for sfx in ("", "_b"):
        out[f"conv1d{sfx}_weight"] = (
            _np(sd[f"{prefix}.conv1d{sfx}.weight"]).squeeze(1).T)
        if f"{prefix}.conv1d{sfx}.bias" in sd:
            out[f"conv1d{sfx}_bias"] = _np(sd[f"{prefix}.conv1d{sfx}.bias"])
        out[f"x_proj{sfx}_weight"] = _np(sd[f"{prefix}.x_proj{sfx}.weight"]).T
        out[f"dt_proj{sfx}_weight"] = (
            _np(sd[f"{prefix}.dt_proj{sfx}.weight"]).T)
        out[f"dt_proj{sfx}_bias"] = _np(sd[f"{prefix}.dt_proj{sfx}.bias"])
        out[f"A{sfx}_log"] = _np(sd[f"{prefix}.A{sfx}_log"])
        out[f"D{sfx}"] = _np(sd[f"{prefix}.D{sfx}"])
    if f"{prefix}.layernorm.weight" in sd:
        out["layernorm_weight"] = _np(sd[f"{prefix}.layernorm.weight"])
        out["layernorm_bias"] = _np(sd[f"{prefix}.layernorm.bias"])
    if f"{prefix}.gamma" in sd:
        out["gamma"] = _np(sd[f"{prefix}.gamma"])
    return out


def convert_vision_mamba(sd: Mapping[str, Any],
                         strip_prefix: str = "") -> Dict[str, Any]:
    """torch VisionMamba state_dict → flax ``{"params": ...}``.

    Handles FastVim and the Vim baseline (incl. cls_token); per-layer
    RMSNorm (no bias) and LayerNorm (bias) both. ``strip_prefix`` removes
    a leading wrapper prefix (e.g. ``"backbone."`` from Lightning ckpts).
    """
    if strip_prefix:
        sd = {k[len(strip_prefix):]: v for k, v in sd.items()
              if k.startswith(strip_prefix)}
    params: Dict[str, Any] = {}
    _set(params, "patch_embed/proj/kernel",
         _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    _set(params, "patch_embed/proj/bias", _np(sd["patch_embed.proj.bias"]))
    if "pos_embed" in sd:
        params["pos_embed"] = _np(sd["pos_embed"])
    if "cls_token" in sd:
        params["cls_token"] = _np(sd["cls_token"])
    for i in _layer_indices(sd, "layers"):
        layer: Dict[str, Any] = {
            "norm_weight": _np(sd[f"layers.{i}.norm.weight"])}
        if f"layers.{i}.norm.bias" in sd:
            layer["norm_bias"] = _np(sd[f"layers.{i}.norm.bias"])
        layer["mixer"] = convert_mixer(sd, f"layers.{i}.mixer")
        params[f"layers_{i}"] = layer
    params["norm_f_weight"] = _np(sd["norm_f.weight"])
    if "norm_f.bias" in sd:
        params["norm_f_bias"] = _np(sd["norm_f.bias"])
    if "head.weight" in sd:
        params["head"] = {"kernel": _np(sd["head.weight"]).T,
                          "bias": _np(sd["head.bias"])}
    return {"params": params}


def convert_channel_vim(sd: Mapping[str, Any],
                        strip_prefix: str = "") -> Dict[str, Any]:
    """torch ChannelVim state_dict → flax params.

    Reference: models_channel_mamba_faster.py — the per-channel patch
    embed is a shared Conv3d(1, D, (1,p,p)) (:120-125) mapped to the flax
    2-D conv kernel (p,p,1,D), plus the channel-embedding table.
    """
    if strip_prefix:
        sd = {k[len(strip_prefix):]: v for k, v in sd.items()
              if k.startswith(strip_prefix)}
    params: Dict[str, Any] = {}
    w = _np(sd["patch_embed.proj.weight"])  # (D, 1, 1, p, p)
    _set(params, "patch_embed/proj/kernel",
         w.squeeze(1).squeeze(1).transpose(1, 2, 0)[:, :, None, :])
    _set(params, "patch_embed/proj/bias", _np(sd["patch_embed.proj.bias"]))
    _set(params, "patch_embed/channel_embed",
         _np(sd["patch_embed.channel_embed.weight"]))
    if "pos_embed" in sd:
        params["pos_embed"] = _np(sd["pos_embed"])
    for i in _layer_indices(sd, "layers"):
        layer: Dict[str, Any] = {
            "norm_weight": _np(sd[f"layers.{i}.norm.weight"])}
        if f"layers.{i}.norm.bias" in sd:
            layer["norm_bias"] = _np(sd[f"layers.{i}.norm.bias"])
        layer["mixer"] = convert_mixer(sd, f"layers.{i}.mixer")
        params[f"layers_{i}"] = layer
    params["norm_f_weight"] = _np(sd["norm_f.weight"])
    if "norm_f.bias" in sd:
        params["norm_f_bias"] = _np(sd["norm_f.bias"])
    if "head.weight" in sd:
        params["head"] = {"kernel": _np(sd["head.weight"]).T,
                          "bias": _np(sd["head.bias"])}
    return {"params": params}


def export_vision_mamba(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax VisionMamba params → reference torch state_dict arrays (the
    inverse of convert_vision_mamba) — lets models trained here be loaded
    by the PyTorch reference (models/fastvim.py / vim.py). Returns numpy
    arrays; wrap with torch.from_numpy to build a state_dict."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    sd["patch_embed.proj.weight"] = _np(
        p["patch_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = _np(p["patch_embed"]["proj"]["bias"])
    if "pos_embed" in p:
        sd["pos_embed"] = _np(p["pos_embed"])
    if "cls_token" in p:
        sd["cls_token"] = _np(p["cls_token"])
    i = 0
    while f"layers_{i}" in p:
        lp = p[f"layers_{i}"]
        pre = f"layers.{i}"
        sd[f"{pre}.norm.weight"] = _np(lp["norm_weight"])
        if "norm_bias" in lp:
            sd[f"{pre}.norm.bias"] = _np(lp["norm_bias"])
        m = lp["mixer"]
        sd[f"{pre}.mixer.in_proj.weight"] = _np(m["in_proj"]["kernel"]).T
        if "bias" in m["in_proj"]:
            sd[f"{pre}.mixer.in_proj.bias"] = _np(m["in_proj"]["bias"])
        sd[f"{pre}.mixer.out_proj.weight"] = _np(m["out_proj"]["kernel"]).T
        if "bias" in m["out_proj"]:
            sd[f"{pre}.mixer.out_proj.bias"] = _np(m["out_proj"]["bias"])
        for sfx in ("", "_b"):
            sd[f"{pre}.mixer.conv1d{sfx}.weight"] = _np(
                m[f"conv1d{sfx}_weight"]).T[:, None, :]
            if f"conv1d{sfx}_bias" in m:
                sd[f"{pre}.mixer.conv1d{sfx}.bias"] = _np(
                    m[f"conv1d{sfx}_bias"])
            sd[f"{pre}.mixer.x_proj{sfx}.weight"] = _np(
                m[f"x_proj{sfx}_weight"]).T
            sd[f"{pre}.mixer.dt_proj{sfx}.weight"] = _np(
                m[f"dt_proj{sfx}_weight"]).T
            sd[f"{pre}.mixer.dt_proj{sfx}.bias"] = _np(
                m[f"dt_proj{sfx}_bias"])
            sd[f"{pre}.mixer.A{sfx}_log"] = _np(m[f"A{sfx}_log"])
            sd[f"{pre}.mixer.D{sfx}"] = _np(m[f"D{sfx}"])
        if "layernorm_weight" in m:
            sd[f"{pre}.mixer.layernorm.weight"] = _np(m["layernorm_weight"])
            sd[f"{pre}.mixer.layernorm.bias"] = _np(m["layernorm_bias"])
        if "gamma" in m:
            sd[f"{pre}.mixer.gamma"] = _np(m["gamma"])
        i += 1
    sd["norm_f.weight"] = _np(p["norm_f_weight"])
    if "norm_f_bias" in p:
        sd["norm_f.bias"] = _np(p["norm_f_bias"])
    if "head" in p:
        sd["head.weight"] = _np(p["head"]["kernel"]).T
        sd["head.bias"] = _np(p["head"]["bias"])
    return sd


def convert_mae(sd: Mapping[str, Any],
                strip_prefix: str = "") -> Dict[str, Any]:
    """torch MaskedAutoencoderViM state_dict → flax params.

    Reference: models/mae/models_mamba_faster_mae_vimdecoder.py (encoder
    ``layers.{i}`` with masked mixer + plain Vim ``decoder_blocks.{i}``).
    The fixed sin-cos ``pos_embed``/``decoder_pos_embed`` buffers are
    skipped — the flax model recomputes them (parity of the construction
    is covered by tests/test_torch_parity.py).
    """
    if strip_prefix:
        sd = {k[len(strip_prefix):]: v for k, v in sd.items()
              if k.startswith(strip_prefix)}
    params: Dict[str, Any] = {}
    _set(params, "patch_embed/proj/kernel",
         _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    _set(params, "patch_embed/proj/bias", _np(sd["patch_embed.proj.bias"]))
    for stack, out_name in (("layers", "layers"),
                            ("decoder_blocks", "decoder_blocks")):
        for i in _layer_indices(sd, stack):
            layer: Dict[str, Any] = {
                "norm_weight": _np(sd[f"{stack}.{i}.norm.weight"])}
            if f"{stack}.{i}.norm.bias" in sd:
                layer["norm_bias"] = _np(sd[f"{stack}.{i}.norm.bias"])
            layer["mixer"] = convert_mixer(sd, f"{stack}.{i}.mixer")
            params[f"{out_name}_{i}"] = layer
    params["norm_f_weight"] = _np(sd["norm_f.weight"])
    if "norm_f.bias" in sd:
        params["norm_f_bias"] = _np(sd["norm_f.bias"])
    params["decoder_norm_weight"] = _np(sd["decoder_norm.weight"])
    if "decoder_norm.bias" in sd:
        params["decoder_norm_bias"] = _np(sd["decoder_norm.bias"])
    params["mask_token"] = _np(sd["mask_token"])
    params["decoder_embed"] = {
        "kernel": _np(sd["decoder_embed.weight"]).T,
        "bias": _np(sd["decoder_embed.bias"])}
    params["decoder_pred"] = {
        "kernel": _np(sd["decoder_pred.weight"]).T,
        "bias": _np(sd["decoder_pred.bias"])}
    if "cls_token" in sd:
        params["cls_token"] = _np(sd["cls_token"])
    return {"params": params}
