"""HF-format Mamba LM checkpoint loading (last SURVEY LM row).

TPU-native counterpart of `mamba-1p1p1/mamba_ssm/utils/hf.py` +
`MambaLMHeadModel.from_pretrained` (mixer_seq_simple.py:250-258): read
``config.json`` + ``pytorch_model.bin`` from a local HF-format directory
and build a :class:`fastvim_tpu.models.lm.MambaLMHeadModel` with converted
flax params. This environment has no network, so unlike the reference's
``cached_file`` hub download, only local directories are accepted (a
downloaded HF snapshot dir works as-is).

Reference param naming (mixer_seq_simple.py:84-228):
  backbone.embedding.weight                  → embedding/embedding
  backbone.layers.{i}.norm.weight            → norm_{i}_weight
  backbone.layers.{i}.mixer.in_proj.weight   → layers_{i}/in_proj/kernel (.T)
  …mixer.conv1d.weight (d,1,w)               → layers_{i}/conv1d_weight (w,d)
  …mixer.x_proj/dt_proj.weight               → …_weight (.T)
  …mixer.A_log / D / dt_proj.bias            → A_log / D / dt_proj_bias
  …mixer.out_proj.weight                     → layers_{i}/out_proj/kernel (.T)
  backbone.norm_f.weight                     → norm_f_weight
  lm_head.weight — tied to the embedding (tie_weights, :227-229); dropped.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def load_config_hf(path: str) -> dict:
    """Read ``config.json`` from a local HF checkpoint directory."""
    cfg = os.path.join(path, "config.json")
    if not os.path.isfile(cfg):
        raise FileNotFoundError(
            f"no config.json under {path!r} — pass a local HF snapshot "
            "directory (this environment has no hub access)")
    with open(cfg) as f:
        return json.load(f)


def load_state_dict_hf(path: str) -> Dict[str, np.ndarray]:
    """Read weights from a local HF checkpoint dir as numpy arrays.

    Accepts ``pytorch_model.bin`` (torch.load) or ``model.safetensors``.
    """
    bin_path = os.path.join(path, "pytorch_model.bin")
    st_path = os.path.join(path, "model.safetensors")
    if os.path.isfile(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.detach().float().numpy() for k, v in sd.items()}
    if os.path.isfile(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    raise FileNotFoundError(
        f"no pytorch_model.bin or model.safetensors under {path!r}")


def convert_lm(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference MambaLMHeadModel state_dict → flax params for
    :class:`fastvim_tpu.models.lm.MambaLMHeadModel`."""

    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    params: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["backbone.embedding.weight"])},
        "norm_f_weight": _np(sd["backbone.norm_f.weight"]),
    }
    idxs = sorted({int(k.split(".")[2]) for k in sd
                   if k.startswith("backbone.layers.")})
    assert idxs == list(range(len(idxs))), f"non-contiguous layers {idxs}"
    for i in idxs:
        pre = f"backbone.layers.{i}.mixer"
        params[f"norm_{i}_weight"] = _np(sd[f"backbone.layers.{i}.norm.weight"])
        layer: Dict[str, Any] = {
            "in_proj": {"kernel": _np(sd[f"{pre}.in_proj.weight"]).T},
            "out_proj": {"kernel": _np(sd[f"{pre}.out_proj.weight"]).T},
            "conv1d_weight": _np(sd[f"{pre}.conv1d.weight"]).squeeze(1).T,
            "conv1d_bias": _np(sd[f"{pre}.conv1d.bias"]),
            "x_proj_weight": _np(sd[f"{pre}.x_proj.weight"]).T,
            "dt_proj_weight": _np(sd[f"{pre}.dt_proj.weight"]).T,
            "dt_proj_bias": _np(sd[f"{pre}.dt_proj.bias"]),
            "A_log": _np(sd[f"{pre}.A_log"]),
            "D": _np(sd[f"{pre}.D"]),
        }
        params[f"layers_{i}"] = layer
    return {"params": params}


def lm_from_pretrained(path: str, dtype=None) -> Tuple[Any, Dict[str, Any]]:
    """Local HF checkpoint dir → (MambaLMHeadModel, flax params).

    Mirrors ``MambaLMHeadModel.from_pretrained`` (mixer_seq_simple.py:
    250-258): config keys d_model/n_layer/vocab_size/ssm_cfg/rms_norm/
    pad_vocab_size_multiple. The checkpoint's embedding rows already
    include vocab padding (the reference pads at construction, :199-202).
    """
    import jax.numpy as jnp

    from fastvim_tpu.models.lm import MambaLMHeadModel

    cfg = load_config_hf(path)
    sd = load_state_dict_hf(path)
    params = convert_lm(sd)
    emb_rows = params["params"]["embedding"]["embedding"].shape[0]
    ssm_cfg = cfg.get("ssm_cfg") or {}
    model = MambaLMHeadModel(
        vocab_size=cfg["vocab_size"],
        d_model=cfg["d_model"],
        n_layer=cfg["n_layer"],
        d_state=int(ssm_cfg.get("d_state", 16)),
        rms_norm=bool(cfg.get("rms_norm", True)),
        norm_eps=float(cfg.get("norm_epsilon", 1e-5)),
        pad_vocab_multiple=int(cfg.get("pad_vocab_size_multiple", 8)),
        dtype=dtype if dtype is not None else jnp.float32,
    )
    assert model.padded_vocab == emb_rows, (
        f"embedding rows {emb_rows} != padded vocab {model.padded_vocab} "
        f"(vocab_size={cfg['vocab_size']}, "
        f"multiple={cfg.get('pad_vocab_size_multiple', 8)})")
    return model, params
