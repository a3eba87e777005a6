"""Model zoo registry.

Factory functions mirror the reference timm registry entries
(models/fastvim.py:695-967, models/vim.py:641-...) with the same
dims/depths: tiny 192×24, small 384×24, base 768×24, large 1024×48,
huge 1280×64 (patch 14 for huge). Clean short aliases are also
registered (``fastvim_tiny`` etc.).
"""

from __future__ import annotations

from typing import Callable, Dict

from fastvim_tpu.models.vision_mamba import VisionMamba

_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    _REGISTRY[fn.__name__] = fn
    return fn


def register_alias(alias: str, name: str) -> None:
    _REGISTRY[alias] = _REGISTRY[name]


def create_model(name: str, **kwargs) -> VisionMamba:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models():
    return sorted(_REGISTRY)


_COMMON = dict(rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
               final_pool_type="mean", if_abs_pos_embed=True)

_SIZES = {
    "tiny": dict(embed_dim=192, depth=24, patch_size=16),
    "small": dict(embed_dim=384, depth=24, patch_size=16),
    "base": dict(embed_dim=768, depth=24, patch_size=16),
    "large": dict(embed_dim=1024, depth=48, patch_size=16),
    "huge": dict(embed_dim=1280, depth=64, patch_size=14),
}


def _make_factory(size: str, collapse: str):
    cfg = _SIZES[size]

    def factory(img_size=224, **kwargs):
        params = dict(_COMMON, img_size=img_size, **cfg)
        params["collapse_method"] = collapse
        params.update(kwargs)
        return VisionMamba(**params)

    return factory


# FastVim family (pooled scan) — reference registry names
# (models/fastvim.py:695-967).
for _size, _patch in [("tiny", 16), ("small", 16), ("base", 16),
                      ("large", 16), ("huge", 14)]:
    _name = (f"vim_{_size}_patch{_patch}_224_final_pool_mean_"
             "abs_pos_embed_with_noclstok_div2")
    _fn = _make_factory(_size, "mean")
    _fn.__name__ = _name
    register_model(_fn)
    register_alias(f"fastvim_{_size}", _name)

# Vim baselines (full-length scan, no pooling, middle cls token) —
# models/vim.py registry (`…_with_midclstok_div2`, vim.py:641-…).
def _make_vim_factory(size: str):
    cfg = _SIZES[size]

    def factory(img_size=224, **kwargs):
        params = dict(_COMMON, img_size=img_size, **cfg)
        params.update(collapse_method="none", rotate_every_block=False,
                      if_cls_token=True, use_middle_cls_token=True)
        params.update(kwargs)
        return VisionMamba(**params)

    return factory


for _size, _patch in [("tiny", 16), ("small", 16), ("base", 16),
                      ("large", 16), ("huge", 14)]:
    _name = (f"vim_{_size}_patch{_patch}_224_final_pool_mean_"
             "abs_pos_embed_with_midclstok_div2")
    _fn = _make_vim_factory(_size)
    _fn.__name__ = _name
    register_model(_fn)
    register_alias(f"vim_{_size}_midclstok", _name)
    # plain no-cls-token baseline (used for like-for-like speed
    # comparisons and as the seg/det Vim backbone)
    _name2 = (f"vim_{_size}_patch{_patch}_224_baseline_"
              "final_pool_mean_abs_pos_embed_with_noclstok_div2")
    _fn2 = _make_factory(_size, "none")
    _fn2.__name__ = _name2
    register_model(_fn2)
    register_alias(f"vim_{_size}", _name2)


def _register_mae():
    # MAE (FastMaskVim) zoo — clean module path fixing the reference's
    # broken config target (SURVEY.md §2.4 note on fastvim_mae_vimdecoder).
    from fastvim_tpu.models.mae import MAE_MODELS

    for name, fn in MAE_MODELS.items():
        fn.__name__ = name
        register_model(fn)


def _register_channel():
    from fastvim_tpu.models.channel import CHANNEL_MODELS

    for name, fn in CHANNEL_MODELS.items():
        fn.__name__ = name
        register_model(fn)


_register_mae()
_register_channel()
