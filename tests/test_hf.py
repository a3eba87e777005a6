"""HF-format LM checkpoint loading round-trip (SURVEY LM extras, last row).

Creates a local HF snapshot dir (config.json + pytorch_model.bin with the
reference ``mixer_seq_simple`` param naming), loads it with
``fastvim_tpu.utils.hf.lm_from_pretrained``, and checks logits against a
torch oracle assembled from the reference's own primitives
(``selective_scan_ref``, selective_scan_interface.py:126-206, with the
``mamba_inner_ref`` slow-path data flow :177-206 and the fused add+RMSNorm
block structure of mixer_seq_simple.py:84-178).

NOTE the fork's ``mamba_simple.Mamba`` is the *bidirectional vision*
mixer, so the fork's own LM stack is not the semantics of published
state-spaces/mamba-* checkpoints; the oracle here is the original
unidirectional block assembled from the reference's scan/norm functions.
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import torch_ref_harness as harness

CFG = dict(d_model=64, n_layer=3, vocab_size=100,
           rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
           pad_vocab_size_multiple=8,
           ssm_cfg=dict(d_state=8))
D_STATE, D_CONV, EXPAND = 8, 4, 2


def _make_state_dict(seed=31):
    torch.manual_seed(seed)
    d, n_layer = CFG["d_model"], CFG["n_layer"]
    d_inner = EXPAND * d
    dt_rank = -(-d // 16)
    padded_vocab = 104
    sd = {"backbone.embedding.weight": torch.randn(padded_vocab, d) * 0.02,
          "backbone.norm_f.weight": torch.ones(d) + 0.1 * torch.randn(d)}
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        sd[f"{p}.norm.weight"] = torch.ones(d) + 0.1 * torch.randn(d)
        m = f"{p}.mixer"
        sd[f"{m}.in_proj.weight"] = torch.randn(2 * d_inner, d) * 0.05
        sd[f"{m}.conv1d.weight"] = torch.randn(d_inner, 1, D_CONV) * 0.2
        sd[f"{m}.conv1d.bias"] = torch.randn(d_inner) * 0.1
        sd[f"{m}.x_proj.weight"] = (
            torch.randn(dt_rank + 2 * D_STATE, d_inner) * 0.05)
        sd[f"{m}.dt_proj.weight"] = torch.randn(d_inner, dt_rank) * 0.1
        sd[f"{m}.dt_proj.bias"] = torch.randn(d_inner) * 0.5 - 2.0
        sd[f"{m}.A_log"] = torch.log(
            torch.arange(1, D_STATE + 1, dtype=torch.float32
                         ).repeat(d_inner, 1))
        sd[f"{m}.D"] = torch.ones(d_inner)
        sd[f"{m}.out_proj.weight"] = torch.randn(d, d_inner) * 0.05
    sd["lm_head.weight"] = sd["backbone.embedding.weight"]  # tied
    return sd


def _oracle_logits(sd, tokens):
    """Unidirectional Mamba LM forward from the reference's primitives."""
    harness.install_stubs()
    from mamba_ssm.ops.selective_scan_interface import selective_scan_ref
    from mamba_ssm.ops.triton.layernorm import rms_norm_fn

    d, n_layer = CFG["d_model"], CFG["n_layer"]
    d_inner, dt_rank = EXPAND * d, -(-d // 16)
    hidden = F.embedding(tokens, sd["backbone.embedding.weight"])
    residual = None
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        hidden, residual = rms_norm_fn(
            hidden, sd[f"{p}.norm.weight"], None, residual=residual,
            prenorm=True, residual_in_fp32=True, eps=1e-5)
        m = f"{p}.mixer"
        xz = hidden @ sd[f"{m}.in_proj.weight"].T
        x, z = xz.chunk(2, dim=-1)
        x = x.transpose(1, 2)  # (B, d_inner, L)
        L = x.shape[-1]
        x = F.conv1d(x, sd[f"{m}.conv1d.weight"], sd[f"{m}.conv1d.bias"],
                     padding=D_CONV - 1, groups=d_inner)[..., :L]
        x = F.silu(x)
        x_dbl = x.transpose(1, 2) @ sd[f"{m}.x_proj.weight"].T
        dt = x_dbl[..., :dt_rank] @ sd[f"{m}.dt_proj.weight"].T
        B = x_dbl[..., dt_rank:dt_rank + D_STATE].transpose(1, 2)
        C = x_dbl[..., dt_rank + D_STATE:].transpose(1, 2)
        A = -torch.exp(sd[f"{m}.A_log"].float())
        y = selective_scan_ref(
            x, dt.transpose(1, 2), A, B, C, D=sd[f"{m}.D"].float(),
            z=z.transpose(1, 2), delta_bias=sd[f"{m}.dt_proj.bias"].float(),
            delta_softplus=True)
        hidden = y.transpose(1, 2) @ sd[f"{m}.out_proj.weight"].T
    hidden = rms_norm_fn(hidden, sd["backbone.norm_f.weight"], None,
                         residual=residual, prenorm=False,
                         residual_in_fp32=True, eps=1e-5)
    return hidden @ sd["backbone.embedding.weight"].T


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    sd = _make_state_dict()
    d = tmp_path_factory.mktemp("hf_ckpt")
    with open(d / "config.json", "w") as f:
        json.dump(CFG, f)
    torch.save(sd, d / "pytorch_model.bin")
    return d, sd


def test_lm_from_pretrained_logits_parity(hf_dir):
    d, sd = hf_dir
    from fastvim_tpu.utils.hf import lm_from_pretrained

    model, params = lm_from_pretrained(str(d))
    assert model.vocab_size == 100 and model.padded_vocab == 104

    tokens = torch.randint(0, 100, (2, 12))
    with torch.no_grad():
        logits_ref = _oracle_logits(sd, tokens).numpy()
    logits = np.asarray(model.apply(params, jnp.asarray(tokens.numpy())))
    np.testing.assert_allclose(logits[..., :100], logits_ref[..., :100],
                               rtol=1e-5, atol=1e-5)


def test_lm_from_pretrained_missing_dir(tmp_path):
    from fastvim_tpu.utils.hf import load_config_hf

    with pytest.raises(FileNotFoundError):
        load_config_hf(str(tmp_path))
