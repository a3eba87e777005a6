"""HISTORICAL round-2 experiment record (results in CLAUDE.md): the
production mixer now uses ops/conv.dual_conv1d + grid_dual_conv1d, so
the monkeypatches below no longer affect the default path — re-point
them at dual_conv1d before re-running variants.

VERDICT r1 #6: attack the 2048px forward bottleneck (sublane-shift
relayouts in the depthwise causal conv) with alternative formulations,
measured END-TO-END on the real chip (device-looped, differenced).

Variants monkeypatch fastvim_tpu.ops.conv.{causal,anticausal}_conv1d:
  shifts   — current production path (4 shifted multiply-adds)
  xlaconv  — lax.conv_general_dilated depthwise convolution
  toeplitz — per-tile banded-matrix matmul (moves the shift work to the
             MXU, which is idle during the elementwise conv)
plus a batch sweep on the best variant.

Run: python benchmarks/conv_variants_tpu.py [--img 2048] [--batch 8]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import fastvim_tpu.ops.conv as convmod
import fastvim_tpu.models.mixer as mixermod
from fastvim_tpu.ops.conv import anticausal_conv1d as anti_shifts
from fastvim_tpu.ops.conv import causal_conv1d as causal_shifts


def causal_xlaconv(x, weight, bias=None, activation="silu"):
    width, d = weight.shape
    y = lax.conv_general_dilated(
        x, weight[:, None, :], window_strides=(1,),
        padding=[(width - 1, 0)], feature_group_count=d,
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias[None, None, :]
    return jax.nn.silu(y) if activation == "silu" else y


def anticausal_xlaconv(x, weight, bias=None, activation="silu"):
    width, d = weight.shape
    y = lax.conv_general_dilated(
        x, weight[::-1, None, :], window_strides=(1,),
        padding=[(0, width - 1)], feature_group_count=d,
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias[None, None, :]
    return jax.nn.silu(y) if activation == "silu" else y


def _toeplitz_band(weight_k, tile, width, anticausal, dtype):
    """(tile+width-1, tile) band matrix for one tap set — built per
    channel-independent tap as scalar; the depthwise structure is kept by
    doing one banded matmul per tap and scaling by the per-channel tap
    weight outside. Returns the 0/1 shift matrix for tap k."""
    m = np.zeros((tile + width - 1, tile), np.float32)
    for t in range(tile):
        m[t + weight_k, t] = 1.0
    return jnp.asarray(m, dtype)


def make_toeplitz(anticausal=False):
    def conv(x, weight, bias=None, activation="silu", tile=512):
        width, d = weight.shape
        B, L, _ = x.shape
        assert L % tile == 0, (L, tile)
        pad = width - 1
        if anticausal:
            xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        else:
            xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        # windows: (B, L/tile, tile+pad, d)
        nt = L // tile
        idx = (jnp.arange(nt)[:, None] * tile
               + jnp.arange(tile + pad)[None, :])
        win = xp[:, idx]                      # (B, nt, tile+pad, d)
        # shift matrices for each tap, combined with per-channel weights:
        # y[t] = sum_k w[k,d] * win[t + k]  (causal order after padding)
        taps = weight if not anticausal else weight[::-1]
        y = None
        for k in range(width):
            sel = _toeplitz_band(k, tile, width, anticausal, x.dtype)
            part = jnp.einsum("bnsd,st->bntd", win, sel,
                              preferred_element_type=jnp.float32)
            part = part.astype(x.dtype) * taps[k][None, None, None, :]
            y = part if y is None else y + part
        y = y.reshape(B, L, d)
        if bias is not None:
            y = y + bias[None, None, :]
        return jax.nn.silu(y) if activation == "silu" else y

    return conv


VARIANTS = {
    "shifts": (causal_shifts, anti_shifts),
    "xlaconv": (causal_xlaconv, anticausal_xlaconv),
    "toeplitz": (make_toeplitz(False), make_toeplitz(True)),
}


def throughput(img, batch, n1=4, n2=12):
    from fastvim_tpu.models import create_model

    model = create_model("fastvim_tiny", img_size=img,
                         dtype=jnp.bfloat16, drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3),
                          jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)

    def looped(n):
        @jax.jit
        def run(params, x):
            def body(i, s):
                out = model.apply(params, x + s)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: float(run(params, x))

    f1, f2 = looped(n1), looped(n2)
    f1(); f2()

    def t(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); f()
            b = min(b, time.perf_counter() - t0)
        return b

    return batch * (n2 - n1) / (t(f2) - t(f1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", default="shifts,xlaconv,toeplitz")
    ap.add_argument("--batch_sweep", default="")
    args = ap.parse_args()

    out = {}
    for name in args.variants.split(","):
        causal, anti = VARIANTS[name]
        convmod.causal_conv1d = causal
        convmod.anticausal_conv1d = anti
        mixermod.causal_conv1d = causal
        mixermod.anticausal_conv1d = anti
        try:
            out[name] = round(throughput(args.img, args.batch), 2)
        except Exception as e:
            out[name] = f"ERR {str(e)[:120]}"
        print(json.dumps({name: out[name]}), flush=True)
    for b in (int(x) for x in args.batch_sweep.split(",") if x):
        convmod.causal_conv1d = causal_shifts
        convmod.anticausal_conv1d = anti_shifts
        mixermod.causal_conv1d = causal_shifts
        mixermod.anticausal_conv1d = anti_shifts
        out[f"shifts_b{b}"] = round(throughput(args.img, b), 2)
        print(json.dumps({f"shifts_b{b}": out[f"shifts_b{b}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
