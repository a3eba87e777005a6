"""Bidirectional (FastVim/Vim) Mamba mixer, TPU-native.

One composable module subsumes the reference's four mixer copies
(`mamba_simple.py`, `mamba_simple_faster.py`, and — via the masked/channel
subclasses elsewhere — the MAE and ChannelVim variants):

* ``collapse_method="mean"|"max"``: FastVim pooled scan — conv output is
  pooled along the fast (col) axis before the scan, scan runs over rows
  only, output is broadcast back and per-token fidelity restored through
  the ``D·conv_out`` skip term (mamba_simple_faster.py:287-305, 356-358).
* ``collapse_method="none"``: plain Vim — full-length scan (the
  ``pool_factor==1`` degenerate case; same math since ``y + D·u`` commutes
  with no pooling), matching `mamba_simple.py:211-255`.

Layout is channels-last (batch, L, d); scan math fp32; GEMMs run in the
module ``dtype`` (bf16 on TPU feeds the MXU).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.models.layers import (
    a_log_init,
    dt_bias_init,
    dt_proj_kernel_init,
    torch_linear_init,
)
from fastvim_tpu.ops import causal_conv1d, layer_norm, selective_scan
from fastvim_tpu.ops.conv import (
    anticausal_conv1d,
    causal_conv1d_update,
    channel_grid_dual_conv1d,
    dual_conv1d,
    grid_dual_conv1d,
)
from fastvim_tpu.ops.state_update import selective_state_update
from fastvim_tpu.ops.scan import _prod, broadcast_grid, pool_grid

Array = jax.Array


class SplitDense(nn.Module):
    """Dense whose output is returned pre-split into two halves, computed
    as two dot_generals against halves of ONE (in, 2*out) kernel.

    Same math and the same param tree as ``nn.Dense(2*half)`` followed by
    a slice — but the round-3 HLO byte model showed the post-GEMM slice
    materializing a second full-length copy of the first half
    ((B,L,d_inner) per layer, 906 MB per 2048px b3 forward); two dots
    write each half exactly once. The kernel slice is on the tiny weight.
    """

    half: int
    use_bias: bool
    kernel_init: Any
    dtype: Any

    @nn.compact
    def __call__(self, x: Array):
        k = self.param("kernel", self.kernel_init,
                       (x.shape[-1], 2 * self.half))
        k = k.astype(self.dtype)
        a = jnp.dot(x, k[:, :self.half])
        b = jnp.dot(x, k[:, self.half:])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (2 * self.half,)).astype(self.dtype)
            a = a + bias[None, None, :self.half]
            b = b + bias[None, None, self.half:]
        return a, b


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's parameters (same names, shapes, init
    RNG path) without computing the matmul — the fused-layer path
    (ops/pallas/layer_fused.py) consumes the raw kernel/bias inside its
    kernels while staying checkpoint-compatible with the XLA path's
    nn.Dense modules."""

    features: int
    use_bias: bool
    kernel_init: Any

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init,
                       (in_features, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class MambaMixer(nn.Module):
    """Bidirectional selective-scan token mixer.

    Parameters mirror `mamba_simple_faster.Mamba.__init__`
    (mamba_simple_faster.py:27-68); `n_layer` feeds the GPT-2 out_proj
    rescale (models/fastvim.py:309-324).
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Any = "auto"
    dt_min: float = 1e-3
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    use_norm_after_ssm: bool = True
    init_layer_scale: Optional[float] = None
    collapse_method: str = "mean"  # "mean" | "max" | "none"
    scaling_factor: float = 1.0
    n_layer: int = 24
    norm_eps: float = 1e-5
    scan_impl: str = "auto"
    # "auto" Pallas threshold override (TPU only; None → 512). The
    # channel family sets 64: its pooled scans are fully exposed and
    # Pallas measured 5.3x faster there (benchmarks/channel_scan_ab_tpu.py);
    # dense pooled scans overlap XLA streams and must stay assoc.
    pallas_min_l: Optional[int] = None
    # Fused Pallas block kernels: "never" (default — the XLA-fused path
    # currently measures faster end-to-end; see CLAUDE.md), "auto"
    # (enable on TPU where shapes allow), "always" (force, interpret off
    # TPU — used by tests).
    fused_kernels: str = "never"
    # Full-layer two-pass megakernel (ops/pallas/layer_fused.py), the
    # 2.3x @2048 production path: "auto" (default — TPU-only, where the
    # grid is `fusable`), "on" (force; interpret off TPU), "off".
    # The FASTVIM_LAYER_FUSED env var is an experiment-time OVERRIDE
    # only (takes precedence when set); production dispatch lives here,
    # like `pallas_min_l` (VERDICT r3 weak #1).
    layer_fused: str = "auto"
    # Megakernel backward: "fused" adjoint kernels (2.0x train win
    # @2048) | "remat" jax.vjp of the pure-JAX reference (fit lever).
    # FASTVIM_LF_BWD env overrides.
    layer_fused_bwd: str = "fused"
    dtype: Any = jnp.float32

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def dt_rank_(self) -> int:
        if self.dt_rank == "auto":
            return -(-self.d_model // 16)
        return int(self.dt_rank)

    def _dir_params(self, suffix: str):
        d_inner, n, r = self.d_inner, self.d_state, self.dt_rank_
        conv_w = self.param(f"conv1d{suffix}_weight",
                            torch_linear_init(self.d_conv),
                            (self.d_conv, d_inner))
        conv_b = (self.param(f"conv1d{suffix}_bias",
                             torch_linear_init(self.d_conv), (d_inner,))
                  if self.conv_bias else None)
        x_proj_w = self.param(f"x_proj{suffix}_weight",
                              torch_linear_init(d_inner),
                              (d_inner, r + 2 * n))
        dt_w = self.param(f"dt_proj{suffix}_weight",
                          dt_proj_kernel_init(r, self.dt_scale, self.dt_init),
                          (r, d_inner))
        dt_b = self.param(f"dt_proj{suffix}_bias",
                          dt_bias_init(self.dt_min, self.dt_max,
                                       self.dt_init_floor), (d_inner,))
        A_log = self.param(f"A{suffix}_log", a_log_init(n), (d_inner, n))
        Dp = self.param(f"D{suffix}", nn.initializers.ones, (d_inner,))
        return conv_w, conv_b, x_proj_w, dt_w, dt_b, A_log, Dp

    def _use_fused(self, grid_shape, pool_axes, row_onehot) -> bool:
        """Fused Pallas block kernels: dense 2-D pooled path on TPU (or
        forced), with Mosaic's 8-alignment satisfied. Modes: "never",
        "auto"/"always" (both kernels), "merge" (XLA conv+pool, Pallas
        merge — the measured-fastest hybrid)."""
        if self.fused_kernels == "never" or row_onehot is not None:
            return False
        if self.collapse_method not in ("mean", "max"):
            return False
        if len(grid_shape) != 2 or tuple(pool_axes) != (1,):
            return False
        from fastvim_tpu.ops.pallas.fused_block import fusable

        rows, cols = grid_shape
        if not fusable(rows, cols, self.d_inner):
            return False
        if self.fused_kernels in ("always", "merge"):
            return True
        return jax.default_backend() == "tpu"

    def _fused_forward(self, xin: Array, z: Array, fwd, bwd, grid_shape,
                       ln_w, ln_b) -> Array:
        """conv+pool and broadcast+skip+merge+LN+gate as fused Pallas
        kernels; projections and the tiny row scans stay in XLA. In
        "merge" mode the conv+pool stage runs in XLA (conv_pool_ref) and
        only the merge kernel is Pallas."""
        from fastvim_tpu.ops.pallas.fused_block import (
            conv_pool,
            conv_pool_ref,
            merge_gate,
        )

        rows, cols = grid_shape
        d_inner = self.d_inner
        interpret = jax.default_backend() != "tpu"
        wf, bf_, *_ = fwd[:2]
        wb, bb_, *_ = bwd[:2]
        zeros = jnp.zeros((d_inner,), jnp.float32)
        bf_ = zeros if bf_ is None else bf_
        bb_ = zeros if bb_ is None else bb_
        if self.fused_kernels == "merge":
            pf, pb = conv_pool_ref(xin, fwd[0], bf_, bwd[0], bb_, rows,
                                   cols, self.collapse_method,
                                   self.scaling_factor)
        else:
            pf, pb = conv_pool(xin, fwd[0], bf_, bwd[0], bb_, rows, cols,
                               self.collapse_method, self.scaling_factor,
                               interpret)
        y_f = self._proj_scan(pf, fwd, scan_reverse=False)
        y_b = self._proj_scan(pb, bwd, scan_reverse=True)
        lw = jnp.ones((d_inner,), jnp.float32) if ln_w is None else ln_w
        lb = jnp.zeros((d_inner,), jnp.float32) if ln_b is None else ln_b
        return merge_gate(
            xin, z, y_f.astype(jnp.float32), y_b.astype(jnp.float32),
            fwd[0], bf_, bwd[0], bb_, fwd[6], bwd[6], lw, lb, rows, cols,
            self.norm_eps, self.use_norm_after_ssm, interpret)

    def _proj_scan(self, xp: Array, params, scan_reverse: bool) -> Array:
        """x_proj → dt/B/C → dt_proj → selective scan on a (compressed)
        sequence; pointwise projections commute with scan direction."""
        import os

        if "noscan" in os.environ.get("FASTVIM_COMPONENT_ABLATE", ""):
            return xp  # ablation only (benchmarks/component_cost_tpu.py)
        _, _, x_proj_w, dt_w, dt_b, A_log, _ = params
        dtype = self.dtype
        dbl = jnp.dot(xp.astype(dtype), x_proj_w.astype(dtype))
        r, n = self.dt_rank_, self.d_state
        dt, Bm, Cm = (dbl[..., :r], dbl[..., r:r + n], dbl[..., r + n:])
        dt = jnp.dot(dt, dt_w.astype(dtype))
        A = -jnp.exp(A_log.astype(jnp.float32))
        return selective_scan(xp.astype(dtype), dt, A, Bm, Cm, D=None,
                              delta_bias=dt_b, delta_softplus=True,
                              impl=self.scan_impl, reverse=scan_reverse,
                              pallas_min_l=self.pallas_min_l)

    def _paired_proj_scan(self, xp_f: Array, xp_b: Array, fwd, bwd):
        """Both direction scans in ONE associative scan (round-3
        experiment, FASTVIM_PAIRED_SCAN=1): the reverse branch's pooled
        inputs are flipped (rows-length — tiny), both directions are
        concatenated on the CHANNEL axis with grouped B/C (one group per
        direction, the (batch, L, g, n) layout), and a single
        forward-direction scan of width 2·d_inner replaces two scans —
        half the sequential combine stages per layer, each twice as wide.
        Returns (yp_f, yp_b) in original row order."""
        dtype = self.dtype
        r, n = self.dt_rank_, self.d_state

        def proj(xp, params):
            _, _, x_proj_w, dt_w, _, _, _ = params
            dbl = jnp.dot(xp.astype(dtype), x_proj_w.astype(dtype))
            dt = jnp.dot(dbl[..., :r], dt_w.astype(dtype))
            return dt, dbl[..., r:r + n], dbl[..., r + n:]

        dt_f, B_f, C_f = proj(xp_f, fwd)
        dt_b, B_b, C_b = proj(xp_b, bwd)
        flip = lambda t: t[:, ::-1]
        u = jnp.concatenate([xp_f.astype(dtype),
                             flip(xp_b.astype(dtype))], axis=-1)
        dt = jnp.concatenate([dt_f, flip(dt_b)], axis=-1)
        Bc = jnp.stack([B_f, flip(B_b)], axis=2)  # (batch, rows, 2, n)
        Cc = jnp.stack([C_f, flip(C_b)], axis=2)
        A = -jnp.exp(jnp.concatenate(
            [fwd[5], bwd[5]]).astype(jnp.float32))       # (2·d_inner, n)
        db = jnp.concatenate([fwd[4], bwd[4]])
        y = selective_scan(u, dt, A, Bc, Cc, D=None, delta_bias=db,
                           delta_softplus=True, impl="assoc")
        d_inner = self.d_inner
        return y[..., :d_inner], flip(y[..., d_inner:])

    def _scan_branch(self, x: Array, params, grid_shape, pool_axes,
                     row_onehot: Optional[Array] = None,
                     reverse: bool = False,
                     xc: Optional[Array] = None) -> Array:
        """One scan direction: conv → (pool) → projections → scan →
        (broadcast) → + D·conv_out. x: (batch, L, d_inner).

        With ``row_onehot`` (batch, L, bins) — the masked-MAE case — the
        pool is a scatter-add into row bins divided by the *full* pooled
        extent (`compute_row_means_constantdivide`,
        mamba_simple_masked_faster.py:376-416) and the broadcast is a
        per-token gather of its row's scan output
        (mamba_simple_masked_faster.py:261-263); both are one-hot matmuls
        here (MXU-friendly, static shapes).

        ``reverse=True`` is the mixer's backward direction, computed
        entirely in original token order (the reference materializes a
        flipped copy, mamba_simple_faster.py:272-285): the causal conv of
        the flipped sequence is an anticausal conv here, pooling is
        order-invariant within each pooled group, and only the compressed
        (rows-length) arrays — or the scan's internal direction — are
        reversed. Zero full-length flips.
        """
        conv_w, conv_b, x_proj_w, dt_w, dt_b, A_log, Dp = params
        dtype = self.dtype
        if xc is None:
            conv = anticausal_conv1d if reverse else causal_conv1d
            xc = conv(x, conv_w.astype(dtype),
                      None if conv_b is None else conv_b.astype(dtype))
        pooled = self.collapse_method != "none"
        import os as _os

        _noonehot = ("noonehot" in _os.environ.get(
            "FASTVIM_COMPONENT_ABLATE", "") and row_onehot is not None)
        if _noonehot:
            # ablation only (benchmarks/mae_cost_tpu.py ledger): replace
            # the one-hot scatter/gather matmuls with shape-compatible
            # slice/tile so their cost can be measured by subtraction
            bins = row_onehot.shape[2]
            L = xc.shape[1]
            divisor = _prod(grid_shape[a] for a in pool_axes)
            xp = xc[:, :bins] / divisor
            y = self._proj_scan(xp, params, False)
            reps = -(-L // bins)  # ceil
            y = jnp.tile(y, (1, reps, 1))[:, :L]
            return y.astype(dtype) + Dp.astype(dtype)[None, None] * xc
        if row_onehot is not None:
            assert self.collapse_method == "mean", (
                "masked pooling supports mean only")
            # reverse branch: scatter the anticausal conv output with the
            # REVERSED row-id sequence — positionally identical to the
            # reference's scatter of the flipped sequence with unflipped
            # ids (mamba_simple_masked_faster.py:213-215)
            oh = row_onehot[:, ::-1] if reverse else row_onehot
            oh = oh.astype(dtype)
            divisor = _prod(grid_shape[a] for a in pool_axes)
            xp = jnp.einsum("blr,bld->brd", oh, xc) / divisor
        elif pooled:
            xp = pool_grid(xc, grid_shape, pool_axes, self.collapse_method,
                           self.scaling_factor)
        else:
            xp = xc
        # Scan direction: the dense pooled reverse branch scans the
        # compressed sequence right-to-left (the flipped grid's kept-axis
        # raster is exactly the reversed raster); the masked reverse
        # branch scans its row bins ASCENDING, like forward — the
        # reference's scatter indexes bins by explicit row id for both
        # directions (mamba_simple_masked_faster.py:248-259,284-295) and
        # only the token↔bin assignment is positional.
        scan_reverse = reverse and row_onehot is None
        y = self._proj_scan(xp, params, scan_reverse)
        if row_onehot is not None:
            y = jnp.einsum("blr,brd->bld", oh, y)
        elif pooled:
            y = broadcast_grid(y, grid_shape, pool_axes)
        # D·conv_out skip in the working dtype — the scan itself already
        # ran fp32; keeping this residual in bf16 halves HBM traffic on
        # the full-length activations.
        return y.astype(dtype) + Dp.astype(dtype)[None, None] * xc

    def init_cache(self, batch: int):
        """Zero incremental-decode cache (the reference's
        allocate_inference_cache, mamba_simple.py:471-...): a rolling
        conv window + fp32 SSM state for the causal (forward) branch."""
        return {
            "conv": jnp.zeros((batch, self.d_conv, self.d_inner),
                              self.dtype),
            "ssm": jnp.zeros((batch, self.d_inner, self.d_state),
                             jnp.float32),
        }

    @nn.compact
    def __call__(self, x: Array, grid_shape: Optional[Tuple[int, ...]] = None,
                 pool_axes: Optional[Tuple[int, ...]] = None,
                 row_onehot: Optional[Array] = None,
                 cache: Optional[dict] = None,
                 transposed: bool = False):
        """x: (batch, L, d_model); grid_shape: token grid in this mixer's
        orientation (e.g. (rows, cols), or (rows, cols, C) for
        Channel-First). pool_axes: grid axes pooled before the scan
        (default: the last axis — FastVim's cols).

        row_onehot (batch, L, bins): visible-token→row assignment for the
        masked (MAE) variant. NOTE the backward direction scatters the
        *flipped* sequence with the *unflipped* row ids — faithfully
        mirroring mamba_simple_masked_faster.py:213-215,297-300 where
        `compute_row_means_constantdivide(x, x_flip, ids_keep, ...)` uses
        one ids_keep for both directions.

        cache: incremental-decode state from ``init_cache`` — x must then
        be a single token (batch, 1, d_model) and the call returns
        ``(out, new_cache)``, the causal forward-branch decode step
        (the reference's Mamba.step, mamba_simple.py:409-470; the
        anticausal branch has no causal decode analogue).
        """
        if cache is None:
            assert grid_shape is not None, "grid_shape required"
            if pool_axes is None:
                pool_axes = (len(grid_shape) - 1,)
        d_inner = self.d_inner
        dtype = self.dtype
        x = x.astype(dtype)

        # Two-pass fused layer ("megakernel", ops/pallas/layer_fused.py):
        # owns the whole in_proj→out_proj chain incl. both GEMMs — the
        # one fusion shape docs/PERF.md §3 says has headroom left.
        # Dispatch comes from the `layer_fused` config field (default
        # "auto": TPU-only); FASTVIM_LAYER_FUSED, when set, overrides.
        # Multi-device: pallas_call has no GSPMD partitioning rule, so
        # under a multi-device jit the call is wrapped in a data-axis
        # shard_map over the cached mesh (see should_use_fused).
        import os as _os
        _lf = _os.environ.get("FASTVIM_LAYER_FUSED")
        if _lf is None:
            _lf = {"on": "1", "off": "0"}.get(self.layer_fused,
                                              self.layer_fused)
        if cache is None and row_onehot is None and _lf in ("1", "auto"):
            from fastvim_tpu.ops.pallas.layer_fused import (
                fusable as _lf_ok, should_use_fused as _lf_use)
            _use, _lf_mesh = _lf_use(_lf, x.shape[0])
            if _use and _lf_ok(tuple(grid_shape), tuple(pool_axes),
                               transposed, d_inner, self.d_conv,
                               self.collapse_method):
                return self._layer_fused_forward(x, tuple(grid_shape),
                                                 transposed, _lf_mesh)

        # Defaults below are the round-3 MEASURED winners (benchmarks/
        # ablate_r3_tpu.py @2048 b3): split-inproj 82.2, merge-pooled
        # 74.4, both+pallas 77.5 vs 86.3 img/s for the round-2 structure
        # — every byte-reduction restructure lost to XLA's schedule of
        # the original form (the HLO's "materialized" buffers are
        # largely VMEM-resident). Kept as env-flag variants for
        # re-measurement on future compilers.
        import os

        if os.environ.get("FASTVIM_SPLIT_INPROJ", "0") == "1":
            xin, z = SplitDense(half=d_inner, use_bias=self.bias,
                                kernel_init=torch_linear_init(self.d_model),
                                dtype=dtype, name="in_proj")(x)
        else:
            xz = nn.Dense(2 * d_inner, use_bias=self.bias,
                          kernel_init=torch_linear_init(self.d_model),
                          dtype=dtype, name="in_proj")(x)
            xin, z = xz[..., :d_inner], xz[..., d_inner:]

        fwd = self._dir_params("")
        bwd = self._dir_params("_b")

        if self.use_norm_after_ssm:
            ln_w = self.param("layernorm_weight", nn.initializers.ones,
                              (d_inner,))
            ln_b = self.param("layernorm_bias", nn.initializers.zeros,
                              (d_inner,))
        else:
            ln_w = ln_b = None

        if cache is not None:
            merged, new_cache = self._decode_step(
                xin, z, fwd, cache, ln_w, ln_b)
        elif self._use_fused(grid_shape, pool_axes, row_onehot):
            merged = self._fused_forward(xin, z, fwd, bwd, grid_shape,
                                         ln_w, ln_b)
        else:
            # both direction convs in one pass over xin (7 shared shifted
            # slices instead of 2×4; one read of xin) — ops/conv.dual_conv1d.
            # ``transposed``: the odd-layer column-major conv computed in
            # raster order — no grid-rotate relayouts (the tokens stay
            # put; pooling/broadcast use pool_axes=(0,)).
            conv_args = (
                xin, fwd[0].astype(dtype),
                None if fwd[1] is None else fwd[1].astype(dtype),
                bwd[0].astype(dtype),
                None if bwd[1] is None else bwd[1].astype(dtype))
            # component-cost ablation (benchmarks/component_cost_tpu.py):
            # short-circuit one stage; numerics change, speed is the
            # signal. Never set in production.
            _abl = os.environ.get("FASTVIM_COMPONENT_ABLATE", "full")
            if "noconv" in _abl:
                xc_f = xc_b = jax.nn.silu(xin)
            elif transposed:
                if len(grid_shape) == 3:
                    # ChannelVim Channel-First rotated layer, flip-free
                    # (ops/conv.channel_grid_dual_conv1d)
                    xc_f, xc_b = channel_grid_dual_conv1d(*conv_args,
                                                          grid_shape)
                else:
                    xc_f, xc_b = grid_dual_conv1d(*conv_args, grid_shape,
                                                  axis=0)
            else:
                # raster-order conv: the flat shifted-add form measures
                # FASTER than the 2-D (1, width) conv op for the
                # horizontal case (71.8 vs 64.2 img/s @2048 — XLA's conv
                # op only wins along the non-sublane H axis; CLAUDE.md)
                xc_f, xc_b = dual_conv1d(*conv_args)
            # default "0": MEASURED LOSS @2048 b3 (77.4 vs 86.6 img/s,
            # round 3) — the merge chain's time is latency-hidden work
            # XLA overlaps with the MXU stream; a custom call forfeits
            # the overlap. Kept as an opt-in documented negative.
            _fm = os.environ.get("FASTVIM_FUSED_MERGE", "0")
            use_fused_merge = (
                row_onehot is None and self.collapse_method != "none"
                and (_fm == "1" or
                     (_fm == "auto"
                      and jax.default_backend() == "tpu")))
            if use_fused_merge:
                from fastvim_tpu.ops.pallas.merge_gate import fusable
                use_fused_merge = fusable(tuple(grid_shape),
                                          tuple(pool_axes), d_inner)
            if use_fused_merge:
                # Round-3 measured winner: the broadcast+D-skip+merge+
                # LN+gate chain was 10.3 ms of the 34.7 ms 2048px b3
                # forward (3x its HBM roofline) — one Pallas kernel does
                # it in a single pass (ops/pallas/merge_gate.py).
                from fastvim_tpu.ops.pallas.merge_gate import (
                    merge_ln_gate,
                )

                yp_f = self._proj_scan(
                    pool_grid(xc_f, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    fwd, scan_reverse=False)
                yp_b = self._proj_scan(
                    pool_grid(xc_b, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    bwd, scan_reverse=True)
                merged = merge_ln_gate(
                    xc_f, xc_b, z, yp_f, yp_b, fwd[6], bwd[6],
                    ln_w, ln_b, tuple(grid_shape), tuple(pool_axes),
                    self.norm_eps, self.use_norm_after_ssm,
                    jax.default_backend() != "tpu")
            elif (row_onehot is None and self.collapse_method != "none"
                    and os.environ.get("FASTVIM_PAIRED_SCAN", "0") == "1"):
                yp_f, yp_b = self._paired_proj_scan(
                    pool_grid(xc_f, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    pool_grid(xc_b, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    fwd, bwd)
                y_f = broadcast_grid(yp_f.astype(dtype), grid_shape,
                                     pool_axes) \
                    + fwd[6].astype(dtype)[None, None] * xc_f
                y_b = broadcast_grid(yp_b.astype(dtype), grid_shape,
                                     pool_axes) \
                    + bwd[6].astype(dtype)[None, None] * xc_b
                merged = (y_f + y_b) * jnp.asarray(0.5, dtype)
            elif (row_onehot is None and self.collapse_method != "none"
                    and os.environ.get("FASTVIM_MERGE_POOLED", "0") == "1"):
                # Dense pooled path, merge-at-pooled-level (round-3 byte
                # model): the two direction outputs are summed on the
                # COMPRESSED rows sequence and broadcast ONCE —
                # broadcast(y_f)+broadcast(y_b) == broadcast(y_f+y_b) is
                # exact, and it halves the full-length broadcast traffic
                # that the round-2 HLO showed materialized per direction
                # (2×(B,L,d_inner) per layer, ~1.8 GB per 2048px b3 fwd).
                yp_f = self._proj_scan(
                    pool_grid(xc_f, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    fwd, scan_reverse=False)
                yp_b = self._proj_scan(
                    pool_grid(xc_b, grid_shape, pool_axes,
                              self.collapse_method, self.scaling_factor),
                    bwd, scan_reverse=True)
                y_sum = broadcast_grid((yp_f + yp_b).astype(dtype),
                                       grid_shape, pool_axes)
                merged = (y_sum
                          + fwd[6].astype(dtype)[None, None] * xc_f
                          + bwd[6].astype(dtype)[None, None] * xc_b)
                merged = merged * jnp.asarray(0.5, dtype)
            else:
                y_f = self._scan_branch(xin, fwd, grid_shape, pool_axes,
                                        row_onehot, xc=xc_f)
                # reverse branch in original order — no full-length flips
                y_b = self._scan_branch(xin, bwd, grid_shape, pool_axes,
                                        row_onehot, reverse=True, xc=xc_b)

                # merge in working dtype; layer_norm upcasts to fp32
                # internally (per-element, fused by XLA — no fp32
                # materialization in HBM)
                merged = (y_f + y_b) * jnp.asarray(0.5, dtype)
            if use_fused_merge or "nomerge" in _abl:
                pass  # LN+gate already fused in / ablated out
            else:
                if self.use_norm_after_ssm:
                    merged = layer_norm(merged, ln_w, ln_b,
                                        eps=self.norm_eps)
                merged = merged * jax.nn.silu(z)

        out = nn.Dense(
            self.d_model, use_bias=self.bias,
            kernel_init=torch_linear_init(
                d_inner, scale=1.0 / math.sqrt(self.n_layer)),
            dtype=dtype, name="out_proj")(merged)
        if self.init_layer_scale is not None:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.init_layer_scale),
                (self.d_model,))
            out = out * gamma.astype(dtype)
        if cache is not None:
            return out, new_cache
        return out

    def _layer_fused_forward(self, x: Array, grid, transposed: bool,
                             mesh=None):
        """Fused-layer path: declares the same param tree as the XLA
        path (nn.Dense in/out_proj via _DenseParams — identical names,
        shapes and init RNG) and hands everything to the two-pass
        Pallas megakernel. Parity locked by tests/test_layer_fused.py.
        ``mesh`` non-None → batch-sharded shard_map dispatch."""
        from fastvim_tpu.ops.pallas.layer_fused import (
            fused_mixer_core, fused_mixer_core_sharded)

        d_inner = self.d_inner
        win, bin_ = _DenseParams(2 * d_inner, self.bias,
                                 torch_linear_init(self.d_model),
                                 name="in_proj")(self.d_model)
        fwd = self._dir_params("")
        bwd = self._dir_params("_b")
        if self.use_norm_after_ssm:
            ln_w = self.param("layernorm_weight", nn.initializers.ones,
                              (d_inner,))
            ln_b = self.param("layernorm_bias", nn.initializers.zeros,
                              (d_inner,))
        else:
            ln_w = ln_b = None
        wout, bout = _DenseParams(
            self.d_model, self.bias,
            torch_linear_init(d_inner,
                              scale=1.0 / math.sqrt(self.n_layer)),
            name="out_proj")(d_inner)
        p = (win, bin_, fwd[0], fwd[1], bwd[0], bwd[1],
             fwd[2], fwd[3], fwd[4], fwd[5], fwd[6],
             bwd[2], bwd[3], bwd[4], bwd[5], bwd[6],
             ln_w, ln_b, wout, bout)
        core_args = (grid, bool(transposed), float(self.scaling_factor),
                     float(self.norm_eps), bool(self.use_norm_after_ssm),
                     self.dtype, self.scan_impl,
                     jax.default_backend() != "tpu",
                     self.layer_fused_bwd)
        if mesh is not None:
            out = fused_mixer_core_sharded(x, p, mesh, *core_args)
        else:
            out = fused_mixer_core(x, p, *core_args)
        if self.init_layer_scale is not None:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.init_layer_scale),
                (self.d_model,))
            out = out * gamma.astype(self.dtype)
        return out

    def _decode_step(self, xin: Array, z: Array, params, cache,
                     ln_w, ln_b):
        """One causal decode step: conv window update → projections →
        SSM state update → D·x skip → (LN) → silu(z) gate. xin/z:
        (batch, 1, d_inner). Mirrors Mamba.step (mamba_simple.py:409-470)
        with this mixer's post-SSM-norm option applied for
        self-consistency with __call__'s forward branch."""
        conv_w, conv_b, x_proj_w, dt_w, dt_b, A_log, Dp = params
        dtype = self.dtype
        xt, zt = xin[:, 0], z[:, 0]
        xc, conv_state = causal_conv1d_update(
            xt, cache["conv"], conv_w.astype(dtype),
            None if conv_b is None else conv_b.astype(dtype))
        dbl = jnp.dot(xc.astype(dtype), x_proj_w.astype(dtype))
        r, n = self.dt_rank_, self.d_state
        dt, Bm, Cm = dbl[:, :r], dbl[:, r:r + n], dbl[:, r + n:]
        dt = jnp.dot(dt, dt_w.astype(dtype))
        A = -jnp.exp(A_log.astype(jnp.float32))
        y, ssm_state = selective_state_update(
            cache["ssm"], xc, dt, A, Bm, Cm, D=Dp, z=None,
            dt_bias=dt_b, dt_softplus=True)
        if self.use_norm_after_ssm:
            y = layer_norm(y, ln_w, ln_b, eps=self.norm_eps)
        y = (y * jax.nn.silu(zt)).astype(dtype)
        return y[:, None], {"conv": conv_state, "ssm": ssm_state}
