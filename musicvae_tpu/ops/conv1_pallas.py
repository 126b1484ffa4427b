"""Pallas TPU kernel: the first encoder conv (3x3, stride 2, 1→16ch) as a
banded-matmul on the MXU.

Why this op: microbenchmarks (bench/microbench.py, v5e) show the 5-layer
ConvTrunk forward is dominated by its FIRST layer — a 3x3 stride-2 conv
from a 1-channel [96,128] piano-roll bar to 16 channels. Its contraction
depth is 9 and its output-channel count 16 against the MXU's 128x128
tiles, so XLA's conv emitter runs it at ~1% MXU utilization and it costs
as much as the other four (much larger) layers combined. The same starved
shape appears 2x per forward (encoder trunk + prev-bar featurizer) and
2x more in the backward.

The trick: fold the pitch axis's stride-2/3-tap structure into a BANDED
weight matrix. For each time tap kt ∈ {0,1,2}:

    y[m, i, j, c] += x[m, 2i+kt-1, :] @ B_kt[:, j*16+c]
    B_kt[p, j*16+c] = w[kt, kp, c]  where p = 2j+kp-1, kp ∈ {0,1,2}

so the whole layer is THREE dense [rows,128] x [128,1024] matmuls — MXU
tiles at full lane width (the rhs wastes nothing; the lhs contraction dim
is the native 128-pitch axis). FLOPs rise 42x vs the minimal conv (the
band is mostly zeros) but the MXU runs them at full rate, which beats
running the minimal FLOPs at 1% utilization. Bar-roll edges are handled
exactly: pitch edges fall out of the band's range (zero columns); the
t=-1 time edge is a zero row prepended in-kernel.

Gradients: the kernel carries a custom VJP. dx is never needed by
callers (the input is always data or a binarized sample — the piano-roll
x, the teacher-forced previous bar, or generation feedback), so the VJP
returns a ZERO dx by design. NOTE this contract is documented, not
runtime-checked: a call site that differentiates through the conv INPUT
(none exists — the only sites are layers._FirstConvPallas on raw rolls)
would silently get zero input gradients. Keep any new call site on
non-differentiated inputs, or thread a real dx first. dw/db are computed
in XLA from the same banded views (a [128, rows] x [rows, 1024] matmul —
also MXU-shaped).

Numerics: matmuls accumulate in f32 (preferred_element_type); bf16 inputs
match the XLA path's conv dtype. Equivalence vs flax nn.Conv is asserted
to ~1e-2 abs (bf16) / 1e-5 (f32) in tests/test_conv1_pallas.py.

PERFORMANCE VERDICT (measured on v5e, bench/microbench.py, net of the
harness floor): XLA's conv emitter runs this op (+gelu) in ~107µs at C2
shapes; this kernel's two formulations measure ~421µs (per-image lhs
assembly, M_TILE=8) and ~623µs (global parity planes, M_TILE=16) — the
stride-2 structure's data movement costs more under Mosaic's lowering
than the banded matmul saves on the MXU. The kernel is kept as the
documented record of the attempt (docs/PALLAS_NOTES.md);
ModelSpec.use_pallas_conv1 defaults to False and nothing sets it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_IN, P_IN = 96, 128          # bar roll
T_OUT, P_OUT = 48, 64         # stride-2 output
M_TILE = 16                   # bar-images per grid step (32 exceeds the
                              # 16MB scoped-vmem stack limit on v5e)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def build_band(w: jax.Array) -> jax.Array:
    """[3,3,C] conv kernel → [3, 128, 64*C] banded matmul weights.

    Differentiable (pure scatter via .at[].set), so jax.grad flows through
    to w in the custom VJP's dw path.
    """
    import numpy as np
    c = w.shape[-1]
    band = jnp.zeros((3, P_IN, P_OUT * c), w.dtype)
    for kp in range(3):
        # index plumbing is static (trace-time numpy); only w is traced
        js = np.arange(P_OUT)
        ps = 2 * js + kp - 1                        # pitch row in the band
        valid = (ps >= 0) & (ps < P_IN)
        jv = js[valid]
        pv = ps[valid]
        # columns j*C+c for each valid j, all c at once
        cols = (jv[:, None] * c + np.arange(c)[None, :]).reshape(-1)
        rows = np.repeat(pv, c)
        for kt in range(3):
            band = band.at[kt, rows, cols].add(
                jnp.tile(w[kt, kp], int(jv.shape[0])))
    return band


def _tap_rows(x: jax.Array, kt: int) -> jax.Array:
    """x [..., 96, 128] → the 48 input rows feeding output rows for tap kt
    (row 2i+kt-1), zero row where the tap falls off the top edge.

    No strided slicing (Mosaic lowers it as an unsupported gather): the
    even/odd row planes come from a [...,48,2,128] reshape + plain index.
    """
    planes = x.reshape(*x.shape[:-2], T_OUT, 2, P_IN)
    if kt == 0:                                   # rows 2i-1: shifted odd
        odd = planes[..., 1, :]
        zero = jnp.zeros_like(odd[..., :1, :])
        return jnp.concatenate([zero, odd[..., : T_OUT - 1, :]], axis=-2)
    return planes[..., kt - 1, :]                 # kt=1: even, kt=2: odd


def _conv1_kernel(x_ref, band_ref, bias_ref, out_ref, *, gelu: bool):
    """Fully-2D formulation (Mosaic lowers strided slices/gathers poorly):

    [M,96,128] → [M*48, 2, 128] is a free sublane regroup; indexing the
    parity plane gives the even/odd input rows of ALL images batched as one
    [M*48, 128] operand. The kt=0 tap needs each image's PREVIOUS odd row —
    a global row shift leaks row 95 of image m-1 into row 0 of image m, so
    those rows are masked to the zero-padding the conv semantics require.
    Three MXU matmuls [M*48,128]x[128,1024] do all the arithmetic.
    """
    rows = M_TILE * T_OUT
    planes = x_ref[...].reshape(rows, 2, P_IN)
    even = planes[:, 0, :]
    odd = planes[:, 1, :]
    shifted = jnp.concatenate(
        [jnp.zeros_like(odd[:1]), odd[:-1]], axis=0)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    lhs0 = jnp.where(rowid % T_OUT == 0, jnp.zeros_like(shifted), shifted)

    def dot(lhs, kt):
        return jax.lax.dot_general(
            lhs.astype(band_ref.dtype), band_ref[kt],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = dot(lhs0, 0) + dot(even, 1) + dot(odd, 2)
    acc = acc + bias_ref[...][0]
    if gelu:
        acc = jax.nn.gelu(acc)
    out_ref[...] = acc.reshape(M_TILE, T_OUT, -1).astype(out_ref.dtype)


def _fwd_impl(x, band, bias, gelu: bool, out_dtype) -> jax.Array:
    m = x.shape[0]
    c = band.shape[-1] // P_OUT
    pad = (-m) % M_TILE
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    mp = xp.shape[0]
    if out_dtype == jnp.bfloat16:
        band = band.astype(jnp.bfloat16)     # bf16 MXU passes, f32 accum —
        xp = xp.astype(jnp.bfloat16)         # same contract as XLA's conv
    bias_row = jnp.tile(bias, P_OUT).reshape(1, P_OUT * c)
    out = pl.pallas_call(
        functools.partial(_conv1_kernel, gelu=gelu),
        grid=(mp // M_TILE,),
        in_specs=[
            pl.BlockSpec((M_TILE, T_IN, P_IN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P_IN, P_OUT * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_OUT * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_TILE, T_OUT, P_OUT * c),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, T_OUT, P_OUT * c), out_dtype),
        interpret=_interpret(),
    )(xp, band, bias_row)
    if pad:
        out = out[:m]
    return out.reshape(m, T_OUT, P_OUT, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _first_conv_s2(x, w, b, gelu: bool, out_dtype):
    band = build_band(w.astype(jnp.float32))
    return _fwd_impl(x, band, b.astype(jnp.float32), gelu, out_dtype)


def _first_conv_fwd(x, w, b, gelu, out_dtype):
    y = _first_conv_s2(x, w, b, gelu, out_dtype)
    # residuals exclude y: the backward recomputes the pre-activation (it
    # needs z, not gelu(z)), so saving y would only pin a dead activation
    return y, (x, w, b)


def _first_conv_bwd(gelu, out_dtype, res, dy):
    x, w, b = res
    c = w.shape[-1]
    dy = dy.reshape(dy.shape[0], T_OUT, P_OUT * c).astype(jnp.float32)
    if gelu:
        # recompute pre-activation grad: dz = dy * gelu'(z); z from x,w,b
        band = build_band(w.astype(jnp.float32))
        z = _fwd_impl(x, band, b.astype(jnp.float32), False, jnp.float32)
        z = z.reshape(dy.shape)
        dz = dy * _gelu_grad(z)
    else:
        dz = dy

    # dband[kt] = sum_m lhs_kt^T @ dz   → contract back to dw via the band
    # construction's transpose (autodiff of build_band).
    def band_loss(wf):
        band = build_band(wf)
        acc = jnp.zeros((), jnp.float32)
        for kt in range(3):
            lhs = _tap_rows(x.astype(jnp.float32), kt)
            yk = jax.lax.dot_general(
                lhs, band[kt], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jnp.sum(yk * dz)
        return acc

    dw = jax.grad(band_loss)(w.astype(jnp.float32)).astype(w.dtype)
    db = jnp.sum(dz.reshape(-1, P_OUT, c), axis=(0, 1)).astype(b.dtype)
    # dx is zero BY CONTRACT: every caller feeds data / binarized samples
    # (module docstring); a nonzero cotangent must not silently flow.
    dx = jnp.zeros_like(x)
    return dx, dw, db


def _gelu_grad(z):
    # d/dz gelu(z) for the tanh approximation jax.nn.gelu uses by default
    c0 = 0.7978845608028654          # sqrt(2/pi)
    c1 = 0.044715
    t = jnp.tanh(c0 * (z + c1 * z ** 3))
    return 0.5 * (1 + t) + 0.5 * z * (1 - t ** 2) * c0 * (1 + 3 * c1 * z ** 2)


_first_conv_s2.defvjp(_first_conv_fwd, _first_conv_bwd)


def first_conv_s2(x: jax.Array, w: jax.Array, b: jax.Array,
                  gelu: bool = True,
                  out_dtype=jnp.bfloat16) -> jax.Array:
    """Stride-2 3x3 single-channel conv + bias (+gelu) via the banded-MXU
    Pallas kernel.

    x: [M, 96, 128] (f32/bf16/binary), w: [3, 3, C], b: [C]
    → [M, 48, 64, C].

    Gradient contract: dx is identically zero (inputs are always data or
    binarized feedback — never a differentiated activation). dw/db are
    exact. Matches ``nn.Conv(C, (3,3), strides=(2,2), padding=((1,1),(1,1)))``
    on a [M,96,128,1] input followed by gelu, to bf16 tolerance.
    """
    return _first_conv_s2(x, w, b, gelu, out_dtype)
