"""Fused bilinear splat/gather Pallas TPU kernels.

The 4-tap bilinear stencil of the reference warp library (reference
``utils/iwe.py:63-136`` scatter-add, ``:17-40`` grid_sample) factorizes per
axis: ``w = tri(y - h) * tri(x - w)`` with ``tri(d) = max(0, 1 - |d|)``. The
round-1 rebuild exploited this with dense XLA einsums over materialized
``[M, size]`` triangle factors — exact, MXU-friendly, but HBM-bound on the
factor tensors and limited to small maps. These kernels generate the factors
*on the fly in VMEM* per (event-chunk x image-tile) grid cell and contract
them on the MXU, so the only HBM traffic is the event stream and the image:

  * splat:  ``out[h, w, c] += sum_e tri(y_e - h) tri(x_e - w) v[e, c]``
            — one ``[TH, E] @ [E, TW]`` matmul per channel per cell.
  * gather: ``out[e, c] += sum_hw tri(y_e - h) tri(x_e - w) img[h, w, c]``
            — ``A = Wx @ img_c^T`` then a masked row-reduction with ``Wy``.

Both kernels take per-axis stencil modes so the SAME kernels implement the
custom VJPs: the derivative stencil ``dtri`` reproduces jax's autodiff
conventions for ``maximum(0, 1 - |d|)`` exactly (``dtri(0) = -1`` since
``d|d|/dd = +1`` at 0; ``dtri(+-1) = -+0.5`` from the max tie rule), so
switching between this and the separable-einsum backend does not change
gradients. Caveat (measure-zero): at EXACTLY-integer coordinates the
bilinear kernel is non-differentiable and the two subgradient conventions
in this codebase differ — the dtri paths here and in ``mxu_lookup`` split
the ``|d| = 1`` tie 0.5/0.5 (jax's ``maximum`` rule), while the
packed-patch gather (``warp.py``) anchors a 2x2 stencil at ``floor`` and
never sees the tie tap, which is torch ``grid_sample``'s convention (the
reference oracle). For any non-integer coordinate all paths agree exactly;
training locations are off-integer almost surely (events ride non-zero
flow), and the round_idx paths stop-gradient their rounding.

Out-of-frame semantics match the reference's purge/bounds masking for free:
a tap outside the image has no tile column, and events purged to ``(0, 0)``
carry zero values/masks.

Numerics: factors are computed in f32; under the DEFAULT matmul precision
policy (``ops.precision``) the contractions run as single bf16 MXU passes
(weights in [0, 1] round at ~2^-9 — the same policy the XLA separable path
uses), while HIGHEST keeps full f32 contractions for strict parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import get_matmul_precision

# stencil modes
TRI = 0  # triangle (bilinear) weight
DTRI = 1  # its derivative, matching jax autodiff of maximum(0, 1 - |d|)

_TILE_H = 128
_TILE_W = 128
# events per grid step: large chunks amortize per-cell grid overhead (the
# dominant cost at 1024 — measured ~10 us/cell). The plain splat/gather
# kernels hold 3 factor-sized arrays (~7 MB at 8192 with bf16 factors);
# the fused dual-stencil backward holds 6 (4096 tops under bf16). 16384
# microbenches ~15% faster on the isolated vjp but sits 132 KB from the
# 16 MB scoped-VMEM cliff (C=4 splat at B=88 OOMs, measured) and is a wash
# at full-step level — keep 8192.
_CHUNK = 8192
_CHUNK_FUSED = 4096


def _stencil(d, mode: int):
    """Per-axis weight of fractional distance ``d`` (f32, exact compares)."""
    if mode == TRI:
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    a = jnp.abs(d)
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    mag = jnp.where(a < 1.0, 1.0, jnp.where(a == 1.0, 0.5, 0.0))
    return -sign * mag


def _factor_pe(coord, off, size, e, mode, dtype):
    """Pixel-major triangle factor ``[size, E]``: ``stencil(coord - pos)``.

    Pixel index on SUBLANES, events on LANES — the MXU-native layout: the
    splat contraction ``[TH, E] @ [E, TW]`` and the gather contraction
    ``[TH, TW] @ [TW, E]`` are then standard ``[M, K] @ [K, N]`` forms
    (contract lhs lanes against rhs sublanes) and need no Mosaic relayout.
    (The original event-major ``[E, size]`` factors forced a sublane-axis
    contraction — a per-cell transpose that dominated kernel time.)

    Mosaic's tpu.iota is integer-only — build int32 and convert (a float
    broadcasted_iota verifies in interpret mode but fails TPU lowering).
    """
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (size, e), 0
    ).astype(jnp.float32) + off
    return _stencil(coord[None, :] - pos, mode).astype(dtype)


def _factor_ep(coord, off, size, e, mode, dtype):
    """Event-major triangle factor ``[E, size]`` (events on sublanes)."""
    pos = jax.lax.broadcasted_iota(
        jnp.int32, (e, size), 1
    ).astype(jnp.float32) + off
    return _stencil(coord[:, None] - pos, mode).astype(dtype)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _use_bf16() -> bool:
    # mirror mxu_lookup._factor_dtype: DEFAULT precision means single bf16
    # MXU passes on accelerators; CPU (tests / interpret mode) stays exact
    return (
        get_matmul_precision() == jax.lax.Precision.DEFAULT
        and jax.devices()[0].platform == "tpu"
    )


# ------------------------------------------------------------------- splat


def _splat_kernel(y_ref, x_ref, v_ref, o_ref, *, mode_y, mode_x, bf16,
                  n_chan):
    nc = pl.program_id(3)

    @pl.when(nc == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    th, tw = o_ref.shape[2], o_ref.shape[3]
    e = y_ref.shape[2]
    oy = (pl.program_id(1) * th).astype(jnp.float32)
    ox = (pl.program_id(2) * tw).astype(jnp.float32)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    wy_pe = _factor_pe(y_ref[0, 0], oy, th, e, mode_y, dtype)  # [TH, E]
    wx_ep = _factor_ep(x_ref[0, 0], ox, tw, e, mode_x, dtype)  # [E, TW]
    for c in range(n_chan):
        wxv = wx_ep * v_ref[0, c][:, None].astype(dtype)
        o_ref[0, c] += jax.lax.dot_general(
            wy_pe, wxv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=None if bf16 else jax.lax.Precision.HIGHEST,
        )


def splat_pallas(loc, values, res: Tuple[int, int]):
    """Fused bilinear splat: ``[B, M, 2]`` (y, x) + ``[B, M, C]`` values ->
    ``[B, H, W, C]`` (raw kernel — use :func:`splat_grad` for autodiff)."""
    return _splat_raw(loc, values, res, TRI, TRI)


def _splat_raw(loc, values, res, mode_y, mode_x):
    b, m, c = values.shape
    h, w = res
    hp, wp = _round_up(h, _TILE_H), _round_up(w, _TILE_W)
    e = min(_CHUNK if _use_bf16() else _CHUNK // 2, _round_up(m, 128))
    mp = _round_up(m, e)

    y = loc[..., 0].astype(jnp.float32)
    x = loc[..., 1].astype(jnp.float32)
    vals = jnp.transpose(values, (0, 2, 1)).astype(jnp.float32)  # [B, C, M]
    if mp != m:
        # pad with out-of-stencil coords AND zero values (coord -2 has zero
        # weight everywhere, so padding is inert even for dtri modes)
        y = jnp.pad(y, ((0, 0), (0, mp - m)), constant_values=-2.0)
        x = jnp.pad(x, ((0, 0), (0, mp - m)), constant_values=-2.0)
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, mp - m)))
    # singleton middle axis: Mosaic requires the 2nd-to-last block dim to
    # equal the array dim (or be a multiple of 8) — [B, M] blocks of (1, E)
    # violate that whenever B > 1
    y = y[:, None, :]
    x = x[:, None, :]

    grid = (b, hp // _TILE_H, wp // _TILE_W, mp // e)
    kernel = functools.partial(
        _splat_kernel, mode_y=mode_y, mode_x=mode_x, bf16=_use_bf16(),
        n_chan=c,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda bb, i, j, nc: (bb, 0, nc)),
            pl.BlockSpec((1, 1, e), lambda bb, i, j, nc: (bb, 0, nc)),
            pl.BlockSpec((1, c, e), lambda bb, i, j, nc: (bb, 0, nc)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, _TILE_H, _TILE_W), lambda bb, i, j, nc: (bb, 0, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(y, x, vals)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


# ------------------------------------------------------------------ gather


def _gather_kernel(y_ref, x_ref, m_ref, o_ref, *, mode_y, mode_x, bf16,
                   n_chan):
    ti = pl.program_id(2)
    tj = pl.program_id(3)

    @pl.when(jnp.logical_and(ti == 0, tj == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    th, tw = m_ref.shape[2], m_ref.shape[3]
    e = y_ref.shape[2]
    oy = (ti * th).astype(jnp.float32)
    ox = (tj * tw).astype(jnp.float32)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    wy_pe = _factor_pe(y_ref[0, 0], oy, th, e, mode_y, dtype)  # [TH, E]
    wx_pe = _factor_pe(x_ref[0, 0], ox, tw, e, mode_x, dtype)  # [TW, E]
    for c in range(n_chan):
        a = jax.lax.dot_general(
            m_ref[0, c].astype(dtype), wx_pe,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=None if bf16 else jax.lax.Precision.HIGHEST,
        )  # [TH, E]
        o_ref[0, c] += jnp.sum(wy_pe.astype(jnp.float32) * a, axis=0)


def gather_pallas(maps, loc):
    """Fused bilinear gather: ``[B, H, W, C]`` maps + ``[B, M, 2]`` (y, x) ->
    ``[B, M, C]`` (raw kernel — use :func:`gather_grad` for autodiff)."""
    return _gather_raw(maps, loc, TRI, TRI)


def _gather_raw(maps, loc, mode_y, mode_x):
    b, h, w, c = maps.shape
    m = loc.shape[1]
    hp, wp = _round_up(h, _TILE_H), _round_up(w, _TILE_W)
    e = min(_CHUNK if _use_bf16() else _CHUNK // 2, _round_up(m, 128))
    mp = _round_up(m, e)

    y = loc[..., 0].astype(jnp.float32)
    x = loc[..., 1].astype(jnp.float32)
    if mp != m:
        y = jnp.pad(y, ((0, 0), (0, mp - m)), constant_values=-2.0)
        x = jnp.pad(x, ((0, 0), (0, mp - m)), constant_values=-2.0)
    y = y[:, None, :]  # singleton axis: see _splat_raw
    x = x[:, None, :]
    mm = jnp.transpose(maps, (0, 3, 1, 2)).astype(jnp.float32)  # [B, C, H, W]
    if (hp, wp) != (h, w):
        mm = jnp.pad(mm, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    grid = (b, mp // e, hp // _TILE_H, wp // _TILE_W)
    kernel = functools.partial(
        _gather_kernel, mode_y=mode_y, mode_x=mode_x, bf16=_use_bf16(),
        n_chan=c,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec(
                (1, c, _TILE_H, _TILE_W), lambda bb, nc, i, j: (bb, 0, i, j)
            ),
        ],
        out_specs=pl.BlockSpec((1, c, e), lambda bb, nc, i, j: (bb, 0, nc)),
        out_shape=jax.ShapeDtypeStruct((b, c, mp), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(y, x, mm)
    return jnp.transpose(out, (0, 2, 1))[:, :m]


# ------------------------------------------------------- fused dual gather


def _gather_fused_kernel(y_ref, x_ref, v_ref, m_ref, gv_ref, dy_ref, dx_ref,
                         *, bf16, n_chan):
    """One pass producing gather values AND both location-derivative
    contractions: ``gv_c = Σ tri·tri·m_c``, ``dy = Σ_c v_c·Σ dtri·tri·m_c``,
    ``dx = Σ_c v_c·Σ tri·dtri·m_c``. This is the whole backward of the splat
    (and the location half of the gather's) in ONE kernel — one factor
    generation and one image pass instead of three."""
    ti = pl.program_id(2)
    tj = pl.program_id(3)

    @pl.when(jnp.logical_and(ti == 0, tj == 0))
    def _():
        gv_ref[...] = jnp.zeros_like(gv_ref)
        dy_ref[...] = jnp.zeros_like(dy_ref)
        dx_ref[...] = jnp.zeros_like(dx_ref)

    th, tw = m_ref.shape[2], m_ref.shape[3]
    e = y_ref.shape[2]
    oy = (ti * th).astype(jnp.float32)
    ox = (tj * tw).astype(jnp.float32)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    wy_pe = _factor_pe(y_ref[0, 0], oy, th, e, TRI, dtype)  # [TH, E]
    wx_pe = _factor_pe(x_ref[0, 0], ox, tw, e, TRI, dtype)  # [TW, E]
    dwy_pe = _factor_pe(y_ref[0, 0], oy, th, e, DTRI, dtype)
    dwx_pe = _factor_pe(x_ref[0, 0], ox, tw, e, DTRI, dtype)
    wy32 = wy_pe.astype(jnp.float32)
    dwy32 = dwy_pe.astype(jnp.float32)
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    dy_acc = jnp.zeros((e,), jnp.float32)
    dx_acc = jnp.zeros((e,), jnp.float32)
    for c in range(n_chan):
        mc = m_ref[0, c].astype(dtype)
        a = jax.lax.dot_general(
            mc, wx_pe, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [TH, E] — tri-x contraction
        b = jax.lax.dot_general(
            mc, dwx_pe, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # [TH, E] — dtri-x contraction
        vc = v_ref[0, c].astype(jnp.float32)
        gv_ref[0, c] += jnp.sum(wy32 * a, axis=0)
        dy_acc += vc * jnp.sum(dwy32 * a, axis=0)
        dx_acc += vc * jnp.sum(wy32 * b, axis=0)
    dy_ref[0, 0] += dy_acc
    dx_ref[0, 0] += dx_acc


def _gather_fused_raw(maps, loc, values):
    """Returns ``(gv [B,M,C], dy [B,M], dx [B,M])`` — see kernel docstring.

    ``dy/dx`` are already contracted with ``values`` over channels.
    """
    b, h, w, c = maps.shape
    m = loc.shape[1]
    hp, wp = _round_up(h, _TILE_H), _round_up(w, _TILE_W)
    # the fused kernel holds 4 factor arrays + 2 f32 contraction buffers
    # per cell: ~10 MB at chunk 4096 with bf16 factors (fits the 16 MB
    # scoped-VMEM limit), ~20 MB with f32 factors (doesn't — quarter it)
    chunk = _CHUNK_FUSED if _use_bf16() else _CHUNK_FUSED // 4
    e = min(chunk, _round_up(m, 128))
    mp = _round_up(m, e)

    y = loc[..., 0].astype(jnp.float32)
    x = loc[..., 1].astype(jnp.float32)
    vals = jnp.transpose(values, (0, 2, 1)).astype(jnp.float32)  # [B, C, M]
    if mp != m:
        y = jnp.pad(y, ((0, 0), (0, mp - m)), constant_values=-2.0)
        x = jnp.pad(x, ((0, 0), (0, mp - m)), constant_values=-2.0)
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, mp - m)))
    y = y[:, None, :]
    x = x[:, None, :]
    mm = jnp.transpose(maps, (0, 3, 1, 2)).astype(jnp.float32)
    if (hp, wp) != (h, w):
        mm = jnp.pad(mm, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    grid = (b, mp // e, hp // _TILE_H, wp // _TILE_W)
    kernel = functools.partial(
        _gather_fused_kernel, bf16=_use_bf16(), n_chan=c,
    )
    gv, dy, dx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec((1, c, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec(
                (1, c, _TILE_H, _TILE_W), lambda bb, nc, i, j: (bb, 0, i, j)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, c, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
            pl.BlockSpec((1, 1, e), lambda bb, nc, i, j: (bb, 0, nc)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, mp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.float32),
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(y, x, vals, mm)
    return (
        jnp.transpose(gv, (0, 2, 1))[:, :m],
        dy[:, 0, :m],
        dx[:, 0, :m],
    )


# -------------------------------------------------------------- custom VJP


@functools.lru_cache(maxsize=None)
def _splat_vjp(res: Tuple[int, int]):
    @jax.custom_vjp
    def f(loc, values):
        return _splat_raw(loc, values, res, TRI, TRI)

    def fwd(loc, values):
        return f(loc, values), (loc, values)

    def bwd(resid, g):
        loc, values = resid
        # one fused kernel: gv = gather(g), d_loc = dual-stencil gathers
        # pre-contracted with values (3 kernels' worth of work, one image
        # pass, one factor generation)
        gv, d_y, d_x = _gather_fused_raw(g, loc, values)
        return jnp.stack([d_y, d_x], axis=-1), gv

    f.defvjp(fwd, bwd)
    return f


def splat_grad(loc, values, res: Tuple[int, int]):
    """Differentiable fused splat (custom VJP: backward = dual gathers)."""
    return _splat_vjp(tuple(res))(loc, values)


@functools.lru_cache(maxsize=None)
def _gather_vjp(res: Tuple[int, int]):
    @jax.custom_vjp
    def f(maps, loc):
        return _gather_raw(maps, loc, TRI, TRI)

    def fwd(maps, loc):
        return f(maps, loc), (maps, loc)

    def bwd(resid, g):
        maps, loc = resid
        d_maps = _splat_raw(loc, g, res, TRI, TRI)
        # fused dual gathers pre-contracted with the cotangent (gv unused
        # but costs only one extra row-reduction on the shared contraction)
        _, d_y, d_x = _gather_fused_raw(maps, loc, g)
        return d_maps, jnp.stack([d_y, d_x], axis=-1)

    f.defvjp(fwd, bwd)
    return f


def gather_grad(maps, loc):
    """Differentiable fused gather (custom VJP: backward = splat + duals)."""
    return _gather_vjp((maps.shape[1], maps.shape[2]))(maps, loc)
