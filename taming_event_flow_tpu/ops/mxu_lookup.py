"""MXU-based gather/scatter: one-hot matmul lookups.

Measured on TPU v5e (honest, readback-synced): XLA's native scatter-add runs
at ~25-55 M updates/s and its gather at ~40-190 M points/s — two orders of
magnitude under HBM speed, and the dominant cost of both the contrast-max
training step and the eval warp pipeline. The MXU reformulation used here:

decompose each flat pixel index as ``idx = hi * 128 + lo`` and materialize
two *exact* one-hot factors ``V[e, hi]`` and ``U[e, lo]``. Then

  * gather:  ``out[e] = Σ_r Σ_c V[e,r] · U[e,c] · table[r,c]``
             = rowsum(U ⊙ (V @ table))           — one [M,128]@[128,128·C]
  * scatter: ``out[r,c] = Σ_e V[e,r] · w[e] · U[e,c]``
             = Vᵀ @ (w ⊙ U)                      — one [128,M]@[M,128] per C

Both are single MXU matmuls (plus cheap VPU one-hots), and their JAX
autodiff transposes are matmuls too — the whole warp/splat pipeline becomes
systolic-array work. Tables larger than 128·128 are processed in row-tiles
with hi-tile masking.

Numerics: one-hot and triangle factors are exact in every dtype used (0/1
and sub-unit fractions are bf16-representable). Contractions follow the
process matmul-precision policy (``ops/precision.py``): DEFAULT = single
bf16 MXU passes (values rounded to bf16 on the way through — what training
runs, parity-tested at the loss level), ``highest`` = f32 passes for
bit-closer parity. Callers doing EXACT lookups (not interpolation) must
pass ``precision=HIGHEST`` explicitly (``warp.py gather_pixels`` does).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .precision import get_matmul_precision as default_precision

_LANE = 128
_ROWS = 128
_TILE = _LANE * _ROWS  # 16384 pixels per row-tile


def _onehot(vals, size: int, dtype):
    """Exact one-hot along a new trailing axis (vals int32 >= 0)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1,) * vals.ndim + (size,), vals.ndim)
    return (vals[..., None] == iota).astype(dtype)


def gather_mxu(table, idx, precision=None):
    """``out[b, m] = table[b, idx[b, m]]`` via one-hot matmuls.

    :param table: ``[B, T]`` float values.
    :param idx: ``[B, M]`` int32; rows outside ``[0, n_tiles*16384)`` —
        including negatives — read 0 (``lo``/``hi`` wrap modulo the tile,
        but the per-tile mask zeroes every foreign tile id).
    :return: ``[B, M]``.
    """
    precision = precision or default_precision()
    b, t = table.shape
    n_tiles = -(-t // _TILE)
    pad = n_tiles * _TILE - t
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    tab = table.reshape(b, n_tiles, _ROWS, _LANE)

    lo = idx % _LANE
    hi = (idx // _LANE) % _ROWS
    tile = idx // _TILE

    u = _onehot(lo, _LANE, table.dtype)  # [B, M, 128]
    v = _onehot(hi, _ROWS, table.dtype)  # [B, M, 128]

    out = jnp.zeros(idx.shape, table.dtype)
    for k in range(n_tiles):
        w = jnp.einsum("bmr,brc->bmc", v, tab[:, k], precision=precision)
        val = jnp.sum(u * w, axis=-1)
        out = out + val * (tile == k).astype(table.dtype)
    return out


def splat_mxu(idx, weights, hw: int, precision=None):
    """Scatter-add ``out[b, idx[b, m], c] += weights[b, m, c]`` via matmuls.

    :param idx: ``[B, M]`` int32 in ``[0, hw)``.
    :param weights: ``[B, M, C]``.
    :return: ``[B, hw, C]``.
    """
    precision = precision or default_precision()
    b, m = idx.shape
    c = weights.shape[-1]
    n_tiles = -(-hw // _TILE)

    lo = idx % _LANE
    hi = (idx // _LANE) % _ROWS
    tile = idx // _TILE

    u = _onehot(lo, _LANE, weights.dtype)  # [B, M, 128]
    v = _onehot(hi, _ROWS, weights.dtype)  # [B, M, 128]

    tiles = []
    for k in range(n_tiles):
        if n_tiles == 1:
            w_k = weights
        else:
            w_k = weights * (tile == k).astype(weights.dtype)[..., None]
        chans = []
        for ch in range(c):
            uw = u * w_k[..., ch : ch + 1]  # [B, M, 128]
            chans.append(
                jnp.einsum("bmr,bmc->brc", v, uw, precision=precision)
            )
        tiles.append(jnp.stack(chans, axis=-1))  # [B, 128, 128, C]
    out = jnp.stack(tiles, axis=1).reshape(b, n_tiles * _TILE, c)
    return out[:, :hw]


# --------------------------------------------------------------- separable


def _axis_weights(coord, size: int, dtype):
    """Triangle (bilinear) weights of a fractional coordinate against every
    integer position of an axis: ``max(0, 1 - |coord - i|)``.

    Exactly the per-axis factor of the 4-tap bilinear stencil — taps outside
    ``[0, size)`` simply have no column, matching the reference's bounds
    masking (``utils/iwe.py:103-107``) and zero-padded ``grid_sample``.

    The triangle is computed in the coordinate dtype (f32) and only the
    FINISHED factor is cast to ``dtype``: casting the integer positions to
    bf16 instead would (a) corrupt weights on axes > 256 (bf16 integers are
    exact only up to 256) and (b) promote the subtraction — and thus the
    materialized factor — back to f32, silently doubling the HBM traffic
    the separable formulation is bound by.
    """
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * coord.ndim + (size,), coord.ndim
    ).astype(coord.dtype)
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - iota))
    return tri.astype(dtype)


def _factor_dtype(precision, dtype):
    """Materialize triangle/one-hot factors in bf16 under DEFAULT precision:
    the matmul would round them to bf16 anyway, and the separable ops are
    HBM-bound on exactly these [M, 128] factor tensors."""
    if (
        precision == jax.lax.Precision.DEFAULT
        and dtype == jnp.float32
        and jax.devices()[0].platform != "cpu"
    ):
        return jnp.bfloat16
    return dtype


def _axis_dweights(coord, size: int, dtype):
    """Derivative of the triangle factor w.r.t. the coordinate, matching
    jax autodiff of ``maximum(0, 1 - |d|)`` exactly (``d|d|/dd = +1`` at 0
    so tri'(0) = -1; the max tie at |d| = 1 gives ∓0.5)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * coord.ndim + (size,), coord.ndim
    ).astype(coord.dtype)
    d = coord[..., None] - iota
    a = jnp.abs(d)
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    mag = jnp.where(a < 1.0, 1.0, jnp.where(a == 1.0, 0.5, 0.0))
    return (-sign * mag).astype(dtype)


def _gather_separable_fwd_impl(img, loc, precision):
    h, w = img.shape[1], img.shape[2]
    fdt = _factor_dtype(precision, img.dtype)
    wy = _axis_weights(loc[..., 0], h, fdt)  # [B, M, H]
    wx = _axis_weights(loc[..., 1], w, fdt)  # [B, M, W]
    a = jnp.einsum(
        "bmw,bhw->bmh", wx, img.astype(fdt), precision=precision,
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(wy.astype(jnp.float32) * a, axis=-1).astype(img.dtype)


@functools.lru_cache(maxsize=None)
def _gather_separable_vjp(precision):
    @jax.custom_vjp
    def f(img, loc):
        return _gather_separable_fwd_impl(img, loc, precision)

    def fwd(img, loc):
        return f(img, loc), (img, loc)

    def bwd(resid, g):
        # Hand-written separable backward. XLA's autodiff materializes f32
        # factor-gradient tensors ([B, M, size] writes per factor) that made
        # the loss backward ~8x its forward (measured, B=8 train step);
        # here the dtri factors fuse into the reductions and only the two
        # contraction outputs a/b materialize.
        img, loc = resid
        h, w = img.shape[1], img.shape[2]
        fdt = _factor_dtype(precision, img.dtype)
        wy = _axis_weights(loc[..., 0], h, fdt)
        wx = _axis_weights(loc[..., 1], w, fdt)
        dwy = _axis_dweights(loc[..., 0].astype(jnp.float32), h, jnp.float32)
        dwx = _axis_dweights(loc[..., 1].astype(jnp.float32), w, jnp.float32)
        imgf = img.astype(fdt)
        a = jnp.einsum(
            "bmw,bhw->bmh", wx, imgf, precision=precision,
            preferred_element_type=jnp.float32,
        )
        b = jnp.einsum(
            "bmh,bhw->bmw", wy, imgf, precision=precision,
            preferred_element_type=jnp.float32,
        )
        gf = g.astype(jnp.float32)
        d_y = jnp.sum(dwy * a, axis=-1) * gf
        d_x = jnp.sum(dwx * b, axis=-1) * gf
        wyg = wy.astype(jnp.float32) * gf[..., None]
        d_img = jnp.einsum(
            "bmh,bmw->bhw", wyg.astype(fdt), wx, precision=precision,
            preferred_element_type=jnp.float32,
        ).astype(img.dtype)
        return d_img, jnp.stack([d_y, d_x], axis=-1).astype(loc.dtype)

    f.defvjp(fwd, bwd)
    return f


def bilinear_gather_separable(img, loc, precision=None):
    """Bilinear sampling as two dense contractions (small maps).

    ``out[e] = Σ_h Σ_w wy[e,h] · wx[e,w] · img[h,w]`` — the bilinear kernel
    factorizes per axis, so sampling M points from an ``[H, W]`` map is one
    ``[M,W]x[W,H]`` matmul + a masked row-reduction: pure MXU work instead
    of a serialized gather. Cost M·H·W MACs — use only for maps up to
    ~128x128 (the training resolution). Differentiable via a hand-written
    separable VJP (see ``_gather_separable_vjp``).

    :param img: ``[B, H, W]``.
    :param loc: ``[B, M, 2]`` fractional ``(y, x)``.
    :return: ``[B, M]``.
    """
    precision = precision or default_precision()
    return _gather_separable_vjp(precision)(img, loc)


def _gather_separable_multi_fwd_impl(maps, loc, precision):
    h, w = maps.shape[1], maps.shape[2]
    fdt = _factor_dtype(precision, maps.dtype)
    wy = _axis_weights(loc[..., 0], h, fdt)  # [B, M, H]
    wx = _axis_weights(loc[..., 1], w, fdt)  # [B, M, W]
    wy32 = wy.astype(jnp.float32)
    outs = []
    for c in range(maps.shape[-1]):
        a = jnp.einsum(
            "bmw,bhw->bmh", wx, maps[..., c].astype(fdt),
            precision=precision, preferred_element_type=jnp.float32,
        )
        outs.append(jnp.sum(wy32 * a, axis=-1))
    return jnp.stack(outs, axis=-1).astype(maps.dtype)


@functools.lru_cache(maxsize=None)
def _gather_separable_multi_vjp(precision):
    @jax.custom_vjp
    def f(maps, loc):
        return _gather_separable_multi_fwd_impl(maps, loc, precision)

    def fwd(maps, loc):
        return f(maps, loc), (maps, loc)

    def bwd(resid, g):
        # multi-channel separable backward: ONE factor build shared by all
        # channels (see _gather_separable_vjp for the single-channel story)
        maps, loc = resid
        h, w = maps.shape[1], maps.shape[2]
        fdt = _factor_dtype(precision, maps.dtype)
        wy = _axis_weights(loc[..., 0], h, fdt)
        wx = _axis_weights(loc[..., 1], w, fdt)
        dwy = _axis_dweights(loc[..., 0].astype(jnp.float32), h, jnp.float32)
        dwx = _axis_dweights(loc[..., 1].astype(jnp.float32), w, jnp.float32)
        wy32 = wy.astype(jnp.float32)
        d_y = 0.0
        d_x = 0.0
        d_maps = []
        for c in range(maps.shape[-1]):
            imgf = maps[..., c].astype(fdt)
            a = jnp.einsum(
                "bmw,bhw->bmh", wx, imgf, precision=precision,
                preferred_element_type=jnp.float32,
            )
            b = jnp.einsum(
                "bmh,bhw->bmw", wy, imgf, precision=precision,
                preferred_element_type=jnp.float32,
            )
            gc = g[..., c].astype(jnp.float32)
            d_y = d_y + jnp.sum(dwy * a, axis=-1) * gc
            d_x = d_x + jnp.sum(dwx * b, axis=-1) * gc
            wyg = (wy32 * gc[..., None]).astype(fdt)
            d_maps.append(
                jnp.einsum(
                    "bmh,bmw->bhw", wyg, wx, precision=precision,
                    preferred_element_type=jnp.float32,
                )
            )
        return (
            jnp.stack(d_maps, axis=-1).astype(maps.dtype),
            jnp.stack([d_y, d_x], axis=-1).astype(loc.dtype),
        )

    f.defvjp(fwd, bwd)
    return f


def bilinear_gather_separable_multi(maps, loc, precision=None):
    """Multi-channel :func:`bilinear_gather_separable`: factors built once
    and shared across channels.

    :param maps: ``[B, H, W, C]``.
    :param loc: ``[B, M, 2]`` fractional ``(y, x)``.
    :return: ``[B, M, C]``.
    """
    precision = precision or default_precision()
    return _gather_separable_multi_vjp(precision)(maps, loc)


def _splat_separable_fwd_impl(loc, values, res, precision):
    h, w = res
    dtype = values.dtype
    fdt = _factor_dtype(precision, dtype)
    wy = _axis_weights(loc[..., 0], h, fdt)  # [B, M, H]
    wx = _axis_weights(loc[..., 1], w, fdt)  # [B, M, W]
    chans = []
    for c in range(values.shape[-1]):
        wyv = wy * values[..., c : c + 1].astype(fdt)
        chans.append(
            jnp.einsum(
                "bmh,bmw->bhw", wyv, wx, precision=precision,
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.stack(chans, axis=-1).astype(dtype)


@functools.lru_cache(maxsize=None)
def _splat_separable_vjp(res, precision):
    @jax.custom_vjp
    def f(loc, values):
        return _splat_separable_fwd_impl(loc, values, res, precision)

    def fwd(loc, values):
        return f(loc, values), (loc, values)

    def bwd(resid, g):
        # separable backward without factor-gradient materialization (see
        # _gather_separable_vjp): per channel two contractions against the
        # cotangent image, dtri factors fused into the reductions
        loc, values = resid
        h, w = res
        fdt = _factor_dtype(precision, values.dtype)
        wy = _axis_weights(loc[..., 0], h, fdt)
        wx = _axis_weights(loc[..., 1], w, fdt)
        dwy = _axis_dweights(loc[..., 0].astype(jnp.float32), h, jnp.float32)
        dwx = _axis_dweights(loc[..., 1].astype(jnp.float32), w, jnp.float32)
        wy32 = wy.astype(jnp.float32)
        d_y = 0.0
        d_x = 0.0
        d_v = []
        for c in range(values.shape[-1]):
            gc = g[..., c].astype(fdt)
            a = jnp.einsum(
                "bmw,bhw->bmh", wx, gc, precision=precision,
                preferred_element_type=jnp.float32,
            )
            b = jnp.einsum(
                "bmh,bhw->bmw", wy, gc, precision=precision,
                preferred_element_type=jnp.float32,
            )
            vc = values[..., c].astype(jnp.float32)
            d_v.append(jnp.sum(wy32 * a, axis=-1))
            d_y = d_y + vc * jnp.sum(dwy * a, axis=-1)
            d_x = d_x + vc * jnp.sum(dwx * b, axis=-1)
        return (
            jnp.stack([d_y, d_x], axis=-1).astype(loc.dtype),
            jnp.stack(d_v, axis=-1).astype(values.dtype),
        )

    f.defvjp(fwd, bwd)
    return f


def bilinear_splat_separable(loc, values, res: Tuple[int, int],
                             precision=None):
    """Bilinear scatter-add as one dense matmul per channel (small maps).

    ``out[h,w,c] = Σ_e wy[e,h] · wx[e,w] · values[e,c]`` =
    ``(Wy ⊙ v_c)ᵀ @ Wx``. Replaces the 4-tap index expansion + XLA scatter
    (23-65 M updates/s measured) with MXU matmuls; numerics are identical to
    the reference stencil because the bilinear weight factorizes exactly.
    Differentiable via a hand-written separable VJP.

    :param loc: ``[B, M, 2]`` fractional ``(y, x)`` (already purged).
    :param values: ``[B, M, C]`` per-event channel values (masked weights).
    :return: ``[B, H, W, C]``.
    """
    precision = precision or default_precision()
    return _splat_separable_vjp(tuple(res), precision)(loc, values)
