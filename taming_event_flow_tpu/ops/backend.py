"""Warp-op backend policy: XLA (separable einsum / patch gather / scatter)
vs Pallas.

Measured on TPU v5e (readback-synced, scripts/bench_pallas.py &
bench_route_probe.py):

  * maps ≤ one 128x128 row-tile (training scale): the separable MXU einsums
    win for both directions.
  * large-map SPLATS (DSEC 480x640): the fused Pallas kernel is ~3.4x the
    XLA 4-tap scatter (60 vs 18 Mval/s at 307k points).
  * large-map GATHERS: the packed-patch row gather (``warp.py`` —
    one take_along_axis over a per-pixel [H*W, 4C] patch table) wins
    outright: TPU gathers are row-rate bound (~180-320 M rows/s regardless
    of row width), so one patch row beats 4 x C tap gathers 3.8x at the
    DSEC update shape (635k pts: 15.1 -> 4.0 ms) and also beats the dense
    VMEM-factor Pallas kernel's small-M regime (32k pts: 1.87 ms dense vs
    ~0.6 ms patch). It is plain XLA (GSPMD-partitionable), so the
    event-sharded eval path keeps it too.

``auto`` (default) applies exactly that table. ``pallas`` forces the fused
kernels everywhere (interpreted off-TPU — used by equivalence tests);
``xla`` disables them.
"""

from __future__ import annotations

import jax

SMALL_MAP_PX = 16384  # one 128x128 MXU row-tile (mxu_lookup._TILE)

_backend = "auto"


def set_warp_backend(name: str) -> None:
    global _backend
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(f"Unknown warp backend {name!r}")
    _backend = name


def get_warp_backend() -> str:
    return _backend


def use_pallas(hw: int, n_channels: int = 1) -> bool:
    """Resolve the SPLAT backend for a map of ``hw`` pixels (trace-time).

    Gathers never consult this: they always use the packed-patch row
    gather (warp.py) — measured faster than both the dense VMEM-factor
    kernel and the 4-tap path at every probed point count.
    """
    if _backend == "pallas":
        return True
    if _backend == "xla":
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    # small-map splats: the separable einsum materializes a per-channel
    # [B, M, size] factor product; at C >= 4 (the fused IWE shape) the
    # VMEM-factor Pallas kernel wins (B=8 M=61440: fwd 2.24 vs 3.58 ms,
    # vjp 3.26 vs 4.88 — scripts/bench_pallas.py trainscale)
    return hw > SMALL_MAP_PX or n_channels >= 4


def use_separable(hw: int) -> bool:
    """Small-map regime: the separable MXU einsum formulation applies."""
    return hw <= SMALL_MAP_PX
