"""Warp-op backend policy: XLA (separable einsum / taps / scatter) vs Pallas.

Measured on TPU v5e (readback-synced, scripts/bench_pallas.py &
bench_route_probe.py):

  * maps ≤ one 128x128 row-tile (training scale): the separable MXU einsums
    win for both directions.
  * large-map SPLATS (DSEC 480x640): the fused Pallas kernel is ~3.4x the
    XLA 4-tap scatter (60 vs 18 Mval/s at 307k points).
  * large-map GATHERS split by point count: the dense VMEM-factor Pallas
    kernel (MXU-native layout, 8k-event chunks) is ~2x the 4-tap row-gather
    at small M (32k pts at 480x640: 1.87 vs 3.45 ms — the eval bw-scan
    shape) and matches it at large M (85-89 Mval/s both at 307-327k). Taps
    stay the big-M default because they are GSPMD-partitionable (the
    event-sharded eval path relies on that; it forces the xla backend).

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


def use_pallas(hw: int, for_gather: bool = False,
               n_channels: int = 1, n_points: int = 0) -> bool:
    """Resolve the backend for a map of ``hw`` pixels (trace-time)."""
    if _backend == "pallas":
        return True
    if _backend == "xla":
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    if for_gather:
        # large-map gathers: the dense VMEM-factor kernel beats the 4-tap
        # row-gather 2x at small point counts (M=32k: 1.87 vs 3.45 ms at
        # 480x640 — the eval bw-scan shape) and matches it at large M
        # (85-89 Mval/s both at 307-327k); keep taps for big M so the
        # GSPMD-shardable formulation stays on the multi-chip eval path
        return hw > SMALL_MAP_PX and 0 < n_points <= 65536
    # small-map splats: the separable einsum materializes a per-channel
    # [B, M, size] factor product; at C >= 4 (the fused IWE shape) the
    # VMEM-factor Pallas kernel wins (B=8 M=61440: fwd 2.24 vs 3.58 ms,
    # vjp 3.26 vs 4.88 — scripts/bench_pallas.py trainscale)
    return hw > SMALL_MAP_PX or n_channels >= 4


def use_separable(hw: int) -> bool:
    """Small-map regime: the separable MXU einsum formulation applies."""
    return hw <= SMALL_MAP_PX
