"""Warp-op backend policy: XLA (separable einsum / scatter) vs Pallas.

``auto`` (default) uses the fused Pallas kernels on TPU for maps beyond the
single-row-tile regime (> 16384 px — where the XLA fallback is a 25-65
M-updates/s scatter) and keeps the proven separable-MXU einsums for small
maps. ``pallas`` forces the fused kernels everywhere (they run interpreted
off-TPU); ``xla`` disables them.
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


def use_pallas(hw: int) -> bool:
    """Resolve the backend for a map of ``hw`` pixels (trace-time)."""
    if _backend == "pallas":
        return True
    if _backend == "xla":
        return False
    return (
        hw > SMALL_MAP_PX
        and jax.devices()[0].platform == "tpu"
    )


def use_separable(hw: int) -> bool:
    """Small-map regime: the separable MXU einsum formulation applies."""
    return hw <= SMALL_MAP_PX
