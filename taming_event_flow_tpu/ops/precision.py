"""Process-global matmul precision for the warp/splat lookup ops.

The separable/one-hot MXU formulations (``ops/mxu_lookup.py``) are exact in
f32 but run ~2x faster with bf16 MXU passes (measured on the 10-pass train
step: 180 -> 89 ms, loss identical to 2e-6). The mode is a *compute policy*,
not a per-call argument, so it lives here as a module global — set once at
startup from the YAML config (``loss.matmul_precision``) by the CLI entry
points; never read from the environment inside traced code.
"""

from __future__ import annotations

import jax

_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_current = jax.lax.Precision.DEFAULT


def set_matmul_precision(name: str) -> None:
    """Set the global lookup-op matmul precision.

    :param name: ``"default"`` (bf16 MXU passes — fast, loss-equivalent),
        ``"high"``, or ``"highest"`` (~f32 — strict reference parity).
    """
    global _current
    key = str(name).lower()
    if key not in _NAMES:
        raise ValueError(
            f"Unknown matmul precision {name!r}; pick from {sorted(_NAMES)}"
        )
    _current = _NAMES[key]


def get_matmul_precision() -> jax.lax.Precision:
    """Current lookup-op matmul precision (read at trace time)."""
    return _current
