from .validation import (
    ValConfig,
    IterativeValidation,
    LinearValidation,
    compute_fwl,
    compute_rsat,
    compute_rsat_fwl,
    compute_aee,
    METRIC_REGISTRY,
)

__all__ = [
    "ValConfig",
    "IterativeValidation",
    "LinearValidation",
    "compute_fwl",
    "compute_rsat",
    "compute_rsat_fwl",
    "compute_aee",
    "METRIC_REGISTRY",
]
