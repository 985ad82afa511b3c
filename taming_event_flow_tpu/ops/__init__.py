from .backend import set_warp_backend, get_warp_backend
from .precision import set_matmul_precision, get_matmul_precision
from .warp import (
    event_propagation,
    bilinear_sample,
    gather_values,
    splat_values,
    get_event_flow,
    purge_unfeasible,
    get_interpolation,
    interpolate,
    splat_bilinear,
    iwe_from_events,
    deblur_events,
    compute_pol_iwe,
)
from .encodings import (
    events_to_image,
    events_to_voxel,
    events_to_channels,
)

__all__ = [
    "set_warp_backend",
    "get_warp_backend",
    "set_matmul_precision",
    "get_matmul_precision",
    "event_propagation",
    "bilinear_sample",
    "gather_values",
    "splat_values",
    "get_event_flow",
    "purge_unfeasible",
    "get_interpolation",
    "interpolate",
    "splat_bilinear",
    "iwe_from_events",
    "deblur_events",
    "compute_pol_iwe",
    "events_to_image",
    "events_to_voxel",
    "events_to_channels",
]
