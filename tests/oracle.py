"""Torch-reference oracle helpers for numerical-parity tests.

Imports the read-only reference implementation (``/root/reference``) purely
as a *test oracle*: our JAX ops are developed independently, and these
helpers let the tests assert numerical agreement on random inputs. All use is
gated — tests skip when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

_available = os.path.isdir(REFERENCE)
if _available and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

requires_reference = pytest.mark.skipif(
    not _available, reason="reference checkout not available"
)


def shim_reference_deps():
    """Stub optional reference deps (hdf5plugin, progress) that the bare
    image lacks; the code paths the tests drive never use them."""
    import sys
    import types

    if "hdf5plugin" not in sys.modules:
        mod = types.ModuleType("hdf5plugin")
        mod.Zstd = lambda *a, **k: {}
        sys.modules["hdf5plugin"] = mod
    if "mlflow" not in sys.modules:
        try:
            import mlflow  # noqa: F401
        except ImportError:
            mod = types.ModuleType("mlflow")
            sys.modules["mlflow"] = mod
    if "progress" not in sys.modules:
        pkg = types.ModuleType("progress")
        bar = types.ModuleType("progress.bar")

        class Bar:  # minimal stand-in
            def __init__(self, *a, **k):
                pass

            def next(self):
                pass

            def finish(self):
                pass

        bar.Bar = Bar
        pkg.bar = bar
        sys.modules["progress"] = pkg
        sys.modules["progress.bar"] = bar


def torch_from(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def to_np(t):
    return t.detach().cpu().numpy()


def flow_map_to_torch(flow_nhwc):
    """[B,H,W,2] (x,y last-dim) -> torch [B,2,H,W] (c0=x, c1=y)."""
    return torch_from(np.moveaxis(np.asarray(flow_nhwc), -1, 1))


def iwe_to_np(torch_iwe):
    """torch [B,C,H,W] -> numpy [B,H,W,C]."""
    return np.moveaxis(to_np(torch_iwe), 1, -1)
