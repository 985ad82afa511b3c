"""Torch-checkpoint → flax-params porting.

The reference distributes pretrained models as pickled torch modules
(reference ``utils/utils.py:9-61``, artifact ``model/data/model.pth``). This
module maps such a ``state_dict`` (as numpy arrays — no torch dependency
here) onto the parameter pytree of :class:`~.model.RecEVFlowNet`, converting
conv kernels from torch ``[out, in, kh, kw]`` to flax ``[kh, kw, in, out]``.

Reference module paths (``models/arch.py:210-213`` structure):
  ``arch.encoders.<i>.conv.conv2d``            → ``arch/encoder_<i>/conv/Conv_0``
  ``arch.encoders.<i>.recurrent_block.<gate>`` → ``arch/encoder_<i>/recurrent_block/<gate>``
  ``arch.resblocks.<j>.conv<k>``               → ``arch/resblock_<j>/conv<k>``
  ``arch.decoders.<i>.conv2d``                 → ``arch/decoder_<i>/conv/Conv_0``
  ``arch.preds.<i>.conv2d``                    → ``arch/pred_<i>/Conv_0``
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def _kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def torch_state_dict_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference RecEVFlowNet state_dict into flax params.

    :param state_dict: mapping of torch parameter names to numpy arrays.
    :return: flax ``params`` pytree (nested dicts with ``kernel`` / ``bias``).
    """
    params: Dict = {}

    def put(path, leaf, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = value

    patterns = [
        (
            re.compile(r"^arch\.encoders\.(\d+)\.conv\.conv2d\.(weight|bias)$"),
            lambda m: ("arch", f"encoder_{m.group(1)}", "conv", "Conv_0"),
        ),
        (
            re.compile(
                r"^arch\.encoders\.(\d+)\.recurrent_block\."
                r"(reset_gate|update_gate|out_gate)\.(weight|bias)$"
            ),
            lambda m: ("arch", f"encoder_{m.group(1)}", "recurrent_block", m.group(2)),
        ),
        (
            re.compile(r"^arch\.resblocks\.(\d+)\.(conv1|conv2)\.(weight|bias)$"),
            lambda m: ("arch", f"resblock_{m.group(1)}", m.group(2)),
        ),
        (
            re.compile(r"^arch\.decoders\.(\d+)\.conv2d\.(weight|bias)$"),
            lambda m: ("arch", f"decoder_{m.group(1)}", "conv", "Conv_0"),
        ),
        (
            re.compile(
                r"^arch\.decoders\.(\d+)\.transposed_conv2d\.(weight|bias)$"
            ),
            lambda m: ("arch", f"decoder_{m.group(1)}", "ConvTranspose_0"),
        ),
        (
            re.compile(r"^arch\.preds\.(\d+)\.conv2d\.(weight|bias)$"),
            lambda m: ("arch", f"pred_{m.group(1)}", "Conv_0"),
        ),
    ]

    for name, value in state_dict.items():
        value = np.asarray(value)
        for pat, to_path in patterns:
            m = pat.match(name)
            if m is None:
                continue
            leaf_name = name.rsplit(".", 1)[-1]
            if leaf_name == "weight":
                put(to_path(m), "kernel", _kernel(value))
            else:
                put(to_path(m), "bias", value)
            break
        else:
            raise KeyError(f"Unrecognized reference parameter: {name}")

    return params
