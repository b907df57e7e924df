"""PyTorch checkpoint -> flax variables converter.

One-time converter for validating parity against the reference's released
checkpoints (SURVEY.md §7 build order step 1).  Handles the layout changes:

- Conv2d weight OIHW -> HWIO
- ConvTranspose2d weight IOHW -> HWOI (flax ``transpose_kernel=True``)
- Linear weight [out, in] -> [in, out]
- BatchNorm weight/bias -> params.scale/bias; running_mean/var -> batch_stats
- Conv1d(k=1) weight [out, in, 1] -> Dense [in, out]

The name mapping is rule-based: a list of (regex, template) pairs translates
torch module paths into flax paths.  Unmatched keys are returned so callers
can assert complete coverage.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_tensor(name: str, w: np.ndarray):
    """Transpose a tensor according to its role inferred from shape/name.

    The (2, 3, 1, 0) permutation covers both conv kinds: Conv2d OIHW ->
    HWIO, and ConvTranspose2d IOHW -> HWOI (the layout flax's
    ``transpose_kernel=True`` expects) — verified in tests/test_torch_parity.
    """
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:  # Conv1d k=1 -> Dense
        return np.transpose(w[..., 0], (1, 0))
    if w.ndim == 2:
        # nn.Embedding tables ([num_embeddings, dim] lookup tables, e.g.
        # CAMF's LearnedPositionalEncoding3D row/col_embed) are NOT linear
        # kernels — transposing a square 128x128 table would corrupt it
        # silently (caught by tests/test_reference_module_parity.py::
        # test_camf_glue_parity).
        if (name.endswith("_embed.weight") or ".embedding." in name
                or name.endswith("queries_long.weight")
                or name.endswith("queries_short.weight")):
            # lookup tables, not linear kernels (HoP's per-cell query
            # embeddings included)
            return w
        return np.transpose(w, (1, 0))
    return w


def convert_torch_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """Normalize a torch state_dict to numpy with flax layouts.

    Returns a flat dict {torch_name: converted_array}.  Name mapping into a
    specific flax tree is model-specific and layered on top (see
    ``assign_into_variables``).
    """
    out = {}
    for name, t in state_dict.items():
        w = _to_numpy(t)
        if name.endswith(".weight") and w.ndim >= 2:
            w = convert_tensor(name, w)
        out[name] = w
    return out


def assign_into_variables(variables, assignments: List[Tuple[Tuple[str, ...], np.ndarray]]):
    """Functionally set leaves of a flax variables dict.

    assignments: list of (path tuple like ('params', 'camera', ...), array).
    Shapes are checked; returns a new variables dict.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    for path, arr in assignments:
        if path not in flat:
            raise KeyError(f"no such flax variable: {'/'.join(path)}")
        if tuple(flat[path].shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{flat[path].shape} vs {arr.shape}"
            )
        flat[path] = arr.astype(flat[path].dtype)
    return flax.traverse_util.unflatten_dict(flat)
