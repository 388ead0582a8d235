"""Plan serialization: the ``static_fft`` analog.

The reference's compile-time planner (``fourier-macros/src/lib.rs:51-60``)
proves a plan is nothing but (stage structure, twiddle tables, work size) and
bakes it into the binary. In this framework plans are already immutable
pytrees of constants, so the same capability is a save/load of the pytree:
``save_plan`` writes the flattened leaves plus the pickled treedef (which
carries every static field) to an ``.npz``; ``load_plan`` reconstructs an
identical plan without re-running any plan-time trigonometry or plan-time
FFTs. Combined with ``jax.export`` AOT serialization of the jitted execute
function (covered in tests), this is the full trace-time/compile-time story.
"""

from __future__ import annotations

import io
import pickle

import jax
import numpy as np

from fourier_tpu.plan.base import FftPlan

_FORMAT_VERSION = 1


def save_plan(plan: FftPlan, path: str) -> None:
    """Serialize a plan (any registered-pytree plan class) to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["treedef"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    arrays["version"] = np.array([_FORMAT_VERSION])
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_plan(path: str) -> FftPlan:
    """Reconstruct a plan saved by :func:`save_plan`."""
    with np.load(path, allow_pickle=False) as data:
        version = int(data["version"][0])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported plan format version {version}")
        treedef = pickle.loads(data["treedef"].tobytes())
        leaves = []
        i = 0
        while f"leaf_{i}" in data:
            leaves.append(jax.numpy.asarray(data[f"leaf_{i}"]))
            i += 1
    return jax.tree_util.tree_unflatten(treedef, leaves)


def plan_to_bytes(plan: FftPlan) -> bytes:
    """In-memory variant of :func:`save_plan`."""
    buf = io.BytesIO()
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["treedef"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    arrays["version"] = np.array([_FORMAT_VERSION])
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()
