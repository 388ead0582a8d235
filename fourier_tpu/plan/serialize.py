"""Plan serialization: the ``static_fft`` analog.

The reference's compile-time planner (``fourier-macros/src/lib.rs:51-60``)
proves a plan is nothing but (stage structure, twiddle tables, work size) and
bakes it into the binary. In this framework plans are already immutable
pytrees of constants, so the same capability is a save/load of the pytree:
``save_plan`` writes the flattened array leaves plus a JSON description of the
static structure to an ``.npz``; ``load_plan`` reconstructs an identical plan
without re-running any plan-time trigonometry or plan-time FFTs. Combined
with ``jax.export`` AOT serialization of the jitted execute function (covered
in tests), this is the full trace-time/compile-time story.

Format (version 2): no pickle anywhere. The structure is a tagged JSON tree —
plan nodes name their class (resolved against an explicit allowlist registry,
so loading a file can only ever instantiate plan classes), tuple nodes carry
their encoded items, and array leaves are indices into the npz's ``leaf_<i>``
arrays. Static aux data is restricted to JSON scalars and (nested) tuples of
them. Files from the pickled v1 format are rejected with a clear error.
"""

from __future__ import annotations

import io
import json

import numpy as np

from fourier_tpu.plan.base import FftPlan

_FORMAT_VERSION = 2


def _plan_registry():
    """Explicit allowlist of reconstructable plan classes (name -> class)."""
    from fourier_tpu.parallel.sharded import (Fft2dPlan, Fft3dPlan,
                                               FourStepPlan, Rfft2dPlan,
                                               Rfft3dPlan)
    from fourier_tpu.plan.autosort import AutosortPlan
    from fourier_tpu.plan.bluestein import BluesteinPlan
    from fourier_tpu.plan.bluestein_fused import VpuBluesteinPlan
    from fourier_tpu.plan.four_step_local import FourStepLocalPlan
    from fourier_tpu.plan.mxu import MxuFftPlan
    from fourier_tpu.plan.vpu import VpuFftPlan
    from fourier_tpu.precision.dd_bluestein import VpuDdBluesteinPlan
    from fourier_tpu.precision.dd_mxu import DdMxuDirectPlan
    from fourier_tpu.precision.dd_plan import DdFftPlan
    from fourier_tpu.precision.dd_split import (DdSplitPow2Plan,
                                                DdSplitRadixPlan)
    from fourier_tpu.precision.vpu_dd_plan import VpuDdFftPlan
    from fourier_tpu.rfft import RfftPlan

    return {
        cls.__name__: cls
        for cls in (
            AutosortPlan,
            BluesteinPlan,
            FourStepLocalPlan,
            MxuFftPlan,
            VpuFftPlan,
            VpuBluesteinPlan,
            DdFftPlan,
            DdSplitPow2Plan,
            DdSplitRadixPlan,
            VpuDdBluesteinPlan,
            DdMxuDirectPlan,
            VpuDdFftPlan,
            FourStepPlan,
            Fft2dPlan,
            Fft3dPlan,
            Rfft2dPlan,
            Rfft3dPlan,
            RfftPlan,
        )
    }


def _encode_aux(value):
    """Static (treedef) data -> JSON: scalars pass through, tuples are tagged.

    A ``jax.sharding.Mesh`` (in sharded plans' aux) is encoded as its axis
    geometry only — device handles are a property of the running process, so
    ``load_plan`` rebinds a compatible mesh supplied by the caller.
    """
    from jax.sharding import Mesh

    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, (np.integer, np.floating)):
        return value.item()
    if isinstance(value, Mesh):
        return {
            "__mesh__": {
                "axis_names": list(value.axis_names),
                "shape": [int(s) for s in value.devices.shape],
            }
        }
    if isinstance(value, tuple):
        return {"__tuple__": [_encode_aux(v) for v in value]}
    raise TypeError(
        f"plan aux data of type {type(value).__name__} is not serializable; "
        "plan classes must keep static structure to scalars and tuples"
    )


def _decode_aux(value, mesh=None):
    if isinstance(value, dict) and "__mesh__" in value:
        want = value["__mesh__"]
        if mesh is None:
            raise ValueError(
                "this plan file contains a sharded plan; pass load_plan(..., "
                f"mesh=...) with axes {want['axis_names']} of shape "
                f"{want['shape']}"
            )
        if list(mesh.axis_names) != want["axis_names"] or [
            int(s) for s in mesh.devices.shape
        ] != want["shape"]:
            raise ValueError(
                f"provided mesh (axes {list(mesh.axis_names)}, shape "
                f"{list(mesh.devices.shape)}) does not match the plan's mesh "
                f"(axes {want['axis_names']}, shape {want['shape']})"
            )
        return mesh
    if isinstance(value, dict):
        return tuple(_decode_aux(v, mesh) for v in value["__tuple__"])
    return value


def _encode(node, registry, arrays):
    cls_name = type(node).__name__
    if cls_name in registry and type(node) is registry[cls_name]:
        children, aux = node.tree_flatten()
        return {
            "__plan__": cls_name,
            "aux": _encode_aux(tuple(aux)),
            "children": [_encode(c, registry, arrays) for c in children],
        }
    if isinstance(node, (tuple, list)):
        return {"__tuple__": [_encode(c, registry, arrays) for c in node]}
    if node is None:
        return None
    # Array leaf (jax or numpy).
    idx = len(arrays)
    arrays.append(np.asarray(node))
    return {"__leaf__": idx}


def _decode(node, registry, leaves, mesh=None):
    import jax

    if node is None:
        return None
    if "__plan__" in node:
        name = node["__plan__"]
        if name not in registry:
            raise ValueError(f"unknown plan class {name!r} in plan file")
        cls = registry[name]
        aux = _decode_aux(node["aux"], mesh)
        children = tuple(
            _decode(c, registry, leaves, mesh) for c in node["children"]
        )
        return cls.tree_unflatten(aux, children)
    if "__tuple__" in node:
        return tuple(
            _decode(c, registry, leaves, mesh) for c in node["__tuple__"]
        )
    return jax.numpy.asarray(leaves[node["__leaf__"]])


def _to_arrays(plan: FftPlan) -> dict:
    registry = _plan_registry()
    arrays: list = []
    structure = _encode(plan, registry, arrays)
    if not (isinstance(structure, dict) and "__plan__" in structure):
        raise TypeError(
            f"cannot serialize {type(plan).__name__}: not a registered plan "
            f"class (known: {sorted(registry)})"
        )
    out = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    out["structure"] = np.frombuffer(
        json.dumps(structure).encode("utf-8"), dtype=np.uint8
    )
    out["version"] = np.array([_FORMAT_VERSION])
    return out


def save_plan(plan: FftPlan, path: str) -> None:
    """Serialize a plan (any allowlisted plan class) to `path` (.npz)."""
    with open(path, "wb") as f:
        np.savez_compressed(f, **_to_arrays(plan))


def load_plan(path: str, mesh=None) -> FftPlan:
    """Reconstruct a plan saved by :func:`save_plan`.

    Safe on untrusted files: no pickle is involved — the file can only select
    classes from the explicit plan registry and provide their array leaves.

    Sharded plans (FourStepPlan / Fft2dPlan) store only their mesh geometry;
    pass ``mesh=`` with matching axis names and shape to rebind them to this
    process's devices.
    """
    with np.load(path, allow_pickle=False) as data:
        if "structure" not in data:
            raise ValueError(
                "unsupported plan file (pre-v2 pickled format or not a plan "
                "file); re-save with save_plan"
            )
        version = int(data["version"][0])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported plan format version {version}")
        structure = json.loads(bytes(data["structure"].tobytes()).decode("utf-8"))
        leaves = {}
        i = 0
        while f"leaf_{i}" in data:
            leaves[i] = data[f"leaf_{i}"]
            i += 1
    return _decode(structure, _plan_registry(), leaves, mesh)


def plan_to_bytes(plan: FftPlan) -> bytes:
    """In-memory variant of :func:`save_plan`."""
    buf = io.BytesIO()
    np.savez_compressed(buf, **_to_arrays(plan))
    return buf.getvalue()
