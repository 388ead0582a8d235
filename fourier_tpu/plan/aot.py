"""User-facing AOT compile/export: the ``static_fft`` deliverable.

The reference's ``#[static_fft(f32, N)]`` proc-macro runs the planner inside
the compiler and bakes the plan (twiddle tables, stage structure) into the
binary, so using the FFT involves zero planning at run time
(``fourier-macros/src/lib.rs:51-60``). The JAX-native equivalent:
``export_compiled`` runs the planner now, traces the jitted execute function
at the chosen shapes, and serializes the resulting StableHLO artifact with
``jax.export`` — the plan's constants are baked into the program.
``load_compiled`` replays the artifact with **zero planning and zero
tracing**: no plan object is reconstructed, no plan-time trigonometry or
plan-time inner FFTs run, and no Python transform code is traced.

Notes:

- The artifact records the lowering platform (cpu/tpu): export on the
  platform you will deploy on.
- Batch dimensions may be symbolic: pass strings in ``batch_shape`` (e.g.
  ``batch_shape=("b",)``) to export a batch-polymorphic artifact.
"""

from __future__ import annotations

import json
from typing import Sequence, Tuple

import numpy as np

from fourier_tpu.plan.base import FftPlan
from fourier_tpu.transform import Transform

_FORMAT_VERSION = 1


def _mode_key(mode: Transform) -> str:
    return Transform(mode).name.lower()


def export_compiled(
    plan: FftPlan,
    path: str,
    batch_shape: Sequence = (),
    modes: Sequence[Transform] = (Transform.FFT, Transform.IFFT),
) -> None:
    """AOT-compile `plan`'s planar execution and serialize it to `path`.

    One ``jax.export`` artifact per transform mode, over planar (re, im)
    inputs of shape ``(*batch_shape, plan.size)`` in the plan's real dtype.
    ``batch_shape`` entries may be ints (static) or strings (symbolic batch
    dims, e.g. ``("b",)``).
    """
    import jax
    from jax import export as jax_export

    dims = []
    for d in batch_shape:
        if isinstance(d, str):
            dims.append(jax_export.symbolic_shape(d)[0])
        else:
            dims.append(int(d))
    shape = tuple(dims) + (plan.size,)
    spec = jax.ShapeDtypeStruct(shape, plan.real_dtype)

    out = {}
    mode_names = []
    for mode in modes:
        mode = Transform(mode)

        def run(re, im, _mode=mode):
            return plan.transform_planar(re, im, _mode)

        exported = jax_export.export(jax.jit(run))(spec, spec)
        blob = exported.serialize()
        out[f"mlir_{_mode_key(mode)}"] = np.frombuffer(
            bytes(blob), dtype=np.uint8
        )
        mode_names.append(_mode_key(mode))

    meta = {
        "version": _FORMAT_VERSION,
        "size": int(plan.size),
        "real_dtype": np.dtype(plan.real_dtype).name,
        "batch_shape": [d if isinstance(d, str) else int(d) for d in batch_shape],
        "modes": mode_names,
        "plan_class": type(plan).__name__,
    }
    out["meta"] = np.frombuffer(json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez_compressed(f, **out)


class CompiledFft:
    """A loaded AOT artifact: executes with zero planning/tracing.

    Exposes the planar subset of the plan API (`transform_planar`,
    `fft_planar`, `ifft_planar`) for the modes it was exported with.
    """

    def __init__(self, size: int, real_dtype, modes, exported, meta):
        self.size = int(size)
        self.real_dtype = np.dtype(real_dtype)
        self.modes = tuple(modes)
        self._exported = exported  # mode key -> jax.export.Exported
        self.meta = meta

    def transform_planar(
        self, re, im, transform: Transform = Transform.FFT
    ) -> Tuple:
        key = _mode_key(transform)
        if key not in self._exported:
            raise ValueError(
                f"mode {Transform(transform).name} was not exported; "
                f"artifact has {sorted(self._exported)}"
            )
        return self._exported[key].call(re, im)

    def fft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.FFT)

    def ifft_planar(self, re, im):
        return self.transform_planar(re, im, Transform.IFFT)

    def __len__(self) -> int:
        return self.size


def load_compiled(path: str) -> CompiledFft:
    """Load an ``export_compiled`` artifact.

    No plan is reconstructed and nothing is traced: the StableHLO programs
    (with the plan's twiddle constants baked in) are deserialized and called
    directly.
    """
    from jax import export as jax_export

    with np.load(path, allow_pickle=False) as data:
        if "meta" not in data:
            raise ValueError("not a compiled-FFT artifact (missing meta)")
        meta = json.loads(bytes(data["meta"].tobytes()).decode("utf-8"))
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported compiled-FFT format version {meta.get('version')}"
            )
        exported = {}
        for key in meta["modes"]:
            exported[key] = jax_export.deserialize(
                bytearray(data[f"mlir_{key}"].tobytes())
            )
    return CompiledFft(
        meta["size"], meta["real_dtype"], meta["modes"], exported, meta
    )
