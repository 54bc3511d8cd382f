"""User-extension registry (SURVEY §2.10).

The reference's extension surface is the ``CoordinateListFactory``
interface chosen by ``GeometryType`` plus the ``CurveSegmentType`` /
``SurfacePatchType`` enums with class-name→kind maps
(CurveCoordinateListFactory.java:50-62, SurfaceCoordinateListFactory.java:62-68);
new kinds are added as enum variants + map entries, unknown kinds raise
(CurveCoordinateListFactory.java:106-107).

The engine analog: string-keyed kernel registries consulted by the
geometry factories before they raise on an unknown kind.  A user UDF is
a plain callable over the descriptor — it runs inside the same
vectorized ``map_batches`` stages as the built-ins.

    from georay import registry

    def bezier_coords(seg, epsg, latlon):   # -> (N, 2) float64
        ...

    registry.register_segment_type("Bezier", bezier_coords, min_positions=4)
"""

from __future__ import annotations

from typing import Callable

import numpy as np

#: segment type -> kernel(seg_dict, epsg, latlon) -> (N,2) float64
SEGMENT_KERNELS: dict[str, Callable] = {}
#: curve kind -> kernel(geom_dict, epsg, latlon) -> (N,2) float64
CURVE_KIND_KERNELS: dict[str, Callable] = {}
#: surface patch kind -> kernel(patch_dict, epsg) -> exterior ring (N,2)
PATCH_KERNELS: dict[str, Callable] = {}


_BUILTIN_CURVE_KINDS = frozenset(
    {"LineString", "LinearRing", "Curve", "CompositeCurve", "OrientableCurve", "Ring"}
)
_BUILTIN_PATCH_KINDS = frozenset({"Polygon", "Rectangle", "Triangle"})
_BUILTIN_MIN_POSITIONS: frozenset | None = None


def _reject_builtin(name: str, builtins) -> None:
    if name in builtins:
        raise ValueError(
            f"cannot shadow builtin kind {name!r}: extensions add NEW kinds "
            "(the reference's enum+map registry raises on redefinition too, "
            "and overriding a builtin would silently break conformance parity)"
        )


def register_segment_type(name: str, fn: Callable, min_positions: int = 2) -> None:
    """Plug a new gml curve-segment kind into ``curve_coordinate_list``
    (C-04 dispatch).  ``min_positions`` feeds the G-09 validation table:
    the segment's INPUT ``coords`` (when present) must carry at least
    this many positions before the kernel runs."""
    global _BUILTIN_MIN_POSITIONS
    from georay.geom import curves

    if _BUILTIN_MIN_POSITIONS is None:
        _BUILTIN_MIN_POSITIONS = frozenset(curves.MIN_SEGMENT_POSITIONS)
    _reject_builtin(name, _BUILTIN_MIN_POSITIONS)
    SEGMENT_KERNELS[name] = fn
    curves.MIN_SEGMENT_POSITIONS[name] = int(min_positions)


def register_curve_kind(name: str, fn: Callable) -> None:
    """Plug a new curve container kind into the C-03 dispatch."""
    _reject_builtin(name, _BUILTIN_CURVE_KINDS)
    CURVE_KIND_KERNELS[name] = fn


def register_patch_kind(name: str, fn: Callable) -> None:
    """Plug a new surface patch kind into the C-14 dispatch."""
    _reject_builtin(name, _BUILTIN_PATCH_KINDS)
    PATCH_KERNELS[name] = fn


def unregister(name: str) -> None:
    from georay.geom import curves

    for table in (SEGMENT_KERNELS, CURVE_KIND_KERNELS, PATCH_KERNELS):
        table.pop(name, None)
    if _BUILTIN_MIN_POSITIONS is not None and name not in _BUILTIN_MIN_POSITIONS:
        curves.MIN_SEGMENT_POSITIONS.pop(name, None)


def snapshot() -> dict:
    """Picklable snapshot of every user registration, for replay inside
    Ray workers.  Workers import georay FRESH in separate processes, so
    kernels registered on the driver are otherwise absent when the
    geometry factories run inside distributed stages (ADVICE r2).
    Kernels travel by cloudpickle (Ray's serializer), so closures are
    fine; kernels must not capture unpicklable state."""
    from georay.geom import curves

    return {
        "segment": dict(SEGMENT_KERNELS),
        "curve": dict(CURVE_KIND_KERNELS),
        "patch": dict(PATCH_KERNELS),
        "min_positions": {k: curves.MIN_SEGMENT_POSITIONS[k] for k in SEGMENT_KERNELS},
    }


def restore(snap: dict) -> None:
    """Replay a :func:`snapshot` into this process's registry
    (idempotent; called by :func:`with_registry` wrappers inside
    workers)."""
    from georay.geom import curves

    SEGMENT_KERNELS.update(snap["segment"])
    CURVE_KIND_KERNELS.update(snap["curve"])
    PATCH_KERNELS.update(snap["patch"])
    curves.MIN_SEGMENT_POSITIONS.update(snap["min_positions"])


def with_registry(fn):
    """Wrap a ``map_batches`` callable so driver-side registrations are
    replayed in the worker before each batch (two dict updates — cheap
    relative to any batch's work).  No-op passthrough when nothing is
    registered, so built-in pipelines pay nothing."""
    snap = snapshot()
    if not (snap["segment"] or snap["curve"] or snap["patch"]):
        return fn

    def wrapped(batch, *args, **kwargs):
        restore(snap)
        return fn(batch, *args, **kwargs)

    return wrapped


def _coerce_coords(out) -> np.ndarray:
    arr = np.asarray(out, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError(f"extension kernel must return (N,2) coords, got {arr.shape}")
    return arr
