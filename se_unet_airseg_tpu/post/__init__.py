from ._native import (
    connected_components,
    component_counts,
    largest_component,
    dti,
    skeletonize_3d,
    edt_with_indices,
    native_available,
)

__all__ = [
    "connected_components",
    "component_counts",
    "largest_component",
    "dti",
    "skeletonize_3d",
    "edt_with_indices",
    "native_available",
]
