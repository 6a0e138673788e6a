from ._native import (
    connected_components,
    component_counts,
    largest_component,
    dti,
    skeletonize_3d,
    edt_with_indices,
    fill_holes,
    binary_dilation,
    binary_closing,
    box_convolve27,
    find_objects,
    native_available,
)

__all__ = [
    "connected_components",
    "component_counts",
    "largest_component",
    "dti",
    "skeletonize_3d",
    "edt_with_indices",
    "fill_holes",
    "binary_dilation",
    "binary_closing",
    "box_convolve27",
    "find_objects",
    "native_available",
]

# Higher-level layers (import submodules lazily to keep the scipy-only
# fallback path light): post.topology (the "Ours" tree parser),
# post.atm22 (the challenge parser), post.regrade (anatomical
# labeling), post.mesh (marching tetrahedra + STL), post.render
# (centerline/parse-map figures).
