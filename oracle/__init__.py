"""Single-node NumPy reference oracle (no Spark).

Reimplements the reference's query semantics exactly (SURVEY.md §2) as the
parity target for every engine path.  Stands in for the C++ binary — the
reference's own validation mode compares competitors against a trusted
full-scan/grid oracle the same way (src/main.cpp:193-255).
"""

from .oracle import (
    haversine_m,
    knn_euclidean,
    pip_counts,
    pip_pairs,
    point_lookup,
    range_count,
    range_materialize,
    ray_cast_inside,
)

__all__ = [
    "range_count", "range_materialize", "point_lookup", "haversine_m",
    "ray_cast_inside", "pip_counts", "pip_pairs", "knn_euclidean",
]
