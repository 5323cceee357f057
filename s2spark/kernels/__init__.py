"""Vectorized numpy kernels (uint64 cell ids, float64 geometry).

These are the engine's compute core: every function takes numpy
arrays and returns numpy arrays, so pandas UDFs wrap them with zero
per-row Python. Semantics anchored to s2sphere ``sphere.py`` symbols
(SURVEY.md §2.1–§2.4).
"""

from s2spark.kernels.hilbert import (  # noqa: F401
    MAX_LEVEL,
    MAX_SIZE,
    cell_id_to_lat_lng,
    lat_lng_to_cell_id,
    to_face_ij,
)
