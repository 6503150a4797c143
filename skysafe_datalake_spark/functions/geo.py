"""Geospatial column expressions.

Semantics parity: Haversine great-circle distance with mean Earth
radius R=6371 km, matching the reference implementation
(``/root/reference/src/combine_spark.py:39-53``) and its golden tests
(``tests/test_haversine.py``: Paris–Lyon ∈ (380, 410) km,
Paris–Toulouse ∈ (575, 605) km, d(A,A)=0, symmetry).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Great-circle distance in km as a pure native expression.

    ``2·R·atan2(√a, √(1−a))`` with
    ``a = sin²(Δφ/2) + cos(φ1)·cos(φ2)·sin²(Δλ/2)``.

    Uses explicit multiplication (not ``pow``) so the expression is
    bit-for-bit reproducible against SQL oracles that write ``x*x``.
    """
    lat1, lon1, lat2, lon2 = map(_col, (lat1, lon1, lat2, lon2))
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    sin_dphi = F.sin(F.radians(lat2 - lat1) / 2)
    sin_dlmb = F.sin(F.radians(lon2 - lon1) / 2)
    a = sin_dphi * sin_dphi + F.cos(phi1) * F.cos(phi2) * sin_dlmb * sin_dlmb
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))


def grid_cell(lat: Column | str, lon: Column | str, cell_deg: float) -> Column:
    """Integer grid-cell id for geo bucketing.

    Scale path for nearest-neighbor joins when the right side is NOT
    broadcastable: equi-join candidate cells (cell + 8 neighbors)
    instead of a cross join, turning O(N·M) into O(N·candidates).
    """
    if not cell_deg > 0:
        raise ValueError(
            f"grid_cell needs cell_deg > 0; got {cell_deg!r} "
            "(zero divides, negative inverts the grid)"
        )
    lat, lon = _col(lat), _col(lon)
    # Row stride sized to the ACTUAL longitude cell count: a fixed
    # 100000 stride silently collides across latitude rows once
    # cell_deg < 0.0036 (360/cell_deg cells per row), corrupting
    # equi-join candidates with no error (round-9 review).
    stride = int(360.0 / cell_deg) + 2
    # Max key ≈ (180/cell_deg)·stride + 360/cell_deg must fit a signed
    # bigint or lat_i * stride silently wraps and distant cells alias
    # (the same sign-bit hazard zorder_key guards at bits*n <= 63) —
    # trips below cell_deg ≈ 3.6e-8, i.e. sub-millimeter cells.
    if (int(180.0 / cell_deg) + 2) * stride > (1 << 63) - 1:
        raise ValueError(
            f"grid_cell cell_deg={cell_deg!r} needs "
            f"~{int(180.0 / cell_deg) + 2} x {stride} cell ids — past "
            "a signed bigint; use a coarser cell_deg"
        )
    lat_i = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    lon_i = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    return (lat_i * F.lit(stride) + lon_i).alias("grid_cell")
