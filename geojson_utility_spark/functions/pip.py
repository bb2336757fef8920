"""Exact point-in-polygon — vectorized numpy ray casting.

This is the refinement half of the two-phase spatial join (SURVEY.md §2.3 "Exact PIP
refinement"): after the broadcast candidate join on cell ids, each (point, polygon)
candidate pair is resolved exactly here, inside Arrow-batched ``applyInPandas`` groups —
no per-row Python (BASELINE.json input_hint).

Boundary semantics: ``covers`` (boundary-inclusive), chosen and documented per SURVEY.md
§7 hard part (b) — a point exactly on a ring edge or vertex counts as inside.  The
even-odd crossing count is combined with an explicit on-edge test so the result is
deterministic for boundary points (plain ray casting is half-open and orientation-
dependent there).
"""

from __future__ import annotations

import numpy as np

_EDGE_EPS = 0.0  # exact arithmetic on doubles; on-edge means exactly collinear & within


def points_on_ring_edges(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """True where (px, py) lies exactly on a segment of ``ring``. (P,) bool."""
    x1 = ring[:-1, 0][None, :]
    y1 = ring[:-1, 1][None, :]
    x2 = ring[1:, 0][None, :]
    y2 = ring[1:, 1][None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    cross = (x2 - x1) * (pyc - y1) - (y2 - y1) * (pxc - x1)
    within = (
        (np.minimum(x1, x2) <= pxc)
        & (pxc <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= pyc)
        & (pyc <= np.maximum(y1, y2))
    )
    return ((np.abs(cross) <= _EDGE_EPS) & within).any(axis=1)


def points_in_ring(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray, boundary: str = "include"
) -> np.ndarray:
    """Even-odd ray cast of P points against one closed ring. (P,) bool.

    ring: (M, 2) (lon, lat) or (x, y); closed or open (closure enforced).
    boundary: 'include' -> covers semantics; 'exclude' -> strict interior.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 3:
        return np.zeros(px.shape[0], dtype=bool)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    x1 = ring[:-1, 0][None, :]
    y1 = ring[:-1, 1][None, :]
    x2 = ring[1:, 0][None, :]
    y2 = ring[1:, 1][None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    straddle = (y1 <= pyc) != (y2 <= pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
    inside = ((straddle & (pxc < xint)).sum(axis=1) % 2) == 1
    on_edge = points_on_ring_edges(px, py, ring)
    if boundary == "include":
        return inside | on_edge
    return inside & ~on_edge


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    boundary: str = "include",
) -> np.ndarray:
    """PIP against a polygon with holes: ring[0] = outer, rest = holes (even-odd).

    Mirrors the reference's normalized polygon contract — the reference *discards*
    holes (reference: backend/routers/catchment.py:100 takes ``coordinates[0]`` only),
    so engine polygons normally arrive as a single outer ring; holes are supported for
    the general GeoJSON case.
    """
    if not rings:
        return np.zeros(np.asarray(px).shape[0], dtype=bool)
    inside = points_in_ring(px, py, rings[0], boundary="exclude")
    on_outer = points_on_ring_edges(
        np.asarray(px, dtype=np.float64),
        np.asarray(py, dtype=np.float64),
        _closed(rings[0]),
    )
    for hole in rings[1:]:
        in_hole = points_in_ring(px, py, hole, boundary="exclude")
        on_hole_edge = points_on_ring_edges(
            np.asarray(px, dtype=np.float64),
            np.asarray(py, dtype=np.float64),
            _closed(hole),
        )
        if boundary == "include":
            inside &= ~(in_hole & ~on_hole_edge)
        else:
            inside &= ~(in_hole | on_hole_edge)
    if boundary == "include":
        inside |= on_outer
    return inside


def _closed(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return ring


def point_ring_distance_sq(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min squared euclidean (planar lon/lat) distance from each point to the ring's
    segments — used by kNN tie-breaking/top-k ordering. (P,) float64."""
    ring = _closed(ring)
    ax = ring[:-1, 0][None, :]
    ay = ring[:-1, 1][None, :]
    bx = ring[1:, 0][None, :]
    by = ring[1:, 1][None, :]
    pxc = np.asarray(px, dtype=np.float64)[:, None]
    pyc = np.asarray(py, dtype=np.float64)[:, None]
    dx = bx - ax
    dy = by - ay
    seg_len_sq = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((pxc - ax) * dx + (pyc - ay) * dy) / seg_len_sq
    t = np.nan_to_num(np.clip(t, 0.0, 1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = (pxc - cx) ** 2 + (pyc - cy) ** 2
    return d2.min(axis=1)


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance in km (public haversine formula)."""
    lat1, lon1, lat2, lon2 = (
        np.radians(np.asarray(v, dtype=np.float64)) for v in (lat1, lon1, lat2, lon2)
    )
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * 6371.0088 * np.arcsin(np.sqrt(a))
