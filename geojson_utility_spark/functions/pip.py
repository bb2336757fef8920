"""Exact point-in-polygon — vectorized numpy ray casting, cache-blocked.

This is the refinement half of the two-phase spatial join (SURVEY.md §2.3 "Exact PIP
refinement"): after the broadcast candidate join on cell ids, each (point, polygon)
candidate pair is resolved exactly here, inside Arrow-batched ``applyInPandas`` groups —
no per-row Python (BASELINE.json input_hint).

Boundary semantics: ``covers`` (boundary-inclusive), chosen and documented per SURVEY.md
§7 hard part (b) — a point exactly on a ring edge or vertex counts as inside.  The
even-odd crossing count is combined with an explicit on-edge test so the result is
deterministic for boundary points (plain ray casting is half-open and orientation-
dependent there).

Performance: the kernel is FUSED (crossing count + on-edge test in one pass) and
CHUNKED (points processed in blocks sized so the point-x-edge temporaries stay inside
the CPU cache).  A naive full-matrix formulation allocates ~15 P-x-E float64
temporaries — 200 MB each at P=1e6 — and becomes memory-bandwidth-bound, killing
multi-core scaling (32 executor threads saturate DRAM and run no faster than 8).
The blocked kernel is ~6x faster single-core and scales with cores.
"""

from __future__ import annotations

import numpy as np

_BLOCK = 16384  # points per block: 16k x 64 edges x 8 B ≈ 8 MB of temporaries


def _closed(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return ring


class RingKernel:
    """Precomputed per-edge data for one ring — built once per polygon group, reused
    across point blocks."""

    def __init__(self, ring: np.ndarray):
        ring = _closed(ring)
        self.x1 = ring[:-1, 0].copy()
        self.y1 = ring[:-1, 1].copy()
        self.x2 = ring[1:, 0].copy()
        self.y2 = ring[1:, 1].copy()
        dx = self.x2 - self.x1
        dy = self.y2 - self.y1
        with np.errstate(divide="ignore", invalid="ignore"):
            self.slope = np.where(dy != 0.0, dx / np.where(dy == 0.0, 1.0, dy), 0.0)
        self.dx = dx
        self.dy = dy
        self.exmin = np.minimum(self.x1, self.x2)
        self.exmax = np.maximum(self.x1, self.x2)
        self.eymin = np.minimum(self.y1, self.y2)
        self.eymax = np.maximum(self.y1, self.y2)

    def test_block(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(strict_inside, on_edge) for one block of points — single fused pass."""
        pxc = px[:, None]
        pyc = py[:, None]
        # crossing count (half-open rule: y1 <= py != y2 <= py)
        straddle = (self.y1 <= pyc) != (self.y2 <= pyc)
        xint = self.x1 + (pyc - self.y1) * self.slope
        inside = ((straddle & (pxc < xint)).sum(axis=1) & 1).astype(bool)
        # exact on-edge: collinear and within the edge bbox
        cross = self.dx * (pyc - self.y1) - self.dy * (pxc - self.x1)
        on_edge = (
            (cross == 0.0)
            & (pxc >= self.exmin)
            & (pxc <= self.exmax)
            & (pyc >= self.eymin)
            & (pyc <= self.eymax)
        ).any(axis=1)
        return inside, on_edge


def _ring_tests(px, py, ring) -> tuple[np.ndarray, np.ndarray]:
    px = np.ascontiguousarray(px, dtype=np.float64)
    py = np.ascontiguousarray(py, dtype=np.float64)
    n = px.shape[0]
    kern = RingKernel(ring)
    inside = np.empty(n, dtype=bool)
    on_edge = np.empty(n, dtype=bool)
    for s in range(0, n, _BLOCK):
        e = min(s + _BLOCK, n)
        ins, edg = kern.test_block(px[s:e], py[s:e])
        inside[s:e] = ins
        on_edge[s:e] = edg
    return inside, on_edge


def points_on_ring_edges(px, py, ring) -> np.ndarray:
    """True where (px, py) lies exactly on a segment of ``ring``. (P,) bool."""
    return _ring_tests(px, py, ring)[1]


def points_in_ring(px, py, ring, boundary: str = "include") -> np.ndarray:
    """Even-odd ray cast of P points against one closed ring. (P,) bool.

    ring: (M, 2) (lon, lat) or (x, y); closed or open (closure enforced).
    boundary: 'include' -> covers semantics; 'exclude' -> strict interior.
    """
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 3:
        return np.zeros(np.asarray(px).shape[0], dtype=bool)
    inside, on_edge = _ring_tests(px, py, ring)
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
    so engine polygons normally arrive as a single outer ring (fast path: one fused
    pass); holes are supported for the general GeoJSON case.
    """
    if not rings:
        return np.zeros(np.asarray(px).shape[0], dtype=bool)
    inside, on_outer = _ring_tests(px, py, rings[0])
    if len(rings) == 1:
        if boundary == "include":
            return inside | on_outer
        return inside & ~on_outer
    result = inside & ~on_outer  # strict interior of outer ring
    for hole in rings[1:]:
        in_hole, on_hole = _ring_tests(px, py, hole)
        if boundary == "include":
            result &= ~(in_hole & ~on_hole)
        else:
            result &= ~(in_hole | on_hole)
    if boundary == "include":
        result |= on_outer
    return result


def point_ring_distance_sq(px, py, ring) -> np.ndarray:
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
