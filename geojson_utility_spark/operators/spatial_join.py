"""The flagship two-phase spatial join: broadcast cell-candidate join + exact PIP refine.

Semantics: ``points JOIN polygons ON ST_Covers(polygon, point)`` — the Spark-native
re-expression of the reference's per-row enrichment join (SURVEY.md §2.3; the reference
fetches one polygon per point over HTTPS; we invert it into a set-oriented join).

Physical plan, designed for 10^12 points vs ~10^5 polygons:

1. **Polygon side (small)**: parse + validate + normalize each GeoJSON document in
   ``mapInPandas`` batches; cover each polygon via ADAPTIVE QUADTREE DESCENT —
   O(perimeter) tiles per level, every cell classified interior vs boundary
   (conservative covering — superset, no false negatives).
2. **Point side (huge)**: cell assignment is a pure Catalyst expression
   (functions/spark_geo.py) — stays inside whole-stage codegen, columns pruned to
   (id, lat, lon), predicate pushdown unaffected.  With a compacted (multi-zoom)
   cover, ancestors come from bit-shift expressions + one posexplode; with an
   uncompacted cover the point table is scanned exactly ONCE with a single probe.
3. **Candidate join**: ``points.join(broadcast(cover), 'cell')`` — broadcast hash
   join, ZERO shuffle of the trillion-row side.
4. **Interior short-circuit**: points landing in fully-interior cover cells are
   matches with NO refinement and never cross the Python boundary (which costs a JVM
   feeder thread + a Python worker per task — the scarcest resource of the join).
   Only the O(perimeter) boundary band is refined.
5. **Refine** (three strategies, see ``spatial_join``):
   'broadcast' (default) — rings broadcast, zero-shuffle ``mapInArrow`` ray cast over
   cache-blocked numpy kernels; 'cogroup' — salted shuffle for unbroadcastable polygon
   sets (SURVEY.md §4 skew treatment); 'expr' — pure-Catalyst aggregate expression
   (no Python at all; slower per row, useful when Python workers are unavailable).

At 1000 executors: everything through refine is map-only — the join's only exchanges
hash-partition the tiny polygon side.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_utility_spark.functions import cells as C
from geojson_utility_spark.functions import geometry as G
from geojson_utility_spark.functions import pip as P
from geojson_utility_spark.functions.spark_geo import cell_expr, cell_parent_expr

DEFAULT_JOIN_ZOOM = 16  # finest boundary-cell zoom (~600 m tiles ≈ H3 res 9).
# Interior cells stay coarse (adaptive cover), so a fine max zoom shrinks the
# boundary band that needs Python ray-casting ~4x per level at O(perimeter) cover cost.

POLYGON_NORM_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.StringType()),
        T.StructField("ring_json", T.StringType()),  # normalized outer ring [[lon,lat]..]
        T.StructField("holes_json", T.StringType()),  # "[]" unless keep_holes=True
        T.StructField("poly_errors", T.StringType()),
        T.StructField("n_vertices", T.IntegerType()),
        T.StructField("area", T.DoubleType()),
    ]
)

COVER_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.StringType()),
        T.StructField("cell", T.LongType()),
        T.StructField("cell_zoom", T.IntegerType()),
        T.StructField("interior", T.BooleanType()),
    ]
)


def normalize_polygons(polygons: DataFrame, keep_holes: bool = False) -> DataFrame:
    """geojson string column -> validated, winding-normalized outer rings.

    Invalid polygons are retained with ``poly_errors`` set (filter-that-annotates, same
    contract as row validation) — callers filter ``poly_errors == ''`` for the join.

    keep_holes=False (default) reproduces the reference's contract — interior rings
    are DISCARDED (reference: backend/routers/catchment.py:100 takes coordinates[0]
    only) and ``holes_json`` is "[]".  keep_holes=True validates and carries interior
    rings (RFC 7946 winding: CCW outer, CW holes) for the hole-aware even-odd PIP.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for pid, gj in zip(pdf["polygon_id"], pdf["geojson"]):
                if keep_holes:
                    rings, err = G.normalize_polygon_rings(gj)
                    if err:
                        rows.append((pid, None, None, err, None, None))
                        continue
                    arr = np.asarray(rings[0], dtype=np.float64)
                    rows.append(
                        (
                            pid,
                            json.dumps(rings[0]),
                            json.dumps(rings[1:]),
                            "",
                            int(arr.shape[0]),
                            abs(G.signed_area(arr)),
                        )
                    )
                    continue
                norm, err = G.normalize_polygon_geojson(gj)
                if err:
                    rows.append((pid, None, None, err, None, None))
                else:
                    ring = G.extract_outer_ring(norm)
                    arr = np.asarray(ring, dtype=np.float64)
                    rows.append(
                        (
                            pid,
                            json.dumps(ring),
                            "[]",
                            "",
                            int(arr.shape[0]),
                            abs(G.signed_area(arr)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "polygon_id", "ring_json", "holes_json",
                    "poly_errors", "n_vertices", "area",
                ],
            )

    spark = polygons.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        polygons.select("polygon_id", "geojson")
        .repartition(n_part, "polygon_id")
        .mapInPandas(batches, POLYGON_NORM_SCHEMA)
    )


def polygon_cover(
    polygons: DataFrame,
    zoom: int = DEFAULT_JOIN_ZOOM,
    compact: bool = False,
    min_zoom: int | None = None,
) -> DataFrame:
    """(polygon_id, cell, cell_zoom, interior) covering rows for valid polygons.

    ``compact=True`` keeps the multi-zoom adaptive cover (bounds cover size for
    oversized polygons, point side multi-probes per zoom); ``compact=False`` expands
    everything to ``zoom`` (single probe, bigger broadcast).  ``min_zoom`` (with
    compact=True) partially uncompacts: cells coarser than min_zoom expand to
    min_zoom, capping the number of probe levels at ``zoom - min_zoom + 1`` while the
    boundary band stays at the fine ``zoom``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_pid, out_cell, out_zoom, out_int = [], [], [], []
            holes_col = (
                pdf["holes_json"]
                if "holes_json" in pdf.columns
                else pd.Series([None] * len(pdf))
            )
            for pid, rj, hj in zip(pdf["polygon_id"], pdf["ring_json"], holes_col):
                if rj is None:
                    continue
                ring = np.asarray(json.loads(rj), dtype=np.float64)
                # adaptive quadtree descent: O(perimeter) work per level, emits an
                # already-compacted multi-zoom cover (oversized polygons stay cheap)
                # with per-cell interior/boundary classification
                cover, interior = C.polygon_to_cells_adaptive(
                    ring, zoom, return_interior=True
                )
                expand_to = zoom if not compact else min_zoom
                if expand_to is not None:
                    zs0 = C.unpack_cell(cover)[0]
                    coarse = zs0 < expand_to
                    if coarse.any():
                        parts = [
                            (C.cell_to_children(int(c), expand_to), bool(i))
                            for c, i in zip(
                                cover[coarse].tolist(), interior[coarse].tolist()
                            )
                        ]
                        cover = np.concatenate(
                            [cover[~coarse]] + [p[0] for p in parts]
                        )
                        interior = np.concatenate(
                            [interior[~coarse]]
                            + [np.full(len(p[0]), p[1], dtype=bool) for p in parts]
                        )
                # hole-aware demotion: an "interior" classification only consults
                # the OUTER ring — any cell whose bbox touches a hole's bbox must
                # fall back to the boundary (refine) path, where the even-odd PIP
                # handles the hole exactly.  Conservative (bbox-vs-bbox) and cheap;
                # cells fully inside a hole simply refine to zero matches.
                holes = json.loads(hj) if hj else []
                if holes and interior.any():
                    w_, s_, e_, n_ = C.cell_bounds(cover)
                    demote = np.zeros(len(cover), dtype=bool)
                    for hole in holes:
                        h = np.asarray(hole, dtype=np.float64)
                        hw, hs = h[:, 0].min(), h[:, 1].min()
                        he, hn = h[:, 0].max(), h[:, 1].max()
                        demote |= (w_ <= he) & (e_ >= hw) & (s_ <= hn) & (n_ >= hs)
                    interior = interior & ~demote
                zs = C.unpack_cell(cover)[0]
                out_pid.extend([pid] * len(cover))
                out_cell.extend(cover.tolist())
                out_zoom.extend(zs.tolist())
                out_int.extend(interior.tolist())
            yield pd.DataFrame(
                {
                    "polygon_id": out_pid,
                    "cell": pd.array(out_cell, dtype="int64"),
                    "cell_zoom": pd.array(out_zoom, dtype="int32"),
                    "interior": pd.array(out_int, dtype="bool"),
                }
            )

    valid = polygons.filter(F.col("poly_errors") == "")
    # spread cover computation across the cluster — a handful of driver-side input
    # partitions would serialize the per-polygon covering work
    spark = polygons.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return valid.repartition(n_part, "polygon_id").mapInPandas(batches, COVER_SCHEMA)


def _refine_cogroup(cand: pd.DataFrame, rings: pd.DataFrame) -> pd.DataFrame:
    """Exact PIP for one (polygon, salt) cogroup — vectorized ray cast, covers
    semantics (boundary-inclusive).  ``cand`` holds the candidate points, ``rings``
    exactly one replicated ring row."""
    if cand.empty or rings.empty:
        return pd.DataFrame({"point_id": [], "lat": [], "lon": [], "poly_idx": []})
    poly = [np.asarray(json.loads(rings["ring_json"].iloc[0]), dtype=np.float64)]
    if "holes_json" in rings.columns:
        poly += [
            np.asarray(h, dtype=np.float64)
            for h in json.loads(rings["holes_json"].iloc[0] or "[]")
        ]
    inside = P.points_in_polygon(
        cand["lon"].to_numpy(np.float64), cand["lat"].to_numpy(np.float64), poly
    )
    return cand.loc[inside, ["point_id", "lat", "lon", "poly_idx"]]


class PreparedPolygons:
    """A reusable polygon-side index: normalized rings + multi-zoom cover +
    dense-id broadcast frames, built ONCE and shared across many spatial_join
    calls.

    The production pattern is a FIXED polygon set (serviceability areas) joined
    against many point batches/streams; rebuilding the index per call costs
    O(polygons) normalize + adaptive-cover + broadcast work (~6 s for 120
    polygons at z19 on the sandbox) that this object amortizes to zero.
    Construct with :func:`prepare_polygons`; pass as ``spatial_join(...,
    prepared=...)`` (geometry parameters travel with the object)."""

    def __init__(self, spark, zoom, compact, min_zoom, keep_holes,
                 norm, cover, zooms, pid_rows, pid_map, cover_idx,
                 norm_rows=None):
        self.spark = spark
        self.zoom = zoom
        self.compact = compact
        self.min_zoom = min_zoom
        self.keep_holes = keep_holes
        self.norm = norm
        self.cover = cover
        self.zooms = zooms
        self.pid_rows = pid_rows
        self.idx_of = {pid: i for i, pid in enumerate(pid_rows)}
        self.pid_map = pid_map
        self.cover_idx = cover_idx
        # the (polygon_id, ring_json, holes_json) rows prepare_polygons already
        # collected for the pid list — reused by rings_broadcast so the
        # broadcast build is driver-local, not another Spark job per call (r7)
        self._norm_rows = norm_rows
        self._bc_rings = None

    def rings_broadcast(self):
        """sc.broadcast of per-poly_idx ring lists ([outer] or [outer, *holes]),
        built lazily (only the broadcast refine path needs it) and cached."""
        if self._bc_rings is None:
            rows = self._norm_rows
            if rows is None:
                rows = (
                    self.norm.filter(F.col("poly_errors") == "")
                    .select("polygon_id", "ring_json", "holes_json")
                    .collect()
                )
            rings_list = [None] * len(self.pid_rows)
            for r in rows:
                rings_list[self.idx_of[r["polygon_id"]]] = [
                    np.asarray(json.loads(r["ring_json"]), dtype=np.float64)
                ] + [
                    np.asarray(h, dtype=np.float64)
                    for h in json.loads(r["holes_json"] or "[]")
                ]
            self._bc_rings = self.spark.sparkContext.broadcast(rings_list)
        return self._bc_rings

    def unpersist(self):
        """Release the cached frames and the ring broadcast."""
        self.norm.unpersist()
        self.cover.unpersist()
        self.cover_idx.unpersist()
        if self._bc_rings is not None:
            self._bc_rings.unpersist()
            self._bc_rings = None


def prepare_polygons(
    polygons: DataFrame,
    zoom: int = DEFAULT_JOIN_ZOOM,
    compact: bool = False,
    min_zoom: int | None = None,
    keep_holes: bool = False,
) -> PreparedPolygons:
    """Build the reusable polygon index for :func:`spatial_join` (see
    :class:`PreparedPolygons`)."""
    spark = polygons.sparkSession
    # polygon side is small: cache so normalize+cover run once, not once per zoom probe
    norm = normalize_polygons(polygons, keep_holes=keep_holes).cache()
    cover = polygon_cover(norm, zoom=zoom, compact=compact, min_zoom=min_zoom).cache()
    if not compact:
        zooms = [zoom]
    elif min_zoom is not None:
        # static zoom range (r7): the partially-uncompacted cover only emits
        # cells in [min_zoom, zoom], so probing that whole range needs no
        # cover-distinct job per call — a probe at a zoom absent from the cover
        # joins against nothing (identical matches, one fewer Spark job)
        zooms = list(range(min_zoom, zoom + 1))
    else:
        # distinct zooms present in the compacted cover (small driver-side
        # list); unbounded-coarseness covers can reach any zoom >= 0, so the
        # probe list must come from the data
        zooms = sorted(
            r["cell_zoom"] for r in cover.select("cell_zoom").distinct().collect()
        )
    # ONE collect serves both the dense-id list and (lazily) the ring
    # broadcast — the r6 shape ran a pid-distinct job here plus a second
    # norm collect inside rings_broadcast per spatial_join call (r7)
    norm_rows = (
        norm.filter(F.col("poly_errors") == "")
        .select("polygon_id", "ring_json", "holes_json")
        .collect()
    )
    # dense integer polygon surrogate: candidate rows carry a 4-byte poly_idx instead
    # of the polygon_id string — string columns double the per-row cost of the Python
    # handoff; ids are re-attached JVM-side from a tiny broadcast map at the end.
    pid_rows = sorted({r["polygon_id"] for r in norm_rows})
    pid_map = spark.createDataFrame(
        [(i, pid) for i, pid in enumerate(pid_rows)], ["poly_idx", "polygon_id"]
    )
    cover_idx = cover.join(F.broadcast(pid_map), "polygon_id").select(
        F.col("poly_idx").cast("int").alias("poly_idx"),
        "cell",
        "cell_zoom",
        "interior",
    ).cache()
    return PreparedPolygons(
        spark, zoom, compact, min_zoom, keep_holes,
        norm, cover, zooms, pid_rows, pid_map, cover_idx,
        norm_rows=norm_rows,
    )


def spatial_join(
    points: DataFrame,
    polygons: DataFrame | None = None,
    zoom: int = DEFAULT_JOIN_ZOOM,
    compact: bool = False,
    salt: int = 8,
    point_id: str = "point_id",
    how: str = "inner",
    refine: str = "broadcast",
    min_zoom: int | None = None,
    single_scan: bool = False,
    keep_holes: bool = False,
    prepared: PreparedPolygons | None = None,
) -> DataFrame:
    """points(point_id, lat, lon) ⋈ polygons(polygon_id, geojson) on containment.

    keep_holes=False (default) keeps the reference's outer-ring-only contract.
    keep_holes=True joins on the full even-odd polygon (interior rings excluded,
    hole BOUNDARIES still included — covers semantics): cover cells touching a
    hole's bbox are demoted to the refine path and the kernel ray-casts against
    every ring.  Supported by refine='broadcast' (incl. single_scan) and
    refine='cogroup'; refine='expr' raises (the Catalyst expression encodes one
    ring).

    how: 'inner' -> (point_id, lat, lon, polygon_id) matches;
         'left_semi' -> served points; 'left_anti' -> serviceability-gap points.
    refine:
      'broadcast' (default) — rings broadcast to every Python worker; refine is a
        map-only ``mapInPandas`` over the candidate rows, grouped locally per batch.
        ZERO shuffles end to end; skew is impossible (work follows partition size).
        Right whenever the normalized ring set fits in executor memory (up to ~10^6
        typical catchment rings ≈ a few GB; far past the reference's scale).
      'cogroup' — candidates shuffled on (polygon_id, salt) and cogrouped with
        replicated ring rows; the salted-repartition skew treatment (SURVEY.md §4).
        The fallback when the polygon table itself is too large to broadcast.
    single_scan (refine='broadcast' only): ONE point-table scan + ONE cover
        broadcast — the join output carries the cell's interior flag and the Arrow
        kernel passes interior rows through untouched (no ray cast) while refining
        boundary rows.  Trades the default plan's second scan + second broadcast for
        routing interior matches through the Arrow boundary (~0.4 µs/row-equivalent
        of core time).  MEASURED at 96M points x 120 polygons (224.7M matches,
        ~80% interior), local[16], page-warm parquet: default 11.2 s vs single_scan
        79.6 s — on cheap scans the interior short-circuit wins by 7x, which is why
        two-branch is the default.  single_scan only pays off when the input scan
        itself dominates (cold object-store reads of wide rows) AND the match rate
        is low; identical results either way (tests pin equality).
    """
    spark = points.sparkSession
    # lat/lon normalized to double at the boundary (SQL-derived inputs may arrive as
    # DECIMAL; every kernel and the result schema assume float64)
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
    )
    if prepared is None:
        if polygons is None:
            raise ValueError("spatial_join needs either polygons or prepared")
        prepared = prepare_polygons(
            polygons, zoom=zoom, compact=compact, min_zoom=min_zoom,
            keep_holes=keep_holes,
        )
    else:
        # geometry parameters travel with the index (a mismatched zoom would
        # silently probe the wrong cells)
        zoom = prepared.zoom
        keep_holes = prepared.keep_holes
    if keep_holes and refine == "expr":
        raise ValueError("keep_holes=True is not supported with refine='expr'")
    norm = prepared.norm
    zooms = prepared.zooms
    pid_map = prepared.pid_map
    cover_idx = prepared.cover_idx

    # candidate join: broadcast ONLY (polygon_id, cell) — rings never enter the
    # broadcast nor the per-candidate shuffle rows (they weigh KBs vs ~40 B/candidate).
    # ONE scan of the point table: ancestors at every cover zoom come from bit-shift
    # expressions, posexplode multiplies rows JVM-side, one broadcast hash join total
    # (cell ids embed their zoom, so a single join key covers all zooms collision-free).
    fine = pts.withColumn("_cell_fine", cell_expr(F.col("lat"), F.col("lon"), zoom))
    ancestors = F.array(
        *[cell_parent_expr(F.col("_cell_fine"), z, zoom) for z in zooms]
    )
    probe = fine.withColumn("_cell", F.explode(ancestors)).drop("_cell_fine")

    # interior/boundary split: a point in a FULLY-INSIDE cover cell is a match with no
    # refinement — it never crosses the Python boundary (which costs ~5 µs/row of core
    # time in Spark's row<->Arrow machinery and would otherwise dominate the join);
    # only boundary-cell candidates — O(perimeter), a small fraction — get ray-cast.
    # The two broadcasts carry DISJOINT halves of the cover (interior cells vs
    # boundary cells), so total broadcast volume equals one full cover.  (A single
    # shared broadcast + post-join filters was tried and REGRESSED: Catalyst pushes
    # the interior filter into the build side, defeating ReusedExchange, and each
    # branch then ships the whole cover — 2x the rows of the disjoint split.
    # single_scan=True below avoids the double scan a different way: one join whose
    # output KEEPS the interior flag, with kernel passthrough instead of a filter.)
    interior_matches = probe.join(
        F.broadcast(
            cover_idx.filter(F.col("interior")).select(
                "poly_idx", F.col("cell").alias("_cell")
            )
        ),
        "_cell",
        "inner",
    ).select("point_id", "lat", "lon", "poly_idx")
    candidates = probe.join(
        F.broadcast(
            cover_idx.filter(~F.col("interior")).select(
                "poly_idx", F.col("cell").alias("_cell")
            )
        ),
        "_cell",
        "inner",
    ).select("point_id", "lat", "lon", "poly_idx")

    # result schema tracks the caller's point-id type (string/bigint/...)
    pid_type = dict(pts.dtypes)["point_id"]
    result_schema = f"point_id {pid_type}, lat double, lon double, poly_idx int"

    if refine == "expr":
        # pure-Catalyst refine: ray cast as an aggregate expression over the ring
        # array (boundary-inclusive, same semantics as functions/pip.py).  No Python
        # boundary at all — in local mode the Arrow handoff costs a JVM feeder thread
        # PLUS a Python worker per task (2 CPU-bound threads/core -> negative scaling
        # past N/2 cores); expression refine keeps every core on one JVM thread.
        rings_arr = (
            norm.filter(F.col("poly_errors") == "")
            .join(F.broadcast(pid_map), "polygon_id")
            .select(
                F.col("poly_idx").cast("int").alias("poly_idx"),
                F.from_json("ring_json", "array<array<double>>").alias("_ring"),
            )
        )
        cand_r = candidates.join(F.broadcast(rings_arr), "poly_idx")
        ring = F.col("_ring")
        px, py = F.col("lon"), F.col("lat")
        nv = F.size(ring)

        def vx(i):
            return F.element_at(F.element_at(ring, i), 1)

        def vy(i):
            return F.element_at(F.element_at(ring, i), 2)

        edge_ids = F.sequence(F.lit(1), nv - 1)
        crossings = F.aggregate(
            edge_ids,
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                ((vy(i) <= py) != (vy(i + 1) <= py))
                & (
                    px
                    < vx(i)
                    + (py - vy(i)) * (vx(i + 1) - vx(i)) / (vy(i + 1) - vy(i))
                ),
                1,
            ).otherwise(0),
        )
        on_edge = F.exists(
            edge_ids,
            lambda i: (
                (vx(i + 1) - vx(i)) * (py - vy(i))
                - (vy(i + 1) - vy(i)) * (px - vx(i))
                == 0
            )
            & (px >= F.least(vx(i), vx(i + 1)))
            & (px <= F.greatest(vx(i), vx(i + 1)))
            & (py >= F.least(vy(i), vy(i + 1)))
            & (py <= F.greatest(vy(i), vy(i + 1))),
        )
        refined = cand_r.filter((crossings % 2 == 1) | on_edge).select(
            "point_id", "lat", "lon", "poly_idx"
        )
    elif refine == "broadcast":
        # map-only refine: all normalized rings broadcast once per executor; each
        # Arrow batch is grouped locally by polygon_id and ray-cast per group.
        # No shuffle, no sort, no skew — candidate rows never leave their partition.
        # mapInArrow, NOT mapInPandas: at ~10^8 candidate rows the Arrow->pandas
        # conversion materializes billions of Python string objects (id columns) and
        # becomes the memory-bandwidth ceiling of the whole join; in Arrow the ids
        # stay in columnar buffers and only lat/lon are viewed as numpy.
        # each entry: [outer] or [outer, hole, ...] — single-ring polygons take the
        # cached-RingKernel fast path; holed polygons run the even-odd PIP
        bc_rings = prepared.rings_broadcast()

        def refine_arrow(it):
            import pyarrow as pa

            rings = bc_rings.value
            kernels: dict[int, object] = {}
            for batch in it:
                n = batch.num_rows
                if n == 0:
                    continue
                # asarray(float64): decimal-typed lat/lon (e.g. SQL-derived) arrive
                # as object arrays of Decimal — coerce before the numpy kernel
                lon = np.asarray(
                    batch.column("lon").to_numpy(zero_copy_only=False), dtype=np.float64
                )
                lat = np.asarray(
                    batch.column("lat").to_numpy(zero_copy_only=False), dtype=np.float64
                )
                codes = batch.column("poly_idx").to_numpy(zero_copy_only=False)
                keep = np.zeros(n, dtype=bool)
                # one argsort groups all rows by polygon — NOT a codes==gi scan per
                # polygon (that is U full-array passes per batch and dominates runtime
                # when hundreds of polygons are present in every batch)
                order = np.argsort(codes, kind="stable")
                sorted_codes = codes[order]
                uniq, starts = np.unique(sorted_codes, return_index=True)
                ends = np.append(starts[1:], n)
                for k, gi in enumerate(uniq.tolist()):
                    poly = rings[gi]
                    if poly is None:
                        continue
                    idx = order[starts[k] : ends[k]]
                    if len(poly) == 1:
                        kern = kernels.get(gi)
                        if kern is None:
                            kern = kernels[gi] = P.RingKernel(poly[0])
                        ins, edg = kern.test_block(lon[idx], lat[idx])
                        keep[idx] = ins | edg
                    else:  # holed polygon: even-odd over all rings
                        keep[idx] = P.points_in_polygon(lon[idx], lat[idx], poly)
                yield batch.filter(pa.array(keep))

        if single_scan:
            # ONE point-table scan, ONE cover broadcast: the join output keeps the
            # interior flag and the kernel passes interior rows through untouched —
            # only boundary rows pay the ray cast.  See docstring for the tradeoff.
            joined_flag = probe.join(
                F.broadcast(
                    cover_idx.select(
                        "poly_idx", F.col("cell").alias("_cell"), "interior"
                    )
                ),
                "_cell",
                "inner",
            ).select("point_id", "lat", "lon", "poly_idx", "interior")

            def refine_arrow_single(it):
                import pyarrow as pa

                rings = bc_rings.value
                kernels: dict[int, object] = {}
                out_cols = ["point_id", "lat", "lon", "poly_idx"]
                for batch in it:
                    n = batch.num_rows
                    if n == 0:
                        continue
                    interior = (
                        batch.column("interior")
                        .to_numpy(zero_copy_only=False)
                        .astype(bool)
                    )
                    keep = interior.copy()
                    bidx = np.nonzero(~interior)[0]
                    if bidx.size:
                        lon = np.asarray(
                            batch.column("lon").to_numpy(zero_copy_only=False),
                            dtype=np.float64,
                        )[bidx]
                        lat = np.asarray(
                            batch.column("lat").to_numpy(zero_copy_only=False),
                            dtype=np.float64,
                        )[bidx]
                        codes = batch.column("poly_idx").to_numpy(
                            zero_copy_only=False
                        )[bidx]
                        order = np.argsort(codes, kind="stable")
                        sorted_codes = codes[order]
                        uniq, starts = np.unique(sorted_codes, return_index=True)
                        ends = np.append(starts[1:], len(bidx))
                        for kk, gi in enumerate(uniq.tolist()):
                            poly = rings[gi]
                            if poly is None:
                                continue
                            idx = order[starts[kk] : ends[kk]]
                            if len(poly) == 1:
                                kern = kernels.get(gi)
                                if kern is None:
                                    kern = kernels[gi] = P.RingKernel(poly[0])
                                ins, edg = kern.test_block(lon[idx], lat[idx])
                                keep[bidx[idx]] = ins | edg
                            else:
                                keep[bidx[idx]] = P.points_in_polygon(
                                    lon[idx], lat[idx], poly
                                )
                    filtered = batch.filter(pa.array(keep))
                    yield pa.RecordBatch.from_arrays(
                        [filtered.column(c) for c in out_cols], out_cols
                    )

            refined = joined_flag.mapInArrow(refine_arrow_single, result_schema)
            matches = refined.join(F.broadcast(pid_map), "poly_idx").select(
                "point_id", "lat", "lon", "polygon_id"
            )
            if how == "inner":
                return matches
            if how == "left_semi":
                return pts.join(
                    matches.select("point_id").distinct(), "point_id", "left_semi"
                )
            if how == "left_anti":
                return pts.join(
                    matches.select("point_id").distinct(), "point_id", "left_anti"
                )
            raise ValueError(f"unsupported how={how!r}")
        refined = candidates.mapInArrow(refine_arrow, result_schema)
    elif refine == "cogroup":
        # shuffle path: candidates cogrouped with replicated rings on
        # (polygon_id, salt) — the salted-repartition skew treatment for polygon
        # tables too large to broadcast.  Each task receives the ring exactly once.
        n_salt = max(1, salt)
        salted = candidates.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("point_id").cast("string")), F.lit(n_salt)),
        )
        rings_salted = (
            norm.filter(F.col("poly_errors") == "")
            .join(F.broadcast(pid_map), "polygon_id")
            .select(
                F.col("poly_idx").cast("int").alias("poly_idx"),
                "ring_json",
                "holes_json",
            )
            .crossJoin(
                spark.range(n_salt).select(F.col("id").cast("long").alias("_salt"))
            )
        )
        refined = (
            salted.groupBy("poly_idx", "_salt")
            .cogroup(rings_salted.groupBy("poly_idx", "_salt"))
            .applyInPandas(_refine_cogroup, result_schema)
        )
    else:
        raise ValueError(f"unsupported refine={refine!r}")

    # cover cells are disjoint, so interior and boundary matches cannot overlap;
    # polygon_id strings re-attach here, JVM-side, from the tiny broadcast map
    matches = (
        interior_matches.unionByName(refined)
        .join(F.broadcast(pid_map), "poly_idx")
        .select("point_id", "lat", "lon", "polygon_id")
    )

    if how == "inner":
        return matches
    if how == "left_semi":
        return pts.join(matches.select("point_id").distinct(), "point_id", "left_semi")
    if how == "left_anti":
        return pts.join(matches.select("point_id").distinct(), "point_id", "left_anti")
    raise ValueError(f"unsupported how={how!r}")


def explode_multipolygon_parts(polygons: DataFrame) -> DataFrame:
    """(polygon_id, geojson) -> one row per polygon PART: (polygon_id, part_idx,
    geojson) where each part is rewrapped as a single-Polygon FeatureCollection
    (holes preserved).

    GeoJSON 'Polygon' geometries pass through as part 0; 'MultiPolygon' geometries
    emit one part per member polygon.  Documents that fail to parse pass through
    unchanged (part_idx 0) so the downstream normalize annotates them with the
    reference's exact error strings instead of dropping rows here."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pids, idxs, docs = [], [], []
            for pid, gj in zip(pdf["polygon_id"], pdf["geojson"]):
                parts = None
                try:
                    doc = json.loads(gj)
                    geom = doc["features"][0].get("geometry") or {}
                    gtype = geom.get("type")
                    if gtype == "MultiPolygon":
                        parts = geom["coordinates"]
                    elif gtype in (None, "Polygon"):
                        parts = [geom["coordinates"]]
                    else:
                        # non-polygonal geometry: pass through UNCHANGED so the
                        # downstream normalize annotates it with the specific
                        # unsupported-type message (rewrapping as 'Polygon' here
                        # would masquerade it as a malformed ring instead)
                        parts = None
                except Exception:
                    parts = None
                if not parts:
                    pids.append(pid); idxs.append(0); docs.append(gj)
                    continue
                for i, coords in enumerate(parts):
                    pids.append(pid)
                    idxs.append(i)
                    docs.append(json.dumps({
                        "type": "FeatureCollection",
                        "features": [{
                            "type": "Feature",
                            "geometry": {"type": "Polygon", "coordinates": coords},
                            "properties": {},
                        }],
                    }))
            yield pd.DataFrame(
                {"polygon_id": pids, "part_idx": idxs, "geojson": docs}
            )

    return polygons.select("polygon_id", "geojson").mapInPandas(
        batches, "polygon_id string, part_idx int, geojson string"
    )


def spatial_join_multi(
    points: DataFrame,
    polygons: DataFrame,
    how: str = "inner",
    **kwargs,
) -> DataFrame:
    """MultiPolygon-aware spatial join: a point matches a feature when it is inside
    ANY member polygon (union semantics, per the GeoJSON spec — parts are disjoint).

    Physical shape: parts exploded to independent rows (the polygon side stays the
    small side — parts multiply it by the part count, not the point count), joined
    with the regular two-phase engine under synthetic part ids, then matches are
    mapped back to feature ids through a broadcast of the tiny (part_id ->
    polygon_id) table and deduped per (point, feature).  Composes with
    ``keep_holes=True`` — every part carries its own interior rings.

    Cache lifetime: each call caches the exploded parts frame plus the inner
    prepare_polygons frames for the duration of the query; long-lived sessions
    issuing many multipolygon joins against CHANGING polygon sets should
    ``spark.catalog.clearCache()`` between batches (for a FIXED polygon set,
    explode once and reuse a prepared index via :func:`spatial_join` instead)."""
    parts = explode_multipolygon_parts(polygons).cache()
    tagged = parts.select(
        F.concat_ws("#", "polygon_id", F.col("part_idx").cast("string")).alias(
            "polygon_id"
        ),
        "geojson",
    )
    part_map = parts.select(
        F.concat_ws("#", "polygon_id", F.col("part_idx").cast("string")).alias(
            "_part_id"
        ),
        F.col("polygon_id").alias("_feature_id"),
    )
    m = spatial_join(points, tagged, how="inner", **kwargs)
    matches = (
        m.withColumnRenamed("polygon_id", "_part_id")
        .join(F.broadcast(part_map), "_part_id")
        .select(
            "point_id", "lat", "lon", F.col("_feature_id").alias("polygon_id")
        )
        .dropDuplicates(["point_id", "polygon_id"])
    )
    if how == "inner":
        return matches
    point_id = kwargs.get("point_id", "point_id")
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
    )
    if how == "left_semi":
        return pts.join(matches.select("point_id").distinct(), "point_id", "left_semi")
    if how == "left_anti":
        return pts.join(matches.select("point_id").distinct(), "point_id", "left_anti")
    raise ValueError(f"unsupported how={how!r}")


def polygon_intersect_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    zoom: int = 12,
) -> DataFrame:
    """Polygon x polygon intersection join: (a_id, b_id) for every pair of valid
    polygons that share any point (boundary-inclusive).

    Physical plan (both sides potentially large — neither is broadcast wholesale):
    1. normalize + cover BOTH sides at one zoom (the usual adaptive descent,
       expanded) — cover rows are (id, cell);
    2. candidates = cover_a equi-join cover_b on cell, deduped — polygons can only
       intersect if their covers share a cell (covers are conservative supersets),
       so the candidate set is complete and the only shuffle is on the cell key;
    3. exact refine per candidate pair with the vertex-containment + segment-
       intersection kernel (functions/polyops.py) inside mapInPandas, rings
       delivered via a join on the normalized tables (ring pairs are tiny —
       tens of vertices each).

    zoom trades candidate precision against cover size exactly like the point
    join; intersection semantics match the box-overlap oracle (entry
    ``polygon_intersect_join``) and the brute-force kernel pytest.
    """
    import json as _json

    # normalize_polygons carries polygon_id as string internally; the final select
    # casts a_id/b_id back to the INPUT id types so non-string ids round-trip
    a_id_type = dict(polys_a.dtypes).get("polygon_id", "string")
    b_id_type = dict(polys_b.dtypes).get("polygon_id", "string")
    na = normalize_polygons(
        polys_a.withColumn("polygon_id", F.col("polygon_id").cast("string"))
    ).filter(F.col("poly_errors") == "")
    nb = normalize_polygons(
        polys_b.withColumn("polygon_id", F.col("polygon_id").cast("string"))
    ).filter(F.col("poly_errors") == "")
    ca = polygon_cover(na.select("polygon_id", "ring_json", "poly_errors"),
                       zoom=zoom, compact=False).select(
        F.col("polygon_id").alias("a_id"), "cell"
    )
    cb = polygon_cover(nb.select("polygon_id", "ring_json", "poly_errors"),
                       zoom=zoom, compact=False).select(
        F.col("polygon_id").alias("b_id"), "cell"
    )
    cand = ca.join(cb, "cell").select("a_id", "b_id").dropDuplicates(["a_id", "b_id"])
    pairs = (
        cand.join(na.select(F.col("polygon_id").alias("a_id"),
                            F.col("ring_json").alias("_ra")), "a_id")
        .join(nb.select(F.col("polygon_id").alias("b_id"),
                        F.col("ring_json").alias("_rb")), "b_id")
    )

    def refine(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from geojson_utility_spark.functions.polyops import rings_intersect

        for pdf in it:
            keep = []
            for ra, rb in zip(pdf["_ra"], pdf["_rb"]):
                a = np.asarray(_json.loads(ra), dtype=np.float64)
                b = np.asarray(_json.loads(rb), dtype=np.float64)
                keep.append(rings_intersect(a, b))
            yield pdf.loc[keep, ["a_id", "b_id"]]

    schema = "a_id string, b_id string"
    return pairs.mapInPandas(refine, schema).select(
        F.col("a_id").cast(a_id_type).alias("a_id"),
        F.col("b_id").cast(b_id_type).alias("b_id"),
    )


def cell_heat_stats(points: DataFrame, zoom: int = DEFAULT_JOIN_ZOOM) -> DataFrame:
    """Engine metric: per-cell point density (groupBy count — partial agg map-side)."""
    return (
        points.withColumn("cell", cell_expr(F.col("lat"), F.col("lon"), zoom))
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
    )
