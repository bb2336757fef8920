"""geojson_utility_spark — a from-scratch PySpark-native spatial-join & tiling engine.

Subsumes the query/data-processing capabilities of the reference repo
(ONDC-Official/geojson-utility, a CSV->GeoJSON catchment-enrichment service) re-expressed
Spark-first: validation predicates as vectorized column expressions, the per-row external
enrichment join as a two-phase H3-style candidate join (hierarchical cell index) + exact
point-in-polygon refinement in Arrow-batched pandas UDFs, lineage/status/metrics as a
DataFrame-native run table, and the SSE change feed as a progress-event JSON sink.

Everything here is pure PySpark + numpy/stdlib (no native geo/image libs), so the whole
engine ships with ``spark-submit --py-files``.
"""

__version__ = "0.1.0"

from geojson_utility_spark.session import get_spark  # noqa: F401
