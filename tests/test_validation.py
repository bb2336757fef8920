"""Validation operators P1-P11 vs a spec-derived row-wise oracle + golden rows.

Oracle re-derives the documented semantics of the reference's validators
(reference: backend/core/validation_helpers.py — predicates and exact error strings
per SURVEY.md §2.2); implemented independently, row-at-a-time, as the test oracle.
"""

import re

import pandas as pd
import pytest

from geojson_utility_spark import fixtures as FX
from geojson_utility_spark.operators import validation as V
from geojson_utility_spark.operators.enrichment import enrich_locations, run_metrics


def oracle_validate(row: dict) -> list[str]:
    errs = []
    for field in ("snp_id", "provider_id", "location_id"):
        val = row.get(field)
        v = "nan" if val is None else str(val).strip()
        if not v:
            errs.append(f"{field} must be a non-empty string.")
        elif len(v) > 255:
            errs.append(f"{field} must be at most 255 characters.")
        elif not re.match(r"^[\w\.\-@/]+$", v):
            errs.append(f"{field} contains invalid characters.")
    gps_raw = row.get("location_gps")
    gps = "nan" if gps_raw is None else str(gps_raw).strip()
    parts = gps.split(",")
    gps_ok = False
    if len(parts) == 2:
        ls, os_ = parts[0].strip(), parts[1].strip()
        try:
            la, lo = float(ls), float(os_)
            dec_l = ls.split(".")[-1] if "." in ls else ""
            dec_o = os_.split(".")[-1] if "." in os_ else ""
            gps_ok = (
                len(dec_l) >= 4
                and len(dec_o) >= 4
                and la == la and lo == lo  # NaN check
                and -90 <= la <= 90
                and -180 <= lo <= 180
            )
        except ValueError:
            gps_ok = False
    if not gps_ok:
        errs.append(V.GPS_ERROR)
    def present(x):
        return x is not None and not pd.isnull(x) and str(x).strip() != ""
    def num(x):
        try:
            f = float(str(x).strip())
            return None if f != f else f
        except (ValueError, TypeError):
            return None
    dd, dt_ = row.get("drive_distance"), row.get("drive_time")
    use_dist = False
    if not present(dd) and not present(dt_):
        errs.append("Either drive_distance or drive_time must be provided and non-empty.")
    else:
        if present(dd):
            p = num(dd)
            if p is None:
                errs.append("drive_distance must be a valid number if present.")
            elif p <= 0:
                errs.append("drive_distance must be a positive number.")
            elif p > 100000:
                errs.append("drive_distance is unreasonably large.")
            else:
                use_dist = True
        if not use_dist and present(dt_):
            p = num(dt_)
            if p is None:
                errs.append("drive_time must be a valid number if present.")
            elif p <= 0:
                errs.append("drive_time must be a positive number.")
            elif p > 10000:
                errs.append("drive_time is unreasonably large.")
    return errs


CASES = [
    # (snp_id, provider_id, location_id, location_gps, drive_distance, drive_time)
    ("sample_seller", "sample_provider", "L1", "28.5065162,77.073938", "500.5", ""),
    ("sample_seller", "sample_provider", "L2", "30.7135305,76.7454157", "", "20.5"),
    ("", "p", "L3", "28.5065,77.0739", "100", ""),
    ("a" * 256, "p", "L4", "28.5065,77.0739", "100", ""),
    ("bad id!", "p", "L5", "28.5065,77.0739", "100", ""),
    (None, "p", "L6", "28.5065,77.0739", "100", ""),           # null id -> 'nan' quirk
    ("ok", "p", "L7", "28.506,77.0739", "100", ""),             # 3 decimals
    ("ok", "p", "L8", "28.5065e2,77.0739", "100", ""),          # exp notation passes dec test, fails range
    ("ok", "p", "L9", "0.1234e1,77.0739", "100", ""),           # exp notation, in range: VALID (quirk)
    ("ok", "p", "L10", "95.5065,77.0739", "100", ""),
    ("ok", "p", "L11", "28.5065", "100", ""),
    ("ok", "p", "L12", "28.5065,77.0739,5.0", "100", ""),
    ("ok", "p", "L13", None, "100", ""),
    ("ok", "p", "L14", "28.5065,77.0739", "", ""),
    ("ok", "p", "L15", "28.5065,77.0739", "abc", ""),
    ("ok", "p", "L16", "28.5065,77.0739", "-5", ""),
    ("ok", "p", "L17", "28.5065,77.0739", "0", ""),
    ("ok", "p", "L18", "28.5065,77.0739", "100001", ""),
    ("ok", "p", "L19", "28.5065,77.0739", "", "10001"),
    ("ok", "p", "L20", "28.5065,77.0739", "-1", "15.7"),       # dist err + time used
    ("ok", "p", "L21", "28.5065,77.0739", "  500 ", ""),       # whitespace numeric
    ("ok", "p", "L22", "28.5065,77.0739", "500.9", ""),        # truncation -> 500
    ("ok", "p", "L23", " 28.5065 , 77.0739 ", "500", ""),      # spaces inside gps parts
    ("ok", "p", "L24", "28.5065,77.0739", "1e4", ""),          # exp notation numeric
    ("ok", "p", "L25", "-90.0000,-180.0000", "500", ""),       # boundary coords
]


@pytest.fixture(scope="module")
def validated(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            CASES,
            columns=["snp_id", "provider_id", "location_id", "location_gps",
                     "drive_distance", "drive_time"],
        ).astype(object)
    )
    out = V.validate_locations(df).orderBy("row_idx").toPandas()
    return out


def test_errors_match_oracle(validated):
    for i, case in enumerate(CASES):
        row = dict(zip(
            ["snp_id", "provider_id", "location_id", "location_gps",
             "drive_distance", "drive_time"], case))
        # mimic CSV ingestion: empty string cell -> NaN in pandas == null in Spark?
        # our fixture keeps '' as '', None as null — oracle handles both identically
        expected = "; ".join(oracle_validate(row))
        got = validated.iloc[i]["errors"]
        assert got == expected, f"case {i} {case}: got {got!r} want {expected!r}"


def test_projection_values(validated):
    r0 = validated.iloc[0]
    assert r0["lat"] == 28.5065 and r0["lon"] == 77.0739
    assert r0["catchment_type"] == "drive_distance" and r0["magnitude"] == 500
    r1 = validated.iloc[1]
    assert r1["catchment_type"] == "drive_time" and r1["magnitude"] == 20
    # L20: invalid distance, valid time -> time used, distance error recorded
    r19 = validated.iloc[19]
    assert r19["catchment_type"] == "drive_time" and r19["magnitude"] == 15
    assert "drive_distance must be a positive number." in r19["errors"]
    # L22 truncation 500.9 -> 500
    assert validated.iloc[21]["magnitude"] == 500
    # L23 internal spaces accepted
    assert validated.iloc[22]["lat"] == 28.5065
    # L9 exponent-notation gps is VALID (string decimal-count quirk)
    assert validated.iloc[8]["errors"] == ""
    assert validated.iloc[8]["lat"] == 1.234


def test_round4_exact_python_parity(spark):
    # decimal-text ties where bround/format_string diverge from Python — round4_udf
    # must match float(f"{v:.4f}") bit-for-bit (correct rounding of exact binary value)
    cases = ["28.50005,77.00015", "12.34565,89.99995", "1.00005,2.00015"]
    rows = [("s", "p", f"L{i}", gps, "100", "") for i, gps in enumerate(cases)]
    df = spark.createDataFrame(
        rows,
        ["snp_id", "provider_id", "location_id", "location_gps",
         "drive_distance", "drive_time"],
    )
    out = V.validate_locations(df).orderBy("row_idx").toPandas()
    for i, gps in enumerate(cases):
        la, lo = (float(x) for x in gps.split(","))
        assert out.iloc[i]["lat"] == float(f"{la:.4f}"), gps
        assert out.iloc[i]["lon"] == float(f"{lo:.4f}"), gps


def test_file_level_guards(spark):
    import pandas as pd

    base = pd.DataFrame(
        [["s", "p", "L1", "28.5065,77.0739", "100", ""]] * 2,
        columns=["snp_id", "provider_id", "location_id", "location_gps",
                 "drive_distance", "drive_time"],
    )
    df_dup = spark.createDataFrame(base)
    errs = V.reject_file_errors(df_dup)
    assert any("Duplicate rows" in e for e in errs)
    base2 = base.copy()
    base2.loc[1, "drive_distance"] = "200"  # distinct rows, same location_id
    errs2 = V.reject_file_errors(spark.createDataFrame(base2))
    assert any("Duplicate location_id" in e and "L1" in e for e in errs2)
    missing = V.reject_file_errors(df_dup.drop("drive_time"))
    assert missing == ["Missing required columns: drive_time"]
    df_ok = spark.createDataFrame(FX.make_locations(10).astype(object))
    assert V.reject_file_errors(df_ok) == []


def test_header_normalization(spark):
    df = spark.createDataFrame([("a",)], ["  snp_id "])
    assert V.normalize_headers(df).columns == ["snp_id"]


def test_enrichment_golden(spark):
    import json

    df = spark.createDataFrame(FX.make_locations(0).astype(object))
    out = enrich_locations(df).toPandas()
    assert len(out) == len(FX.GOLDEN_LOCATION_ROWS) + len(FX.NEGATIVE_LOCATION_ROWS)
    assert list(out.columns[:8]) == [
        "snp_id", "provider_id", "location_id", "location_gps",
        "drive_distance", "drive_time", "geojson", "errors",
    ]
    g0 = json.loads(out.iloc[0]["geojson"])
    assert g0["type"] == "FeatureCollection"
    feat = g0["features"][0]
    assert feat["geometry"]["type"] == "Polygon"
    assert feat["properties"] == {}
    assert len(feat["geometry"]["coordinates"]) == 1  # outer ring only
    assert out.iloc[0]["errors"] == ""
    # errored rows keep geojson '{}' and their error strings
    bad = out[out["errors"] != ""]
    assert (bad["geojson"] == "{}").all()
    assert len(bad) == len(FX.NEGATIVE_LOCATION_ROWS)
    # order preserved == input order
    assert out.iloc[2]["snp_id"] == ""  # first negative vector kept in place


def test_enrichment_budget_and_metrics(spark):
    df = spark.createDataFrame(FX.make_locations(20).astype(object))
    out_df = enrich_locations(df, token_budget=5)
    out = out_df.toPandas()
    enriched = out[out["geojson"] != "{}"]
    assert len(enriched) == 5
    exhausted = out[out["errors"] == "Your token allocation has been exhausted"]
    assert len(exhausted) > 0
    m = run_metrics(out_df)
    assert m["status"] == "failed"  # other errors present too (negative vectors)
    assert m["total_rows"] == len(out)
    assert m["api_calls_made"] == 5
    # clean run -> done
    clean = spark.createDataFrame(FX.make_locations(5).astype(object).iloc[:2])
    m2 = run_metrics(enrich_locations(clean))
    assert m2["status"] == "done" and m2["failed_rows"] == 0
    # only token exhaustion -> partial
    m3 = run_metrics(enrich_locations(clean, token_budget=1))
    assert m3["status"] == "partial"
    assert m3["error"] == "Token allocation exhausted during processing"


def test_enrichment_matches_committed_golden(spark):
    """End-to-end regression pin: full pipeline output vs committed golden CSV."""
    import os

    import pandas as pd

    golden_path = os.path.join(os.path.dirname(__file__), "golden_enrichment.csv")
    golden = pd.read_csv(golden_path, dtype=str).fillna("")
    df = spark.createDataFrame(FX.make_locations(20).astype(object))
    out = (
        enrich_locations(df)
        .drop("row_idx", "lat", "lon")
        .toPandas()
        .astype(str)
    )
    out = out.where(out != "None", "").reset_index(drop=True)
    assert len(out) == len(golden)
    for col in golden.columns:
        got_col = out[col].fillna("").tolist()
        want_col = golden[col].fillna("").tolist()
        assert got_col == want_col, f"golden mismatch in column {col}"


def test_p3_reference_verbatim_messages(spark, tmp_path):
    """P3 golden parity: error strings verbatim from the reference, INCLUDING the
    2MB-text-vs-10MB-code quirk (catchment.py:138-140 says 'max 2MB' while
    enforcing 10 MB; code wins on the limit, text reproduced exactly)."""
    import pytest as _pytest

    from geojson_utility_spark.sources.locations_csv import read_locations_csv

    big = tmp_path / "big.csv"
    big.write_bytes(b"h\n" + b"x" * (10 * 1024 * 1024 + 1))
    with _pytest.raises(ValueError, match=r"CSV file too large \(max 2MB\)"):
        read_locations_csv(spark, str(big), enforce_reference_limits=True)
    notcsv = tmp_path / "data.txt"
    notcsv.write_text("a,b\n1,2\n")
    with _pytest.raises(ValueError, match="File must be a CSV with a valid filename"):
        read_locations_csv(spark, str(notcsv), enforce_reference_limits=True)
    many = tmp_path / "many.csv"
    many.write_text("a\n" + "\n".join(str(i) for i in range(1001)))
    with _pytest.raises(ValueError, match=r"CSV file has too many rows \(max 1000\)"):
        read_locations_csv(spark, str(many), enforce_reference_limits=True)
    # just-under limits pass
    ok = tmp_path / "ok.csv"
    ok.write_text("a\n" + "\n".join(str(i) for i in range(1000)))
    assert read_locations_csv(spark, str(ok), enforce_reference_limits=True).count() == 1000
