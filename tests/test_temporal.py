"""Edge semantics of the temporal joins on hand-built frames.

The testdata has microsecond-unique timestamps, so the oracle test never
exercises ties; these frames pin the >= (at-or-before) semantics of the
as-of join and the band-boundary behaviour of the range join against
DuckDB on the same rows.
"""

import datetime as dt

import duckdb
import pandas as pd
import pytest

from medical_ocr_pipeline_spark.queries.temporal import (
    RANGE_BAND_S,
    asof_view_to_purchase,
    range_join_event_pairs,
)


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


@pytest.fixture()
def events_pdf():
    rows = [
        # user 1: view strictly before, view at equal ts, purchase
        (1, _ts(0), 1, "view", 1.0, ""),
        (2, _ts(5), 1, "view", 1.0, ""),
        (3, _ts(5), 1, "purchase", 9.0, ""),   # equal-ts view must match
        # user 2: purchase with NO prior view -> excluded (inner asof)
        (4, _ts(1), 2, "purchase", 5.0, ""),
        (5, _ts(2), 2, "view", 1.0, ""),
        (6, _ts(9), 2, "purchase", 5.0, ""),   # matches event 5
        # user 3: pair exactly at the band boundary (gap == RANGE_BAND_S)
        (7, _ts(0), 3, "view", 1.0, ""),
        (8, _ts(30), 3, "view", 1.0, ""),      # 1800s later
        # and one just outside the band
        (9, _ts(30, 1), 3, "view", 1.0, ""),
    ]
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


@pytest.fixture()
def sf_dir(tmp_path, spark, events_pdf):
    spark.createDataFrame(events_pdf).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _duck(events_pdf, sql):
    con = duckdb.connect()
    con.register("events", events_pdf)
    return con.execute(sql).df()


def test_asof_equal_ts_and_missing_match(spark, sf_dir, events_pdf):
    got = (
        asof_view_to_purchase(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
    )
    # purchase 3 matches the equal-ts view 2 (>= semantics), gap 0;
    # purchase 4 (no prior view) is dropped; purchase 6 matches view 5.
    assert got[["purchase_id", "view_id", "gap_sec"]].values.tolist() == [
        [3, 2, 0],
        [6, 5, 7 * 60],
    ]
    from medical_ocr_pipeline_spark.queries import REGISTRY

    want = _duck(events_pdf, REGISTRY["asof_view_to_purchase"].sql)
    pd.testing.assert_frame_equal(
        got.astype({"gap_sec": "int64"}),
        want.sort_values(["user_id", "purchase_id"])
        .reset_index(drop=True)
        .astype({"gap_sec": "int64"}),
        check_dtype=False,
    )


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_events_user_ts_unique_precondition(spark, sf):
    """funnel_conversion / asof_view_to_purchase match their DuckDB
    oracles only because (user_id, ts) is unique in the testdata (greedy
    Spark fold vs min-chain oracle coincide under uniqueness).  Pin the
    precondition so a data-generator change fails loudly here instead of
    silently diverging (ADVICE r01)."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"/root/testdata/sf{sf}/events.parquet")
    dup = (
        ev.groupBy("user_id", "ts").count().where(F.col("count") > 1).count()
    )
    assert dup == 0, f"(user_id, ts) not unique at sf{sf}: {dup} dup keys"


def test_range_join_band_boundary(spark, sf_dir, events_pdf):
    got = range_join_event_pairs(spark, sf_dir).toPandas()
    row3 = got[got.user_id == 3].iloc[0]
    # pairs for user 3: (7,8) gap exactly RANGE_BAND_S -> included;
    # (8,9) gap 1s -> included; (7,9) gap 1801s -> excluded.
    assert row3.n_pairs == 2
    assert row3.avg_gap_sec == round((RANGE_BAND_S + 1) / 2, 4)
    from medical_ocr_pipeline_spark.queries import REGISTRY

    want = _duck(events_pdf, REGISTRY["range_join_event_pairs"].sql)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_funnel_fold_and_scan_forms_agree(spark):
    """The collect_list fold and the unbounded-history three-scan form
    are alternative physical shapes of the same operator — identical
    results on the driver testdata."""
    import pandas as pd

    from medical_ocr_pipeline_spark.queries.temporal import (
        funnel_conversion,
        funnel_conversion_scan,
    )

    sf = "/root/testdata/sf0.001"
    a = funnel_conversion(spark, sf).toPandas()
    b = funnel_conversion_scan(spark, sf).toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
