"""f3_json_parse on DIRTY props: the driver testdata is all-valid JSON,
so this fixture is what actually exercises the failure-counting contract
(corrupt objects, non-object JSON, empty, NULL) against the DuckDB
oracle on the same rows."""

import datetime as dt

import duckdb
import pandas as pd

from medical_ocr_pipeline_spark.queries import REGISTRY


def test_f3_counts_malformed_props_like_oracle(spark, tmp_path):
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, ts, 1, "view", 1.0, '{"k": 3}'),        # valid object
        (2, ts, 1, "view", 1.0, '{"k": 4, }'),      # trailing comma: repaired
        (3, ts, 1, "view", 1.0, "{bad"),            # corrupt
        (4, ts, 1, "view", 1.0, "{}"),              # valid, no k -> parsed
        (5, ts, 1, "view", 1.0, "[1,2]"),           # valid JSON, not object
        (6, ts, 1, "view", 1.0, '"str"'),           # valid JSON scalar
        (7, ts, 1, "view", 1.0, ""),                # empty
        (8, ts, 1, "view", 1.0, None),              # NULL
        (9, ts, 2, "click", 1.0, '{"k": 10}'),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"],
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )

    q = REGISTRY["f3_json_parse"]
    got = q.fn(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    want = con.execute(q.sql).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    view = got[got.event_type == "view"].iloc[0]
    # failures: corrupt, array, scalar, empty, NULL = 5 (the trailing
    # comma is repaired before parsing, as in the reference F3 chain)
    assert int(view.parse_failures) == 5
    assert int(view.sum_k) == 3 + 4  # valid object + repaired object
