"""Data-quality expectations profile — the Deequ/Great-Expectations
analogue, from scratch on one combinable aggregation pass.

Production pipelines gate every ingest behind a profile like this
(Amazon Deequ runs exactly these metrics as Spark aggregates); the
reference's QA evaluator computes the same null/complete/consistency
checks driver-side per page batch (qa_pipeline_evaluator.py:419-470).
One row per profiled column: completeness (null count), uniqueness
(exact distinct), canonical-integer min/max for numerics/timestamps
plus lexicographic min/max for strings, and a per-column EXPECTATION
with its exact violation count:

  o_orderkey      not-null AND unique
  o_custkey       not-null
  o_orderstatus   domain {F, O, P}
  o_totalprice    non-negative
  o_orderdate     within [DQ_DATE_MIN, DQ_DATE_MAX]
  o_orderpriority matches '^[1-5]-'

Hash-match discipline: doubles never surface — o_totalprice min/max are
floor(value * 100) BIGINT cents, timestamps are epoch-day BIGINTs, so
both engines emit identical integers (base.py header: cross-engine
ROUND(double) is not trustworthy).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from medical_ocr_pipeline_spark.queries.base import load, register

DQ_DATE_MIN = date(1992, 1, 1)
DQ_DATE_MAX = date(2002, 12, 31)
_EPOCH = date(1970, 1, 1)
_DMIN = (DQ_DATE_MIN - _EPOCH).days
_DMAX = (DQ_DATE_MAX - _EPOCH).days

_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

# per-column (min_i64 expr template, min_s?) canonical encodings
_I64 = {
    "o_orderkey": "{c}",
    "o_custkey": "{c}",
    "o_totalprice": "CAST(floor({c} * 100) AS BIGINT)",
}
_STR = {"o_orderstatus", "o_orderpriority"}

# DuckDB violation predicates (column NULL always violates)
_VIOL_DUCK = {
    "o_custkey": "o_custkey IS NULL",
    "o_orderstatus": "o_orderstatus IS NULL OR o_orderstatus NOT IN"
    " ('F', 'O', 'P')",
    "o_totalprice": "o_totalprice IS NULL OR o_totalprice < 0",
    "o_orderdate": "o_orderdate IS NULL OR"
    f" date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) < {_DMIN} OR"
    f" date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) > {_DMAX}",
    "o_orderpriority": "o_orderpriority IS NULL OR"
    " NOT regexp_matches(o_orderpriority, '^[1-5]-')",
}


def _duck_col_select(c: str) -> str:
    if c in _STR:
        min_i, max_i = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
        min_s, max_s = f"MIN({c})", f"MAX({c})"
    elif c == "o_orderdate":
        enc = "date_diff('day', TIMESTAMP '1970-01-01', {c})".format(c=c)
        min_i = f"CAST(MIN({enc}) AS BIGINT)"
        max_i = f"CAST(MAX({enc}) AS BIGINT)"
        min_s, max_s = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    else:
        enc = _I64[c].format(c=c)
        min_i = f"CAST(MIN({enc}) AS BIGINT)"
        max_i = f"CAST(MAX({enc}) AS BIGINT)"
        min_s, max_s = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    if c == "o_orderkey":
        viol = (
            "CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)"
            " + CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        )
    else:
        viol = (
            f"CAST(SUM(CASE WHEN {_VIOL_DUCK[c]} THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        )
    return f"""
      SELECT '{c}' AS col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             {min_i} AS min_i64, {max_i} AS max_i64,
             {min_s} AS min_s, {max_s} AS max_s,
             {viol} AS n_violations,
             {viol} = 0 AS passed
      FROM orders
    """


@register(
    "dq_profile",
    sql=" UNION ALL ".join(_duck_col_select(c) for c in _COLS)
    + " ORDER BY col_name",
)
def dq_profile(spark, sf_dir):
    """Deequ-style single-pass data-quality profile of the orders
    table: one row per column with completeness, exact uniqueness,
    canonical-integer min/max, and the column's expectation verdict
    (see module docstring for the rule table).

    100 TB shape: ONE aggregation job — every metric is a combinable
    aggregate (sums, min/max, count-distinct) computed in a single scan
    and a one-row reduce; the per-column long form is an explode of
    that one row, not six scans (the DuckDB oracle does scan per column
    — it's an oracle).  The exact multi-column COUNT(DISTINCT) expands
    rows map-side (Spark's Expand operator, one replica per distinct
    column); at petabyte scale you swap those for the HLL registers of
    sketch_hll_distinct and keep everything else identical."""
    o = load(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
        if c in _STR:
            aggs.append(F.min(c).alias(f"mins_{c}"))
            aggs.append(F.max(c).alias(f"maxs_{c}"))
        elif c == "o_orderdate":
            enc = F.datediff(F.col(c), F.lit("1970-01-01")).cast("long")
            aggs.append(F.min(enc).alias(f"mini_{c}"))
            aggs.append(F.max(enc).alias(f"maxi_{c}"))
        else:
            enc = F.expr(_I64[c].format(c=c))
            aggs.append(F.min(enc).alias(f"mini_{c}"))
            aggs.append(F.max(enc).alias(f"maxi_{c}"))
    viol_spark = {
        "o_custkey": "o_custkey IS NULL",
        "o_orderstatus": "o_orderstatus IS NULL OR o_orderstatus NOT IN"
        " ('F', 'O', 'P')",
        "o_totalprice": "o_totalprice IS NULL OR o_totalprice < 0",
        "o_orderdate": "o_orderdate IS NULL OR"
        f" datediff(o_orderdate, '1970-01-01') < {_DMIN} OR"
        f" datediff(o_orderdate, '1970-01-01') > {_DMAX}",
        "o_orderpriority": "o_orderpriority IS NULL OR"
        " NOT (o_orderpriority RLIKE '^[1-5]-')",
    }
    for c, pred in viol_spark.items():
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"viol_{c}")
        )
    one = o.agg(*aggs)
    structs = []
    for c in _COLS:
        if c == "o_orderkey":
            viol = F.expr(
                "cast(n_rows - dist_o_orderkey + null_o_orderkey"
                " as bigint)"
            )
        else:
            viol = F.col(f"viol_{c}")
        has_str = c in _STR
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"dist_{c}").cast("long").alias("n_distinct"),
                (
                    F.lit(None).cast("long")
                    if has_str
                    else F.col(f"mini_{c}")
                ).alias("min_i64"),
                (
                    F.lit(None).cast("long")
                    if has_str
                    else F.col(f"maxi_{c}")
                ).alias("max_i64"),
                (
                    F.col(f"mins_{c}")
                    if has_str
                    else F.lit(None).cast("string")
                ).alias("min_s"),
                (
                    F.col(f"maxs_{c}")
                    if has_str
                    else F.lit(None).cast("string")
                ).alias("max_s"),
                viol.alias("n_violations"),
                (viol == 0).alias("passed"),
            )
        )
    return (
        one.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )
