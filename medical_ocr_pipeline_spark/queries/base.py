"""Query registry: every implemented operator from SURVEY.md §2 gets a
named Spark query over the driver testdata plus (when SQL-expressible) a
DuckDB oracle SQL string.  __spark_entry__.py exposes this registry to the
driver's correctness gate.

Hash-match discipline (driver compares row-count + schema + order-
insensitive value hash):
  * alias every computed column identically in Spark and SQL;
  * round every float aggregate (floating summation order differs between
    engines) — ROUND_DIGITS decimals everywhere;
  * make every top-k deterministic with a full tie-breaking ORDER BY;
  * know ROUND's limit: Spark round(double) rounds the double's SHORTEST
    DECIMAL REPRESENTATION half-up ("87.72625" -> 87.7263) while DuckDB
    rounds the binary value (87.72624999... -> 87.7262), so any
    aggregate whose true value sits within one ulp of a ROUND_DIGITS
    boundary can hash-mismatch at some scale factor.  When a query trips
    this (a9 did at sf0.1), switch the column to an exact integer form:
    floor(value * 10^k) per row (floor of the identical double is
    identical in both engines), BIGINT summation, no trailing ROUND.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

ROUND_DIGITS = 4

# md5-hex prefix -> 48-bit BIGINT, the engine-agreement-critical hash
# used by the MinHash/SimHash/CDC families and the curation sampler.
# ONE canonical template per engine (Spark conv() vs DuckDB 0x cast) so
# a fix to substr length / signedness propagates everywhere.
MD5_INT48_SPARK = "cast(conv(substr(md5({x}), 1, 12), 16, 10) as bigint)"
MD5_INT48_DUCK = "CAST(('0x' || substr(md5({x}), 1, 12)) AS BIGINT)"


@dataclass
class QuerySpec:
    fn: Callable  # (spark, sf_dir) -> DataFrame
    sql: str | None = None  # DuckDB oracle; None -> rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, sql)
        return fn

    return deco


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
