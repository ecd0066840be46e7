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

# Canonical DuckDB CTE body over the embeddings table: float32 -> double
# up-cast plus the L2 norm, shared by every embedding-family oracle
# (ANN LSH/IVF, SemDeDup, embedding near-dup pairs) so a cast or norm
# fix propagates everywhere.
EMB_E_DUCK = """
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             sqrt(list_aggregate(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
"""


def emb_banded_duck(tables: int, planes: int) -> str:
    """Canonical DuckDB CTE body for the random-hyperplane signature:
    per table t, a `planes`-bit sign bucket of the embedding against the
    deterministic md5 pseudo-planes.  Expects an `e` CTE of EMB_E_DUCK
    shape in scope.  The per-term association is (v * k) / 1000.0 —
    EXACTLY the Spark side's `cast(e.v as double) * k / 1000.0`
    (left-assoc), not v * (k / 1000.0): the bucket is the SIGN of a
    64-term sum, so both engines must accumulate bit-identical terms or
    a near-zero projection can band differently."""
    return f"""
      SELECT vec_id, label, e, nrm, t AS tbl,
             list_aggregate(
               [ CASE WHEN list_aggregate(
                     [ (e[i + 1] *
                        (CAST(('0x' || substr(md5(t || ':' || p || ':' || i),
                                1, 12)) AS BIGINT) % 2001 - 1000)) / 1000.0
                       FOR i IN range(0, 64) ], 'sum') > 0
                 THEN (1 << p) ELSE 0 END
                 FOR p IN range(0, {planes}) ], 'sum') AS bucket
      FROM e, range({tables}) r(t)
"""


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


WORD_SPLIT = "[^a-z0-9]+"


def words_expr(col: str = "text"):
    """Canonical lowercased word-array expression shared by every
    tokenizing query (dedup / curation / textstats / training / BPE).

    NULL-safe by construction: `text` is coalesced to '' BEFORE the
    split, because F.split(NULL) yields a NULL array whose F.size is -1
    — which silently poisons token counts, 1000000*x DIV n arithmetic,
    and removal ratios on any production corpus that carries null text
    (the sandbox tables don't, so only this shared builder guards it)."""
    from pyspark.sql import functions as F

    return F.filter(
        F.split(F.lower(F.coalesce(F.col(col), F.lit(""))), WORD_SPLIT),
        lambda w: w != F.lit(""),
    )


def fanout(df, *keys: str):
    """Hash-redistribute by key with NO explicit partition count.

    The documents table at test scale is one small parquet file -> one
    input split; without a fan-out a whole shingle/token pipeline runs
    on a single core.  A key-only repartition (REPARTITION_BY_COL, not
    REPARTITION_BY_NUM) targets spark.sql.shuffle.partitions and stays
    AQE-managed: with adaptive.coalescePartitions.parallelismFirst
    (default true) it never drops below the cluster's parallelism at
    toy scale, and at 100 TB the cluster-tuned shuffle.partitions —
    not a literal baked into query bodies — sets the fan-out.  A
    literal numPartitions would be a fixed parallelism ceiling AQE can
    neither split nor coalesce (~1.5 TB/partition at 64 partitions on
    the target corpus)."""
    from pyspark.sql import functions as F

    return df.repartition(*[F.col(k) for k in keys])
