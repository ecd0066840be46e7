"""Distributed BPE training + Arrow-batched encoding.

Byte-pair-encoding training (Sennrich et al. 2016) at corpus scale:
the corpus collapses ONCE into a distinct-word frequency table (the
combinable groupBy that makes web-scale BPE tractable — vocabulary is
orders of magnitude smaller than the token stream), then each merge
iteration is one distributed pair-count aggregation (weighted by word
frequency) + one argmax row collected to the driver + one pure-Catalyst
fold that applies the merge to every word's symbol array.  Driver state
is exactly the merge list — bounded by n_merges, never by corpus size.

Encoding applies the learned merges with a pandas UDF (Arrow batches):
a rank-ordered merge loop over a ~n_merges-entry dict is idiomatic
python and would be a 20-deep nested Catalyst fold otherwise.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_WORD_SPLIT = "[^a-z0-9]+"


def word_freq_table(docs) -> DataFrame:
    """(syms: array<string>, cnt) distinct-word frequency table with
    each word pre-split into single-character symbols."""
    words = F.filter(
        F.split(F.lower("text"), _WORD_SPLIT), lambda w: w != F.lit(""))
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            # split keeps a trailing '' (the end-of-string zero-width
            # match under limit -1) — filter it or it becomes a symbol
            F.filter(
                F.split("word", "(?!^)"), lambda s: s != F.lit("")
            ).alias("syms"),
            "cnt",
        )
    )


def _pair_counts(wc: DataFrame) -> DataFrame:
    """(a, b, pair_count) over adjacent symbol pairs, frequency-weighted."""
    pairs = wc.select(
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    "  i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                ),
            ).otherwise(
                F.expr("cast(array() as array<struct<a:string,b:string>>)")
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("pair_count"))


def _apply_merge(wc: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every left-to-right non-overlapping (a, b) adjacency into
    the single symbol a||b — one pure-Catalyst fold per word."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        "syms",
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return wc.select(merged.alias("syms"), "cnt")


def bpe_train(docs, n_merges: int = 10) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a documents frame.  Returns the
    rank-ordered merge list.  Ties break lexicographically on (a, b) so
    training is deterministic across runs and partitionings.

    Scale shape: per iteration, one combinable groupBy over the (small)
    frequency-table pair frame and a LIMIT 1 collect; the table is
    re-persisted each round and its predecessor unpersisted, so lineage
    stays one merge deep."""
    wc = word_freq_table(docs).persist()
    wc.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(wc)
                .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_count"] is None:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = _apply_merge(wc, a, b).persist()
            nxt.count()
            wc.unpersist()
            wc = nxt
    finally:
        wc.unpersist()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE encode of one word: repeatedly merge the
    lowest-ranked adjacent pair until none applies."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(docs, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_words, n_tokens) per document under the learned
    merges — Arrow-batched (pandas UDF), merge table shipped once per
    executor via the closure (it is n_merges entries, never corpus-
    sized)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    splitter = re.compile(_WORD_SPLIT)

    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        def count(t):
            if t is None:
                return 0
            total = 0
            for w in splitter.split(t.lower()):
                if w:
                    total += len(encode_word(w, ranks))
            return total

        return text.map(count)

    words = F.filter(
        F.split(F.lower("text"), _WORD_SPLIT), lambda w: w != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_tokens("text").alias("n_tokens"),
    )
