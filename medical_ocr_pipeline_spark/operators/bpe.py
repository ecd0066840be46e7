"""Distributed BPE training + Arrow-batched encoding.

Byte-pair-encoding training (Sennrich et al. 2016) at corpus scale:
the corpus collapses ONCE into a distinct-word frequency table (the
combinable groupBy that makes web-scale BPE tractable — vocabulary is
orders of magnitude smaller than the token stream), then merges are
learned in sequential-equivalent BATCHES: per pass, one distributed
pair-count aggregation (weighted by word frequency) + one top-(M+1)
collect + one chained pure-Catalyst fold applying every selected merge
to the symbol arrays.  Driver state is exactly the merge list — bounded
by n_merges, never by corpus size — and driver round-trips by
n_merges / batch_size, not n_merges.

Encoding applies the learned merges with a pandas UDF (Arrow batches):
a rank-ordered merge loop over a ~n_merges-entry dict is idiomatic
python and would be a 20-deep nested Catalyst fold otherwise.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from medical_ocr_pipeline_spark.queries.base import WORD_SPLIT, words_expr

_WORD_SPLIT = WORD_SPLIT  # python-side re.compile twin of words_expr()


def word_freq_table(docs) -> DataFrame:
    """(syms: array<string>, cnt) distinct-word frequency table with
    each word pre-split into single-character symbols."""
    words = words_expr()
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


def _select_batch(rows, m: int,
                  created: set[str]) -> list[tuple[str, str]]:
    """Maximal SEQUENTIAL-EQUIVALENT merge batch from the sorted
    (desc count, asc a, asc b) top-(m+1) pair rows.

    A batch applied together equals m rounds of classic one-at-a-time
    BPE iff no taken merge can change another taken merge's count or
    let any non-taken pair overtake one.  Three rules deliver that:

    1. disjointness — a candidate sharing any STRING (component or
       concatenation) with an earlier taken pair stops the batch: only
       symbol-disjoint merges have invariant counts, and sharing a
       concat string means one merge mints the other's symbol;
    2. collision hard-stop — a candidate whose concat a||b equals an
       ALREADY-EXISTING symbol (from an earlier pass; initial symbols
       are single chars, so only `created` can collide) must be the
       batch's LAST member: applying it can BOOST counts of pairs
       containing that symbol, which only the next pass's recount may
       see;
    3. strict truncation — every taken pair after the first must
       strictly beat the count at the stop position (first conflict /
       first uncollected row), because non-taken pairs only keep or
       lose count and merge-minted pairs are bounded by their
       conflicting sources (<= the stop count), so strict > pins the
       argmax order; ties fall to the next pass.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    stop_count = None
    for i, r in enumerate(rows):
        a, b, c = r["a"], r["b"], r["pair_count"]
        concat = a + b
        if len(batch) >= m or (batch and used & {a, b, concat}):
            stop_count = c
            break
        batch.append((a, b, c))
        used |= {a, b, concat}
        if concat in created:
            if i + 1 < len(rows):
                stop_count = rows[i + 1]["pair_count"]
            break
    while stop_count is not None and len(batch) > 1 \
            and batch[-1][2] <= stop_count:
        batch.pop()
    return [(a, b) for a, b, _ in batch]


def bpe_train(docs, n_merges: int = 10, batch_size: int = 16,
              checkpoint_dir: str | None = None,
              _stats: dict | None = None) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a documents frame.  Returns the
    rank-ordered merge list.  Ties break lexicographically on (a, b) so
    training is deterministic across runs and partitionings.

    Scale shape: merges are learned in BATCHES — per pass, ONE
    combinable pair-count groupBy + one LIMIT batch_size+1 collect picks
    the maximal prefix of the count-ranked pair list that is provably
    sequential-equivalent (_select_batch), and one chained Catalyst fold
    applies the whole batch.  Driver round-trips drop from 2*n_merges
    jobs to ~2*n_merges/batch_size — the difference between 64k jobs
    and ~4k at a real 32k-merge vocab.  batch_size=1 is exactly the
    classic one-merge-per-iteration trainer (the equivalence tests pin
    batched == 1-at-a-time).  The table is re-persisted each pass and
    its predecessor unpersisted — note persist only CACHES: the logical
    plan still chains one fold batch deeper per pass, and a lost cache
    block recomputes through the whole chain.  `checkpoint_dir`
    switches the per-pass refresh to RELIABLE checkpoints with round
    rotation (iterloop.RoundCheckpointer), the cluster-safe form for
    real 32k-merge runs; the caller owns deleting the dir afterwards.

    _stats (tests/diagnostics): receives {"passes": <n>} — the number
    of count->select->apply rounds actually executed."""
    from medical_ocr_pipeline_spark.operators.iterloop import (
        RoundCheckpointer,
    )

    wc = word_freq_table(docs).persist()
    wc.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    created: set[str] = set()
    passes = 0
    ckpt = RoundCheckpointer(docs.sparkSession, checkpoint_dir,
                             name="bpe_rounds")
    try:
        while len(merges) < n_merges:
            m = min(batch_size, n_merges - len(merges))
            top = (
                _pair_counts(wc)
                .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(m + 1)
                .collect()
            )
            passes += 1
            if not top or top[0]["pair_count"] is None:
                break
            batch = _select_batch(top, m, created)
            merges.extend(batch)
            created.update(a + b for a, b in batch)
            nxt = wc
            for a, b in batch:
                nxt = _apply_merge(nxt, a, b)
            if checkpoint_dir is not None:
                nxt = ckpt.truncate(nxt)
            else:
                nxt = nxt.persist()
                nxt.count()
            wc.unpersist()
            wc = nxt
        ckpt.finish(keep=0)
    finally:
        ckpt.restore()
        wc.unpersist()
        if _stats is not None:
            _stats["passes"] = passes
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

    words = words_expr()
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_tokens("text").alias("n_tokens"),
    )
