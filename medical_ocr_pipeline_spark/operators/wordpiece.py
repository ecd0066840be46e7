"""Distributed WordPiece training + Arrow-batched greedy encoding.

WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) is the third
classic subword family next to BPE (operators/bpe.py) and the unigram
LM (operators/unigram.py).  Training is BPE-shaped — repeatedly merge
the best adjacent symbol pair over a distinct-word frequency table —
but the selection criterion is the LIKELIHOOD score
count(a,b) / (count(a) * count(b)) instead of the raw pair count, and
continuation symbols carry the '##' prefix so the learned pieces are
position-aware.  Encoding is NOT merge replay: it is greedy
longest-match-first against the final vocabulary (the MaxMatch
algorithm), which is what makes WordPiece encoding O(len^2) per word
with no merge table at all.

Scale shape mirrors bpe_train: the corpus collapses ONCE into the
distinct-word frequency table; per merge, one combinable pair-count
aggregation joined to one combinable symbol-count aggregation, a 1-row
argmax collect, and one pure-Catalyst fold.  Merges are learned ONE per
pass (no batching): unlike BPE — where a non-taken pair's count can
only keep or fall when a disjoint merge applies — a WordPiece merge
SHRINKS the counts of its two component symbols, which RAISES the
likelihood score of every other pair sharing a component, so a ranked
list from one count cannot certify a sequential-equivalent batch; only
the next pass's recount can.

Determinism: the score is compared in exact scaled-integer form
(pair_count * 10^12 div (count_a * count_b)) with an (a, b)
lexicographic tie-break, so training is bit-stable across runs,
partitionings and engines — the property the unrolled-CTE oracle in
queries/training.py rides on.  The BIGINT product pair*10^12 caps the
exact form at ~9.2e6 pair occurrences; a beyond-that corpus drops the
scale factor (the score only ranks, it is never reported).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from medical_ocr_pipeline_spark.queries.base import WORD_SPLIT, words_expr

WP_SCALE = 10**12


def wp_word_table(docs) -> DataFrame:
    """(syms: array<string>, cnt) distinct-word frequency table with
    each word split into WordPiece initial symbols: first char bare,
    every later char '##'-prefixed."""
    words = words_expr()
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.expr(
                "transform(filter(split(word, '(?!^)'), s -> s != ''),"
                "  (s, i) -> CASE WHEN i = 0 THEN s"
                "            ELSE concat('##', s) END)"
            ).alias("syms"),
            "cnt",
        )
    )


def _strip_cont(b: str) -> str:
    return b[2:] if b.startswith("##") else b


def _pair_scores(wc: DataFrame) -> DataFrame:
    """(a, b, pair_count, score_scaled) over adjacent symbol pairs:
    score_scaled = pair_count * WP_SCALE div (count_a * count_b), the
    exact-integer form of the WordPiece likelihood criterion."""
    sc = (
        wc.select(F.explode("syms").alias("sym"), "cnt")
        .groupBy("sym")
        .agg(F.sum("cnt").alias("c"))
    )
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
    pc = pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("pair_count"))
    return (
        pc.join(F.broadcast(sc.withColumnRenamed("sym", "a")
                            .withColumnRenamed("c", "ca")), "a")
        .join(F.broadcast(sc.withColumnRenamed("sym", "b")
                          .withColumnRenamed("c", "cb")), "b")
        .select(
            "a",
            "b",
            "pair_count",
            F.expr(
                f"(pair_count * cast({WP_SCALE} as bigint))"
                " div (ca * cb)"
            ).alias("score_scaled"),
        )
    )


def _apply_merge(wc: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every left-to-right non-overlapping (a, b) adjacency into
    the single symbol a || strip_##(b) — operators/bpe._apply_merge's
    Catalyst fold with the continuation prefix dropped from b."""
    la, lb = F.lit(a), F.lit(b)
    merged_lit = F.lit(a + _strip_cont(b))
    merged = F.aggregate(
        "syms",
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged_lit)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return wc.select(merged.alias("syms"), "cnt")


def wp_train(docs, n_merges: int = 10) -> list[tuple[str, str]]:
    """Learn `n_merges` WordPiece merges.  Returns the rank-ordered
    merge list [(a, b), ...]; the minted piece is a + strip_##(b).
    One merge per pass (see module docstring for why WordPiece cannot
    batch); per pass one combinable pair/symbol-count aggregation and
    a LIMIT 1 collect — driver state is the merge list only."""
    wc = wp_word_table(docs).persist()
    wc.count()
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < n_merges:
            top = (
                _pair_scores(wc)
                .orderBy(
                    F.desc("score_scaled"), F.asc("a"), F.asc("b")
                )
                .limit(1)
                .collect()
            )
            if not top:
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


def wp_vocab(docs, merges: list[tuple[str, str]]) -> list[str]:
    """Final piece vocabulary: every initial symbol seen in the corpus
    (bare first chars + '##' continuation chars — a bounded set, at
    most 2 * |alphabet|) plus the minted merge pieces in rank order."""
    base = [
        r["sym"]
        for r in wp_word_table(docs)
        .select(F.explode("syms").alias("sym"))
        .distinct()
        .orderBy("sym")
        .collect()
    ]
    return base + [a + _strip_cont(b) for a, b in merges]


def encode_word_wp(word: str, vocab: set[str]) -> list[str] | None:
    """Greedy longest-match-first (MaxMatch) WordPiece encode of one
    word; None = unencodable (some position has no matching piece —
    BERT's whole-word [UNK] convention)."""
    out: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        end = n
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return None
        out.append(piece)
        pos = end
    return out


def wp_encode(docs, vocab: list[str]) -> DataFrame:
    """(doc_id, n_words, n_tokens) per document under greedy
    longest-match encoding — Arrow-batched (pandas UDF), the bounded
    vocabulary shipped once per executor via the closure.  Unencodable
    words count 1 (the [UNK] token)."""
    from pyspark.sql.functions import pandas_udf

    vset = set(vocab)
    splitter = re.compile(WORD_SPLIT)

    @pandas_udf("long")
    def n_tokens(text: pd.Series) -> pd.Series:
        def count(t):
            if t is None:
                return 0
            total = 0
            for w in splitter.split(t.lower()):
                if w:
                    enc = encode_word_wp(w, vset)
                    total += 1 if enc is None else len(enc)
            return total

        return text.map(count)

    words = words_expr()
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        n_tokens("text").alias("n_tokens"),
    )
