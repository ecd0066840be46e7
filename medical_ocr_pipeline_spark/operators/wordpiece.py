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
distinct-word frequency table; per pass, one combinable pair-count
aggregation joined to one combinable symbol-count aggregation, a
bounded argmax collect, and one pure-Catalyst fold.  Unlike BPE —
where a non-taken pair's count can only keep or fall when a disjoint
merge applies — a WordPiece merge SHRINKS the counts of its two
component symbols, which RAISES the likelihood score of every other
pair sharing a component, so a ranked list from one count cannot
CERTIFY a sequential-equivalent batch up front; only a recount can.
The trainer therefore SPECULATES instead of certifying: it takes the
top-M pairs of one recount as a candidate prefix, then runs ONE
unioned verification job that recomputes the true argmax after each
candidate prefix c1..ci (each branch is a lazy Catalyst fold chain —
nothing materializes), and accepts the longest prefix where every
candidate matches the recounted argmax, rolling the rest back.  The
accepted list is bit-identical to the one-merge-per-pass classic
(pinned by equivalence tests, the bpe batching precedent), while
driver round-trips drop ~M-fold when speculation verifies — the
difference between ~64k Spark jobs and ~8k at a real 32k-merge vocab.
The price is executor compute: the verification job recounts the
table once per candidate, the classic speculation trade (idle-driver
latency for parallel work the cluster absorbs).

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


def _true_argmax_after_prefixes(wc: DataFrame,
                                cands: list[tuple[str, str]]):
    """ONE Spark job returning {i: (a, b)} — the true likelihood argmax
    of the table after candidate merges c1..ci have been applied, for
    each i in 1..len(cands)-1.  Each union branch chains i lazy
    Catalyst folds onto the shared persisted table and keeps its own
    TakeOrderedAndProject, so the collect is bounded at len(cands)-1
    rows regardless of corpus size."""
    cur = wc
    branches = []
    for i in range(1, len(cands)):
        cur = _apply_merge(cur, *cands[i - 1])
        branches.append(
            _pair_scores(cur)
            .orderBy(F.desc("score_scaled"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(F.lit(i).alias("i"), "a", "b")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return {r["i"]: (r["a"], r["b"]) for r in out.collect()}


def wp_train(docs, n_merges: int = 10, batch_size: int = 8,
             checkpoint_dir: str | None = None,
             _stats: dict | None = None) -> list[tuple[str, str]]:
    """Learn `n_merges` WordPiece merges.  Returns the rank-ordered
    merge list [(a, b), ...]; the minted piece is a + strip_##(b).

    Speculative batching (module docstring): per pass, one recount
    ranks the top `batch_size` candidates; candidate 1 is certain (it
    IS the recount's argmax), candidates 2..M are verified by one
    unioned multi-prefix recount job and the longest matching prefix is
    accepted — bit-identical output to the classic one-merge-per-pass
    trainer (batch_size=1), pinned by equivalence tests.  Driver state
    is the merge list only; collects are bounded by batch_size.

    `checkpoint_dir` switches the per-pass table refresh from
    persist/unpersist (cache only — the logical plan still chains one
    fold deeper per accepted merge, and a lost cache block recomputes
    through the whole chain) to RELIABLE checkpoints with round
    rotation via iterloop.RoundCheckpointer — the cluster-safe form
    for real 32k-merge training runs.  The caller owns deleting the
    dir afterwards (the merge list itself is driver-side, so every
    round is reclaimed at finish).

    _stats (tests/diagnostics): receives {"passes": <n>} — the number
    of recount->verify->apply rounds actually executed."""
    from medical_ocr_pipeline_spark.operators.iterloop import (
        RoundCheckpointer,
    )

    wc = wp_word_table(docs).persist()
    wc.count()
    merges: list[tuple[str, str]] = []
    passes = 0
    ckpt = RoundCheckpointer(docs.sparkSession, checkpoint_dir,
                             name="wp_rounds")
    try:
        while len(merges) < n_merges:
            m = min(batch_size, n_merges - len(merges))
            top = (
                _pair_scores(wc)
                .orderBy(
                    F.desc("score_scaled"), F.asc("a"), F.asc("b")
                )
                .limit(m)
                .collect()
            )
            passes += 1
            if not top:
                break
            cands = [(r["a"], r["b"]) for r in top]
            accept = cands[:1]  # argmax of a true recount: always right
            if len(cands) > 1:
                true_next = _true_argmax_after_prefixes(wc, cands)
                for i in range(1, len(cands)):
                    # accept c_{i+1} only if it equals the TRUE argmax
                    # after c1..ci — the recounted, not assumed, order
                    if true_next.get(i) == cands[i]:
                        accept.append(cands[i])
                    else:
                        break  # rollback the unverified tail
            merges.extend(accept)
            nxt = wc
            for a, b in accept:
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
