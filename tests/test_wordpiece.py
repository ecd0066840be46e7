"""operators/wordpiece.py vs a sequential pure-Python WordPiece trainer
and a hand-checked greedy encoder."""

from pyspark.sql import Row

from medical_ocr_pipeline_spark.operators.wordpiece import (
    WP_SCALE,
    encode_word_wp,
    wp_encode,
    wp_train,
    wp_vocab,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _init_syms(word):
    return tuple(
        c if i == 0 else "##" + c for i, c in enumerate(word)
    )


def _apply(syms, a, b, merged):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = merged
        else:
            out.append(s)
    return tuple(out)


def _py_train(texts, n_merges):
    import re

    wc = {}
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    tab = [[_init_syms(w), c] for w, c in wc.items()]
    merges = []
    for _ in range(n_merges):
        sym_cnt, pair_cnt = {}, {}
        for syms, c in tab:
            for s in syms:
                sym_cnt[s] = sym_cnt.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_cnt[p] = pair_cnt.get(p, 0) + c
        if not pair_cnt:
            break
        best = min(
            pair_cnt,
            key=lambda p: (
                -(pair_cnt[p] * WP_SCALE
                  // (sym_cnt[p[0]] * sym_cnt[p[1]])),
                p[0],
                p[1],
            ),
        )
        merges.append(best)
        a, b = best
        merged = a + (b[2:] if b.startswith("##") else b)
        tab = [[_apply(syms, a, b, merged), c] for syms, c in tab]
    return merges


def test_likelihood_beats_raw_count(spark):
    # (a,##b) has pair count 6 but common symbols (7 each):
    # 6/(7*7) ≈ 0.12; (x,##z) has pair count 2 with rare symbols:
    # 2/(2*2) = 0.5 — BPE would merge (a,##b), WordPiece (x,##z)
    texts = ["ab ab ab ab ab ab xz xz aq qb"]
    merges = wp_train(_docs(spark, texts), n_merges=1)
    assert merges == [("x", "##z")]
    assert merges == _py_train(texts, 1)


def test_matches_sequential_reference(spark):
    texts = [
        "hugs hugs hug hug hug pug pugs bun bug bug",
        "hugs pug bun bun hug",
    ]
    got = wp_train(_docs(spark, texts), n_merges=8)
    assert got == _py_train(texts, 8)
    # continuation prefixes: every right component is a ## piece
    assert all(b.startswith("##") for _, b in got)


def test_partition_count_invariance(spark):
    texts = ["the cat sat on the mat", "the bat and the rat sat"] * 3
    d1 = _docs(spark, texts).repartition(1)
    d8 = _docs(spark, texts).repartition(8)
    assert wp_train(d1, 5) == wp_train(d8, 5) == _py_train(texts, 5)


def test_greedy_longest_match_encoder():
    vocab = {"un", "##aff", "##able", "##ffa", "u", "##n", "##a",
             "##f", "##b", "##l", "##e"}
    # greedy: un + ##aff + ##able (longest prefix at each step)
    assert encode_word_wp("unaffable", vocab) == ["un", "##aff", "##able"]
    # no initial piece for 'z' -> whole-word UNK (None)
    assert encode_word_wp("zz", vocab) is None
    # single piece consumes the word
    assert encode_word_wp("un", vocab) == ["un"]


def test_encode_stats_on_own_corpus_has_no_unk(spark):
    texts = ["banana band bandana", "ana banana band"]
    docs = _docs(spark, texts)
    merges = wp_train(docs, 6)
    vocab = wp_vocab(docs, merges)
    vset = set(vocab)
    # every corpus word encodes (vocab contains every initial symbol)
    import re

    words = {
        w for t in texts for w in re.split("[^a-z0-9]+", t.lower()) if w
    }
    py_tokens = 0
    py_words = 0
    for t in texts:
        for w in re.split("[^a-z0-9]+", t.lower()):
            if w:
                enc = encode_word_wp(w, vset)
                assert enc is not None
                assert "".join(p.lstrip("#") for p in enc) == w
                py_tokens += len(enc)
                py_words += 1
    rows = wp_encode(docs, vocab).collect()
    assert sum(r.n_words for r in rows) == py_words
    assert sum(r.n_tokens for r in rows) == py_tokens
    assert words  # non-degenerate fixture


def test_vocab_is_initial_symbols_plus_minted_pieces(spark):
    texts = ["aa ab"]
    docs = _docs(spark, texts)
    merges = wp_train(docs, 2)
    vocab = wp_vocab(docs, merges)
    # initial symbols: a, b never word-initial twice... a, ##a, ##b
    assert set(vocab) >= {"a", "##a", "##b"}
    assert len(vocab) == len({"a", "##a", "##b"}) + len(merges)


def test_encode_word_fuzz_properties():
    """Hypothesis fuzz of the pure-python MaxMatch encoder: pieces
    reconstruct the word, every emitted piece is the longest vocab
    match at its position, and unencodable inputs return None exactly
    when some position has no match."""
    from hypothesis import given, settings, strategies as st

    alphabet = "abc"

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet=alphabet, min_size=1, max_size=12),
        st.sets(
            st.text(alphabet=alphabet, min_size=1, max_size=4),
            max_size=12,
        ),
        st.booleans(),
    )
    def run(word, extra, full_char_vocab):
        vocab = set()
        for p in extra:
            vocab.add(p)
            vocab.add("##" + p)
        if full_char_vocab:
            for c in alphabet:
                vocab.add(c)
                vocab.add("##" + c)
        enc = encode_word_wp(word, vocab)
        if full_char_vocab:
            assert enc is not None
        if enc is None:
            # some position must have no matching piece under greedy
            # consumption — re-walk to find it
            pos = 0
            stuck = False
            while pos < len(word):
                best = None
                for end in range(len(word), pos, -1):
                    cand = word[pos:end]
                    if pos > 0:
                        cand = "##" + cand
                    if cand in vocab:
                        best = end
                        break
                if best is None:
                    stuck = True
                    break
                pos = best
            assert stuck
            return
        # reconstruction
        assert "".join(
            p[2:] if p.startswith("##") else p for p in enc
        ) == word
        # positional correctness + greedy-longest at every step
        pos = 0
        for p in enc:
            raw = p[2:] if p.startswith("##") else p
            assert (p.startswith("##")) == (pos > 0)
            assert word[pos: pos + len(raw)] == raw
            for longer_end in range(len(word), pos + len(raw), -1):
                cand = word[pos:longer_end]
                if pos > 0:
                    cand = "##" + cand
                assert cand not in vocab  # greedy would have taken it
            pos += len(raw)
        assert pos == len(word)

    run()


def test_trainer_matches_reference_on_seeded_random_corpora(spark):
    # three deterministic pseudo-random corpora over a small alphabet
    # (heavy repetition so merges are meaningful), spark trainer vs the
    # sequential reference
    x = 41
    for trial in range(3):
        words = []
        for _ in range(40):
            x = (x * 1103515245 + 12345) % (2**31)
            n = 2 + x % 5
            w = ""
            for _ in range(n):
                x = (x * 1103515245 + 12345) % (2**31)
                w += "abcd"[x % 4]
            words.append(w)
        text = " ".join(words)
        got = wp_train(_docs(spark, [text]), n_merges=6)
        assert got == _py_train([text], 6), (trial, text)
