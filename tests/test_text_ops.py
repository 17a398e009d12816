"""Text-operator tests: 20-language trigram lang-ID confusion matrix.

The reference has no language-ID surface; this is a target-side
training-data operator (SURVEY.md §2 LLM-pipeline block). The oracle
gate (`lang_id_ngram` in __spark_entry__) checks Spark vs DuckDB on the
documents corpus; these tests check the *model* — that each of the 20
profiled languages is actually recognized on held-out natural text —
and that the constant-folded map-lookup plan computes the exact same
scores as the direct per-language definition.
"""

from __future__ import annotations

import re

from semargl_spark.operators.text import _TRIGRAM_PROFILES, lang_id_ngram

# one held-out sentence per profiled language (natural text, not the
# profile's own source words verbatim)
SAMPLES = {
    "en": "the quick brown fox is running to the house and it is one of the best",
    "de": "der hund und die katze sind nicht einfach durch den schoenen wald gelaufen",
    "es": "el perro y los gatos que viven en la casa que compramos por la mañana",
    "fr": "le chien et les chats sont dans une maison que nous avons achetée",
    "it": "il cane che gli amici hanno portato per la stazione della città",
    "pt": "a educação não é uma opção para os meninos em todos os lugares",
    "nl": "het huis van een aardige man is niet zo ver van de oude zee",
    "sv": "det är något som man måste göra för att kunna förstå och leva",
    "da": "jeg har ikke set det af dem der kom til byen at købe mad",
    "no": "jeg har ikke sett det av dem som kom på kaien og til byen",
    "fi": "suomessa on kaunis kesä ja talvella lunta sataa paljon kaikkialla",
    "pl": "nie wiem że przez te wszystkie lata nie było żadnych ważnych spraw",
    "cs": "je to pro nás že není možné na tom nic změnit v této době",
    "tr": "bir şeyler ve daha fazla kitaplar okuyor ama yarın da gelecek",
    "ro": "în această seară cu prietenii lui vom merge pe strada cea mare și frumoasă",
    "hu": "az egyetem mellett egy szép ház van hogy ott lakjanak szépen",
    "id": "di jakarta yang besar mereka mendapatkan makanan dan berjalan ke rumahnya",
    "ca": "els amics que vénen amb el seu germà és per la ciutat del nord",
    "ru": "это не то что мы хотели на самом деле по многим причинам в итоге",
    "uk": "це не те що ми хотіли на самому ділі і багато українських питань",
}


def _python_mirror(text: str) -> tuple[str, float]:
    """The operator's definition, straight-line Python: first-max over
    per-language trigram occurrence counts."""
    pt = " " + re.sub(r"\s+", " ", text.strip().lower()) + " "
    tris = [pt[i:i + 3] for i in range(max(len(pt) - 2, 1))]
    langs = list(_TRIGRAM_PROFILES)
    sets = {lang: set(_TRIGRAM_PROFILES[lang]) for lang in langs}
    scores = [sum(1 for t in tris if t in sets[lang]) for lang in langs]
    m = max(scores)
    pred = "und" if m == 0 else langs[scores.index(m)]
    return pred, round(m / max(len(tris), 1), 6)


def test_profiles_cover_20_languages_of_valid_trigrams():
    assert len(_TRIGRAM_PROFILES) == 20
    for lang, grams in _TRIGRAM_PROFILES.items():
        assert len(grams) == len(set(grams)), f"duplicate trigram in {lang}"
        for g in grams:
            assert len(g) == 3, f"{lang}: {g!r} is not a character trigram"


def test_lang_id_confusion_matrix(spark):
    rows = [(lang, text) for lang, text in SAMPLES.items()]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["lang_pred"], r["lang_score"])
        for r in lang_id_ngram(df).collect()
    }
    wrong = {
        true: got[true][0] for true in SAMPLES if got[true][0] != true
    }
    assert not wrong, f"misidentified: {wrong}"


def test_map_lookup_plan_matches_direct_definition(spark):
    texts = list(SAMPLES.values()) + [
        "",                       # empty → und
        "zzz qqq xxx",            # no profile hits → und
        "the the the",            # repeated trigrams count every occurrence
        "der die und " * 50,      # long repetitive text
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["lang_pred"], r["lang_score"])
        for r in lang_id_ngram(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _python_mirror(t), f"doc {i} ({t[:30]!r})"


def test_lang_id_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "the cat")], ["doc_id", "text"])
    plan = lang_id_ngram(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_stats_hand_checked(spark):
    from semargl_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),          # 4 words, 1 distinct; bigram "a a" ×3
            (1, "w x y z"),          # no repetition at all
            (2, "go go stop go go"), # "go go" ×2 of 4 bigrams
            (3, "solo"),             # 1 word → no bigrams
            (4, "  "),               # whitespace-only → all zero
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[0]["n_words"] == 4 and got[0]["n_distinct_words"] == 1
    assert got[0]["dup_word_ppm"] == 750000
    assert got[0]["n_bigrams"] == 3 and got[0]["top_bigram_n"] == 3
    assert got[0]["top_bigram_ppm"] == 1000000
    assert got[0]["dup_bigram_ppm"] == 1000000
    assert got[1]["dup_word_ppm"] == 0
    assert got[1]["top_bigram_n"] == 1
    assert got[1]["top_bigram_ppm"] == 333333  # floor(1e6/3)
    assert got[1]["dup_bigram_ppm"] == 0
    # doc 2: bigrams = [go go, go stop, stop go, go go]
    assert got[2]["n_bigrams"] == 4 and got[2]["top_bigram_n"] == 2
    assert got[2]["dup_bigram_ppm"] == 500000
    assert got[3]["n_bigrams"] == 0 and got[3]["top_bigram_ppm"] == 0
    assert got[4]["n_words"] == 0 and got[4]["dup_word_ppm"] == 0


def test_length_quantiles_nearest_rank(spark):
    from semargl_spark.operators.text import length_quantiles

    rows = [(f"d{i}", "s", " ".join(["w"] * n)) for i, n in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    )] + [("e", "s", ""), ("x", "t", "a b c")]
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {r["source"]: r for r in length_quantiles(
        docs, qs=(0.5, 0.9), by="source"
    ).collect()}
    # group s: 11 docs with lengths [0,1..10]; rank ceil(.5*11)=6 -> value 5,
    # rank ceil(.9*11)=10 -> value 9
    assert out["s"]["n_docs"] == 11
    assert out["s"]["q50"] == 5 and out["s"]["q90"] == 9
    # group t: single 3-word doc; every quantile is 3
    assert out["t"]["n_docs"] == 1
    assert out["t"]["q50"] == 3 and out["t"]["q90"] == 3


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from semargl_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab x")],  # 'abab'×3, 'cd'×1, 'x' dropped
        "doc_id int, text string",
    )
    out = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, k=10).collect()]
    # abab pairs: ab, ba, ab → ab 2/word, ba 1/word, ×3 words
    assert out[0] == ("ab", 6)
    assert ("ba", 3) in out and ("cd", 1) in out
    assert len(out) == 3


def test_bpe_pair_counts_tiebreak_and_k(spark):
    import pytest as _pytest

    from semargl_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([(1, "zz aa")], "doc_id int, text string")
    out = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, k=1).collect()]
    assert out == [("aa", 1)]  # tie broken pair-ascending
    with _pytest.raises(ValueError):
        bpe_pair_counts(df, k=0)


def _bpe_train_mirror(word_counts, n_merges):
    """subword-nmt-style reference: overlap-counting pair statistics,
    greedy left-to-right non-overlapping merge on symbol lists."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        stats = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, f"{a} {b}", a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_subword_nmt_mirror(spark):
    from semargl_spark.operators.text import bpe_train

    # adversarial: odd/even same-char runs (overlap counting + greedy
    # left-to-right merge), alternations, and a merged symbol that is a
    # prefix of a longer word
    texts = [
        "aaaaa aaaa aaa ababab",
        "banana bandana aaaaa",
        "low lower lowest low low",
        "abab aa bb ab ba",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    wc = {}
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                wc[w] = wc.get(w, 0) + 1
    expected = _bpe_train_mirror(wc, 6)
    got = [
        (r["step"], r["pair"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=6).orderBy("step").collect()
    ]
    assert got == expected


def test_bpe_segment_matches_mirror_vocab(spark):
    from semargl_spark.operators.text import bpe_segment

    texts = ["aaaaa aaaa ababab", "banana bandana low lower low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    wc = {}
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                wc[w] = wc.get(w, 0) + 1
    # replay the mirror's merges over the vocab to get expected segments
    vocab = {tuple(w): (w, c) for w, c in wc.items()}
    for _, pair, merged, _n in _bpe_train_mirror(wc, 4):
        a, b = pair.split(" ")
        new = {}
        for syms, (w, c) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = (w, c)
        vocab = new
    expected = {
        w: (" ".join(syms), len(syms), c) for syms, (w, c) in vocab.items()
    }
    got = {
        r["word"]: (r["segmented"], r["n_subwords"], r["c"])
        for r in bpe_segment(df, n_merges=4).collect()
    }
    assert got == expected


def test_bpe_train_early_stop_and_validation(spark):
    import pytest as _pytest

    from semargl_spark.operators.text import bpe_train

    # 2-char vocabulary collapses after one merge -> early stop
    df = spark.createDataFrame(
        [(1, "ab ab x")], "doc_id int, text string"
    )
    got = [
        (r["step"], r["pair"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=5).collect()
    ]
    assert got == [(1, "a b", "ab", 2)]
    with _pytest.raises(ValueError):
        bpe_train(df, n_merges=0)


def test_tfidf_search_rare_term_dominates(spark):
    from semargl_spark.operators.text import tfidf_search

    docs = spark.createDataFrame(
        [(0, "apple banana banana"), (1, "apple apple apple"),
         (2, "banana cherry"), (3, "durian")],
        "doc_id long, text string",
    )
    # 'cherry' df=1 (idf 1e6), 'apple' df=2 (5e5)
    out = [(r["doc_id"], r["score"])
           for r in tfidf_search(docs, "apple cherry", k=3).collect()]
    # doc2: cherry 1*1e6; doc1: apple 3*5e5=1.5e6 -> doc1 first
    assert out[0] == (1, 1_500_000) and out[1] == (2, 1_000_000)
    assert out[2] == (0, 500_000)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tfidf_search(docs, "   ", k=3)
    with _pytest.raises(ValueError):
        tfidf_search(docs, "apple", k=0)


def test_inverted_index_cap_and_min_df(spark):
    from semargl_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(i, "common token" + (" rare" if i == 5 else "")) for i in range(30)],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in inverted_index(docs, cap=4).collect()}
    assert out["common"]["df"] == 30
    assert out["common"]["postings_csv"] == "0,1,2,3"
    assert out["rare"]["df"] == 1 and out["rare"]["postings_csv"] == "5"
    out2 = {r["term"] for r in inverted_index(docs, cap=4, min_df=2).collect()}
    assert "rare" not in out2 and "common" in out2


def test_bm25_length_normalization_and_validation(spark):
    from semargl_spark.operators.text import bm25_search

    # same tf for 'apple' but doc 1 is much longer -> doc 0 scores higher
    docs = spark.createDataFrame(
        [(0, "apple pie"), (1, "apple " + "filler " * 40), (2, "banana")],
        "doc_id long, text string",
    )
    out = [(r["doc_id"], r["score"]) for r in
           bm25_search(docs, "apple", k=3).collect()]
    assert [d for d, _ in out] == [0, 1]  # doc 2 has no match -> absent
    assert out[0][1] > out[1][1] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_search(docs, "", k=3)
    with _pytest.raises(ValueError):
        bm25_search(docs, "apple", k=0)


def test_rrf_fuse_hand_computed(spark):
    from semargl_spark.operators.text import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], k=4).collect()}
    s = 10**6
    # doc 20: ranks 2 and 1 -> floor(s/62) + floor(s/61)
    assert out[20]["rrf_score"] == s // 62 + s // 61
    assert out[20]["n_lists"] == 2 and out[20]["best_rank"] == 1
    # doc 10: ranks 1 and 3
    assert out[10]["rrf_score"] == s // 61 + s // 63
    # single-list docs
    assert out[30]["rrf_score"] == s // 63 and out[30]["n_lists"] == 1
    assert out[40]["rrf_score"] == s // 62 and out[40]["best_rank"] == 2
    # both-list docs outrank single-list docs here
    ranked = sorted(out.values(), key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert [r["doc_id"] for r in ranked][:2] == [20, 10]


def test_rrf_fuse_k_cut_ties_and_validation(spark):
    import pytest as _pytest

    from semargl_spark.operators.text import rrf_fuse

    # identical rank multisets -> tie on score, broken by doc_id asc
    a = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(5, 2), (3, 1)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 3

    with _pytest.raises(ValueError):
        rrf_fuse([], k=3)
    with _pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_lang_confusion_operator_diagonal(spark):
    # labeled corpus of clear-language snippets: the confusion matrix
    # operator must put every sample on the diagonal, counts intact
    from semargl_spark.operators.text import lang_confusion

    rows = [(i, text, lang) for i, (lang, text) in enumerate(SAMPLES.items())]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {(r["lang_true"], r["lang_pred"]): r["n_docs"]
           for r in lang_confusion(df).collect()}
    assert all(t == p for (t, p) in out), f"off-diagonal cells: {out}"
    assert sum(out.values()) == len(SAMPLES)


def test_lang_confusion_counts_off_diagonal(spark):
    from semargl_spark.operators.text import lang_confusion

    # two docs labeled 'en': one real English, one gibberish -> und
    df = spark.createDataFrame(
        [(1, SAMPLES["en"], "en"), (2, "zzz qqq xxx", "en")],
        ["doc_id", "text", "lang"],
    )
    out = {(r["lang_true"], r["lang_pred"]): r["n_docs"]
           for r in lang_confusion(df).collect()}
    assert out == {("en", "en"): 1, ("en", "und"): 1}


def test_bpe_oracle_fold_fuzz_matches_mirror():
    """The DuckDB list_reduce string fold in the bpe_train/bpe_segment
    oracle must implement exactly the mirror's greedy left-to-right
    merge — fuzzed over random small-alphabet words (repeated runs,
    alternations, and merged-symbol re-participation all arise)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="ab", min_size=2, max_size=10)
    corpus = st.lists(word, min_size=1, max_size=12)

    @given(corpus)
    @settings(max_examples=200, deadline=None)
    def check(words):
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        merges = _bpe_train_mirror(wc, 3)
        con = duckdb.connect()
        vals = ", ".join(f"('{w}', {c})" for w, c in wc.items())
        sql = f"""
WITH wf AS (SELECT word, CAST(c AS BIGINT) AS c
            FROM (VALUES {vals}) AS t(word, c)),
v0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s, c FROM wf)"""
        for i in range(1, 4):
            sql += f""",
y{i} AS (SELECT s, string_split(s, ' ') AS sy, c FROM v{i - 1}),
p{i} AS (SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                                      i -> sy[i] || ' ' || sy[i + 1])) AS pair, c
         FROM y{i} WHERE len(sy) >= 2),
best{i} AS (SELECT pair, string_split(pair, ' ')[1] AS a,
                   string_split(pair, ' ')[2] AS b,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM p{i} GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
v{i} AS (SELECT CASE WHEN len(y.sy) < 2 OR b.a IS NULL THEN y.s ELSE
                list_reduce(y.sy, (acc, x) ->
                  CASE WHEN (acc = b.a OR ends_with(acc, ' ' || b.a))
                            AND x = b.b
                       THEN acc || b.b ELSE acc || ' ' || x END) END AS s, c
         FROM y{i} y LEFT JOIN best{i} b ON true)"""
        sql += """
SELECT 0 AS step, s AS pair, '' AS merged, c AS n FROM v3
UNION ALL
""" + "\nUNION ALL\n".join(
            f"SELECT {i} AS step, pair, replace(pair, ' ', '') AS merged, n"
            f" FROM best{i}"
            for i in range(1, 4)
        )
        rows = con.sql(sql).fetchall()
        got_merges = sorted(
            (r[0], r[1], r[2], r[3]) for r in rows if r[0] > 0
        )
        got_vocab = sorted((r[1], r[3]) for r in rows if r[0] == 0)
        assert got_merges == [tuple(m) for m in merges]
        # replay mirror merges over the vocab for expected segments
        vocab = {tuple(w): c for w, c in wc.items()}
        for _, pair, merged, _n in merges:
            a, b = pair.split(" ")
            new = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new[tuple(out)] = new.get(tuple(out), 0) + c
            vocab = new
        expected_vocab = sorted(
            (" ".join(syms), c) for syms, c in vocab.items()
        )
        assert got_vocab == expected_vocab

    check()


class TestWordpieceTrain:
    def _docs(self, spark, texts):
        return spark.createDataFrame([(t,) for t in texts], "text string")

    def test_likelihood_beats_raw_frequency(self, spark):
        from semargl_spark.operators.text import bpe_train, wordpiece_train

        # 'xq' is rare but exclusive (x only ever precedes q); 'ab' is
        # frequent but both symbols are diluted across other words.
        docs = self._docs(
            spark,
            ["ab ab ab ab ab", "an an an an", "ax ax ax ax", "xq xq"],
        )
        wp = wordpiece_train(docs, n_merges=1).collect()[0]
        bp = bpe_train(docs, n_merges=1).collect()[0]
        assert bp["pair"] == "a b"      # frequency argmax
        assert wp["pair"] == "x q"      # likelihood argmax
        # score_q = n*P/(ma*mb) = 2*1e12/(6*2)
        assert wp["score_q"] == 2 * 10**12 // 12
        assert wp["n"] == 2

    def test_merge_table_is_ordered_and_applies(self, spark):
        from semargl_spark.operators.text import wordpiece_train

        docs = self._docs(spark, ["zz zz zz"])
        out = wordpiece_train(docs, n_merges=3).collect()
        # one mergeable pair exists; the loop stops when words are
        # fully merged rather than emitting degenerate rounds
        assert [(r["step"], r["merged"]) for r in out] == [(1, "zz")]

    def test_invalid_args(self, spark):
        from semargl_spark.operators.text import wordpiece_train

        docs = self._docs(spark, ["ab"])
        import pytest as _pytest
        with _pytest.raises(ValueError):
            wordpiece_train(docs, n_merges=0)
        with _pytest.raises(ValueError):
            wordpiece_train(docs, precision=0)


# ------------------------------------------------------- unigram tokenizer


def _unigram_mirror(texts, n_pieces, K):
    """Pure-Python replay of unigram_vocab + unigram_segment."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if re.fullmatch(r"[a-z0-9]+", w):
                wf[w] += 1
    agg = Counter()
    for w, c in wf.items():
        for L in range(1, K + 1):
            for i in range(len(w) - L + 1):
                agg[w[i:i + L]] += c
    pieces = {p: c for p, c in agg.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in agg.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:n_pieces]
    pieces.update(dict(multi))
    segs = {}
    for w, c in wf.items():
        dp = [None] * (len(w) + 1)
        dp[0] = (0, 0, "")
        for j in range(1, len(w) + 1):
            best = None
            for L in range(1, min(K, j) + 1):
                cnt = pieces.get(w[j - L:j])
                prev = dp[j - L]
                if cnt is None or prev is None:
                    continue
                cand = (prev[0] + 1, prev[1] - cnt,
                        (prev[2] + " " + w[j - L:j]) if prev[2] else w[j - L:j])
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        n, negs, seg = dp[len(w)]
        segs[w] = (seg, n, -negs, c)
    return pieces, segs


def test_unigram_matches_python_mirror(spark):
    from semargl_spark.operators.text import unigram_segment, unigram_vocab

    texts = [
        "the cat catalog categorical",
        "stream streams streaming streamer",
        "the the the concat cats",
        "zebra quartz 42 code42",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exp_pieces, exp_segs = _unigram_mirror(texts, n_pieces=12, K=3)
    got_v = {
        r["piece"]: r["cnt"]
        for r in unigram_vocab(docs, n_pieces=12, max_piece_len=3).collect()
    }
    assert got_v == exp_pieces
    got_s = {
        r["word"]: (r["segmented"], r["n_pieces"], r["piece_cnt_sum"], r["c"])
        for r in unigram_segment(docs, n_pieces=12, max_piece_len=3).collect()
    }
    assert got_s == exp_segs


def test_unigram_segment_objective_and_tiebreaks(spark):
    from semargl_spark.operators.text import unigram_segment

    # 'abab' repeated makes 'ab' (and 'ba','aba','bab') top pieces;
    # the DP must pick the 2-piece 'ab ab' split, never 4 singles
    docs = spark.createDataFrame(
        [(1, "abab abab abab xyz")], "doc_id long, text string"
    )
    # n_pieces=4 keeps ab/aba/ba/bab and EXCLUDES xy/yz/xyz, so xyz
    # must fall back to the single-char coverage inventory
    got = {
        r["word"]: r
        for r in unigram_segment(docs, n_pieces=4, max_piece_len=3).collect()
    }
    assert got["abab"]["n_pieces"] == 2
    assert got["abab"]["segmented"] == "ab ab"
    assert got["xyz"]["n_pieces"] == 3
    assert got["xyz"]["segmented"] == "x y z"


def test_unigram_segment_partition_invariant(spark):
    from semargl_spark.operators.text import unigram_segment

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 7}") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, unigram_segment(
        docs.repartition(1), n_pieces=16, max_piece_len=3).collect()))
    b = sorted(map(tuple, unigram_segment(
        docs.repartition(7), n_pieces=16, max_piece_len=3).collect()))
    assert a == b


def test_unigram_validation(spark):
    import pytest

    from semargl_spark.operators.text import unigram_vocab

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram_vocab(docs, max_piece_len=0)
    with pytest.raises(ValueError):
        unigram_vocab(docs, n_pieces=-1)


def _textrank_mirror(doc_texts, chunk_words=10, max_chunks=12,
                     threshold_pm=100, rounds=2, top_k=2, scale=10**6):
    out = {}
    for doc_id, text in doc_texts:
        w = [t for t in text.strip().lower().split() if t]
        if not w:
            continue
        n = min((len(w) + chunk_words - 1) // chunk_words, max_chunks)
        segs = [" ".join(w[i*chunk_words:(i+1)*chunk_words])
                for i in range(n)]
        ws = [set(s.split(" ")) for s in segs]
        edges = []
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                u = len(ws[i] | ws[j])
                jac = (1000 * len(ws[i] & ws[j])) // max(u, 1)
                if jac >= threshold_pm:
                    edges.append((i, j))
        deg = {}
        for i, _j in edges:
            deg[i] = deg.get(i, 0) + 1
        r = {i: scale for i in range(n)}
        for _ in range(rounds):
            inflow = {i: 0 for i in range(n)}
            for i, j in edges:  # symmetric edge set: j receives from i
                inflow[j] += r[i] // deg[i]
            r = {i: (15 * scale) // 100 + (85 * inflow[i]) // 100
                 for i in range(n)}
        ranked = sorted(range(n), key=lambda i: (-r[i], i))[:top_k]
        out[doc_id] = [(i, r[i], segs[i]) for i in ranked]
    return out


def test_textrank_segments_matches_python_mirror(spark):
    from semargl_spark.operators.text import textrank_segments

    texts = [
        (1, "alpha beta gamma delta " * 8),          # repetitive: all linked
        (2, "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen "
            "one two three four five six seven eight nine ten"),
        (3, "solo"),                                  # single short chunk
        (4, "  "),                                    # empty after trim: dropped
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for row in textrank_segments(df, chunk_words=5, max_chunks=6,
                                 top_k=2).collect():
        got.setdefault(row["doc_id"], []).append(
            (row["sid"], row["score_micro"], row["segment"]))
    for k in got:
        got[k].sort(key=lambda t: (-t[1], t[0]))
    mirror = _textrank_mirror(texts, chunk_words=5, max_chunks=6, top_k=2)
    mirror = {k: v for k, v in mirror.items() if v}
    assert got == mirror
    assert 4 not in got  # blank doc emits nothing


def test_normalize_text_nfc_controls_whitespace(spark):
    import unicodedata

    from semargl_spark.operators.text import normalize_text

    rows = [
        (0, "plain ascii"),
        (1, "compose é now"),          # -> é (single codepoint)
        (2, "bell\x07strip\x00me"),
        (3, "  lots \t of   space\t\t"),
        (4, "keep\nnewlines\nand\ttabs-as-space"),
        (5, None),
        (6, "ﬁ ligature stays"),         # NFC preserves ﬁ
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert got[0]["text_norm"] == "plain ascii" and not got[0]["changed"]
    assert got[1]["text_norm"] == "compose é now"
    assert got[1]["changed"] and got[1]["n_chars_norm"] == got[1]["n_chars_raw"] - 1
    assert got[2]["text_norm"] == "bellstripme"
    assert got[3]["text_norm"] == "lots of space"
    assert got[4]["text_norm"] == "keep\nnewlines\nand tabs-as-space"
    assert got[5]["text_norm"] is None and got[5]["changed"] is None
    assert got[6]["text_norm"] == "ﬁ ligature stays"
    assert unicodedata.normalize("NFC", got[6]["text_norm"]) == got[6]["text_norm"]


def test_lang_segments_runs_and_blank_lines(spark):
    from semargl_spark.operators.text import lang_segments

    en = "the cat and the dog went to the house in the morning"
    de = "der hund und die katze gehen nicht in das haus"
    # blank padding between same-language lines must NOT split the run
    doc = "\n".join([en, "", "   ", en, de, de])
    df = spark.createDataFrame([(7, doc)], "doc_id long, text string")
    rows = [r.asDict() for r in
            lang_segments(df).orderBy("run_idx").collect()]
    assert rows == [
        {"doc_id": 7, "run_idx": 0, "lang": "en",
         "seg_start": 0, "seg_end": 3, "n_segs": 2},
        {"doc_id": 7, "run_idx": 1, "lang": "de",
         "seg_start": 4, "seg_end": 5, "n_segs": 2},
    ]


def test_html_main_blocks_separates_boilerplate(spark):
    from semargl_spark.operators.text import html_main_blocks

    html = ('<div><a href="/a">Home</a> <a href="/b">About</a></div>'
            '<p>This is a long enough paragraph of real body prose '
            'for keeping &amp; testing.</p>'
            '<div>&copy; <a href="/c">Site</a> footer</div>')
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    rows = {r.block_idx: r for r in html_main_blocks(df).collect()}
    verdicts = {r.block_text: r.kept for r in rows.values()}
    # nav: short + 90% link text → dropped; body: long, 0 links → kept;
    # footer: short → dropped (entity &amp; unescaped, &copy; passes through)
    assert verdicts == {
        "Home About": False,
        "This is a long enough paragraph of real body prose for keeping "
        "& testing.": True,
        "&copy; Site footer": False,
    }
    body = next(r for r in rows.values() if r.kept)
    assert body.link_pm == 0 and body.text_len == 73
    nav = rows[min(rows)]
    assert nav.link_pm == 900


def test_bpe_train_batched_matches_loop(spark):
    """The driver-local fast trainer must be BIT-identical to the
    per-round distributed loop on the same corpus."""
    from semargl_spark.operators.text import bpe_train, bpe_train_batched

    texts = [
        "aaaaa aaaa aaa ababab",
        "banana bandana aaaaa",
        "low lower lowest low low",
        "abab aa bb ab ba",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    loop = [tuple(r) for r in bpe_train(df, n_merges=6).orderBy("step").collect()]
    fast = [tuple(r) for r in
            bpe_train_batched(df, n_merges=6).orderBy("step").collect()]
    assert fast == loop


def test_fast_bpe_merges_fuzz_matches_mirror():
    """Property: the incremental pair-index + lazy-heap trainer equals
    the recount-from-scratch mirror on random small-alphabet corpora
    (stale-heap handling, overlap counting, merged-symbol
    re-participation, tie-breaks all arise)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from semargl_spark.operators.text import _fast_bpe_merges

    word = st.text(alphabet="ab0", min_size=2, max_size=12)
    corpus = st.lists(st.tuples(word, st.integers(1, 9)),
                      min_size=1, max_size=15)

    @given(corpus)
    @settings(max_examples=300, deadline=None)
    def check(pairs):
        wc = {}
        for w, c in pairs:
            wc[w] = wc.get(w, 0) + c
        expected = _bpe_train_mirror(wc, 8)
        got = _fast_bpe_merges(sorted(wc.items()), 8)
        assert got == expected

    check()


def test_wordpiece_train_batched_matches_loop(spark):
    from semargl_spark.operators.text import (
        wordpiece_train,
        wordpiece_train_batched,
    )

    texts = [
        "aaaaa aaaa aaa ababab qz qz qzqz",
        "banana bandana aaaaa",
        "low lower lowest low low qz",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    loop = [tuple(r) for r in
            wordpiece_train(df, n_merges=5).orderBy("step").collect()]
    fast = [tuple(r) for r in
            wordpiece_train_batched(df, n_merges=5).orderBy("step").collect()]
    assert fast == loop


def test_bpe_train_batched_bounding_knobs(spark):
    """min_count / max_words bound driver state deterministically: the
    truncated table trains as if the dropped words never existed."""
    from semargl_spark.operators.text import bpe_train, bpe_train_batched

    df = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa bbbb"), (1, "aaaa cccc")],
        "doc_id int, text string",
    )
    # min_count=2 keeps only 'aaaa' (freq 4)
    out = bpe_train_batched(df, n_merges=2, min_count=2).collect()
    assert [r["merged"] for r in out] == ["aa", "aaaa"]
    # max_words=1 keeps the (c desc, word asc) top word only — 'aaaa'
    out2 = bpe_train_batched(df, n_merges=2, max_words=1).collect()
    assert [r["merged"] for r in out2] == ["aa", "aaaa"]
    # and unbounded equals the loop trainer
    loop = [tuple(r) for r in bpe_train(df, n_merges=3).collect()]
    fast = [tuple(r) for r in bpe_train_batched(df, n_merges=3).collect()]
    assert fast == loop


def test_sentence_split_guards_and_terminators(spark):
    from semargl_spark.operators.text import sentence_split

    rows = [
        (1, "He left. She stayed."),
        (2, "See Dr. Smith at 5 p.m. We left early."),
        (3, "Really?! Yes. Trailing fragment without period"),
        (4, 'He said "Go." "Fine." was the reply.'),
        (5, "J. Doe wrote it. True story."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in sentence_split(df).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence,
                                             r.n_words))
    for k in got:
        got[k].sort()
    assert [s for _, s, _ in got[1]] == ["He left.", "She stayed."]
    # "Dr." and "p.m." are guarded: the abbreviation wins even before a
    # capital (the documented heuristic tradeoff)
    assert [s for _, s, _ in got[2]] == [
        "See Dr. Smith at 5 p.m. We left early."]
    assert [s for _, s, _ in got[3]] == [
        "Really?!", "Yes.", "Trailing fragment without period"]
    assert [s for _, s, _ in got[4]][0] == 'He said "Go."'
    # single-initial guard: "J. Doe" stays together
    assert [s for _, s, _ in got[5]] == ["J. Doe wrote it.", "True story."]
    assert got[1][0][2] == 2  # n_words


def test_linear_text_classifier_train_score_roundtrip(spark):
    """fastText-style hashed-n-gram linear classifier: training on a
    separable synthetic corpus must recover the generating class for
    every document, and the model dict must be JSON-serializable
    (broadcast/lineage contract)."""
    import json

    from pyspark.sql import functions as F

    from semargl_spark.operators.textmodel import (
        score_linear_text_classifier,
        train_linear_text_classifier,
    )

    styles = {
        "prose": "the results clearly improve when methods are compared",
        "spam": "click here buy now cheap deals subscribe free offer",
        "noise": "zxq kjx vvz qkv xjz !!! ### @@@ %%% &&&",
    }
    labels = sorted(styles)
    rows = []
    for i in range(90):
        lab = labels[i % 3]
        words = styles[lab].split()
        k = len(words)
        rows.append(
            (i, lab, " ".join(words[(i + j) % k] for j in range(k)))
        )
    df = spark.createDataFrame(rows, "doc_id long, y string, text string")
    model = train_linear_text_classifier(
        df, "y", n_features=512, epochs=150, max_docs_per_class=20
    )
    json.dumps(model)  # plain dict of lists
    assert model["labels"] == labels
    pred = score_linear_text_classifier(df, model, pred_col="y_pred")
    wrong = (
        pred.join(df.select("doc_id", "y"), "doc_id")
        .filter(F.col("y_pred") != F.col("y"))
        .count()
    )
    assert wrong == 0
    # deterministic retrain: identical weights
    model2 = train_linear_text_classifier(
        df, "y", n_features=512, epochs=150, max_docs_per_class=20
    )
    assert model2 == model


def test_lang_id_model_confusion_vs_trigram_harness(spark):
    """r4 verdict item 2's measurement clause: run the LEARNED
    classifier through the same confusion methodology as
    lang_id_confusion and compare with the trigram heuristic on an
    identical 20-language planted corpus. The learned model must be
    diagonal (zero confusion) and at least match the heuristic."""
    from pyspark.sql import functions as F

    from semargl_spark.operators.text import _TRIGRAM_PROFILES, lang_confusion
    from semargl_spark.operators.textmodel import (
        score_linear_text_classifier,
        train_linear_text_classifier,
    )

    langs = list(_TRIGRAM_PROFILES)
    rows = []
    for i in range(20 * 12):
        lang = langs[i % len(langs)]
        tris = [g.strip() or "xx" for g in _TRIGRAM_PROFILES[lang]]
        k = len(tris)
        rows.append(
            (i, lang, " ".join(tris[(i + j) % k] for j in range(24)))
        )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    model = train_linear_text_classifier(
        df, "lang", n_features=4096, epochs=250, max_docs_per_class=12
    )
    pred = score_linear_text_classifier(df, model, pred_col="lang_pred")
    model_conf = (
        pred.join(df.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("lang_true"), "lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )
    model_off = sum(r.n_docs for r in model_conf if r.lang_true != r.lang_pred)
    assert model_off == 0  # fully diagonal on separable input

    ngram_conf = lang_confusion(df).collect()
    ngram_off = sum(r.n_docs for r in ngram_conf if r.lang_true != r.lang_pred)
    assert model_off <= ngram_off  # learned >= heuristic on this corpus
