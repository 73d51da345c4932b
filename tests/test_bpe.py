"""BPE subword induction (operators/bpe.py): hand-computed merges,
three-way trainer parity (Python / in-plan DataFrame / the DuckDB oracle
covered by test_queries_oracle), encode round-trips, and the corpus
tokenization path."""

from __future__ import annotations

from cig_etl_s3_to_sql_data_ingestor_spark.operators import bpe


def test_train_merges_hand_computed():
    # Vocabulary: low x3, lower, lowest, new, newer, newest.
    wc = [
        ("low", 3),
        ("lower", 1),
        ("lowest", 1),
        ("new", 1),
        ("newer", 1),
        ("newest", 1),
    ]
    steps = bpe.train_merges(wc, 5)
    # (l,o) appears in 5 words; (o,w) also 5 but "l o" < "o w" lex;
    # then (lo,w) 5; (e,w) in new/newer/newest 3; (n,ew) 3; (e,r) 2.
    assert [(s[1], s[2]) for s in steps] == [
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
        ("n", "ew"),
        ("e", "r"),
    ]
    assert [s[3] for s in steps] == [5, 5, 3, 3, 2]
    # Token counts shrink by merge_count at every step.
    totals = [s[4] for s in steps]
    assert totals == [29, 24, 21, 18, 16]


def test_identical_symbol_runs_merge_leftmost_nonoverlapping():
    # 'aaaa' -> pairs (a,a) x3. The shared replace convention consumes
    # the separator space, so ONE pair merges per run per step:
    # ' a a a a ' -> ' aa a a '. (Canonical BPE would produce 'aa aa';
    # the deviation is confined to runs of identical symbols and is
    # identical across the Python, Spark, and DuckDB implementations —
    # the next greedy step picks the run up again.)
    steps = bpe.train_merges([("aaaa", 1)], 1)
    assert steps[0][1:4] == ("a", "a", 3)
    assert steps[0][4] == 3  # 'aa a a'
    assert bpe.encode_word("aaaa", [("a", "a")]) == ["aa", "a", "a"]
    assert bpe.encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    # Non-adjacent repeats of the pair DO all merge in one pass.
    assert bpe.encode_word("aabaa", [("a", "a")]) == ["aa", "b", "aa"]


def test_in_plan_trainer_matches_python(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    ).repartition(5)
    wc = bpe.word_counts(df)
    py = bpe.train_merges([(r.word, r.n) for r in wc.collect()], 4)
    sp, _ = bpe.bpe_train_plan(spark, wc, 4)
    assert [tuple(r) for r in sp.collect()] == py


def test_encode_words_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "streaming stream streams streamed")], "doc_id long, text string"
    )
    wc = bpe.word_counts(df)
    merges = bpe.train_bpe(wc, n_merges=6)
    enc = bpe.encode_words(wc, merges).collect()
    assert enc, "no encoded words"
    for r in enc:
        assert "".join(r.subwords) == r.word
        assert r.n_subwords == len(r.subwords)


def test_subword_tokenize_counts_and_fallback(spark):
    train = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    wc = bpe.word_counts(train)
    merges = bpe.train_bpe(wc, n_merges=1)
    assert merges == [("a", "b")]
    enc = bpe.encode_words(wc, merges)
    # Corpus contains a word ('zz') missing from the trained vocabulary:
    # it must fall back to its character count, not drop.
    corpus = spark.createDataFrame(
        [(10, "ab ab zz")], "doc_id long, text string"
    )
    out = bpe.subword_tokenize(corpus, enc).collect()
    assert len(out) == 1
    assert out[0].n_words == 3
    assert out[0].n_subwords == 1 + 1 + 2


def test_train_bpe_caps_bound_driver_work(spark):
    df = spark.createDataFrame(
        [(f"w{i:03d} common common",) for i in range(40)], "text string"
    )
    wc = bpe.word_counts(df)
    # max_words=1 keeps only the most frequent word ('common'): merges can
    # only come from inside it.
    merges = bpe.train_bpe(wc, n_merges=2, max_words=1)
    for left, right in merges:
        assert (left + right) in "common"


def test_train_plan_exhausted_merges_keeps_vocabulary(spark):
    """Requesting more merges than the vocabulary supports must stop at
    exhaustion (like the Python trainer), NOT wipe the encoding frame
    via a crossJoin against an empty argmax (review finding)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.bpe import bpe_train_plan

    wc = spark.createDataFrame([("ab", 3)], ["word", "n"])
    steps, encoded = bpe_train_plan(spark, wc, n_merges=5)
    assert steps.count() == 1  # 'a b' -> 'ab' is the only possible merge
    assert encoded.count() == 1  # the vocabulary frame survives
    assert encoded.first()["word"] == "ab"


def test_train_plan_zero_merges_returns_char_encoding(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.bpe import bpe_train_plan

    wc = spark.createDataFrame([("hi", 2)], ["word", "n"])
    steps, encoded = bpe_train_plan(spark, wc, n_merges=0)
    assert steps.count() == 0
    assert encoded.first()["syms"].strip() == "h i"
