"""BPE tokenizer training: the distributed trainer must reproduce the
classic Sennrich algorithm exactly (merge-for-merge, against an
independent pure-Python reference on the same word counts), be invariant
to partitioning, and round-trip encodes losslessly."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from hinbox_spark.operators.bpe import (
    END_OF_WORD,
    encode_words,
    merges_dataframe,
    train_bpe,
    word_counts,
)


def _reference_bpe(word_freqs: dict[str, int], num_merges: int,
                   min_count: int = 2) -> list[tuple[str, str, int]]:
    """Independent driver-side Sennrich BPE: symbol dicts + greedy
    left-to-right merge application. Overlapping adjacent pairs each
    count (the standard convention)."""
    vocab = {
        tuple(word) + (END_OF_WORD,): n for word, n in word_freqs.items()
    }
    merges = []
    for _ in range(num_merges):
        counts: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        eligible = {p: c for p, c in counts.items() if c >= min_count}
        if not eligible:
            break
        (left, right), cnt = min(
            eligible.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


_CORPUS = [
    ("low low low lower lowest newer newer newest wide wider",),
    ("low lower newer newest aaaa aaaa aaaa baab baab",),
    ("the the the them theme scheme scheme wide widest",),
]


def test_trainer_matches_reference_merge_for_merge(spark):
    docs = spark.createDataFrame(_CORPUS, "text string")
    wc = word_counts(docs)
    got = train_bpe(wc, num_merges=15, min_count=2)

    freqs = {r["word"]: r["n"] for r in wc.collect()}
    want = _reference_bpe(freqs, num_merges=15, min_count=2)

    assert [(m["left"], m["right"], m["cnt"]) for m in got] == want
    assert [m["rank"] for m in got] == list(range(len(got)))
    assert all(m["merged"] == m["left"] + m["right"] for m in got)


def test_trainer_is_partitioning_invariant(spark):
    docs = spark.createDataFrame(_CORPUS, "text string")
    a = train_bpe(word_counts(docs.repartition(1)), 10)
    b = train_bpe(word_counts(docs.repartition(7)), 10)
    assert a == b


def test_trainer_stops_when_no_pair_reaches_min_count(spark):
    docs = spark.createDataFrame([("ab cd ef",)], "text string")
    merges = train_bpe(word_counts(docs), num_merges=10, min_count=2)
    assert merges == []  # every word unique → every pair count 1


def test_encode_round_trips_and_applies_greedy_chains(spark):
    docs = spark.createDataFrame(_CORPUS, "text string")
    wc = word_counts(docs)
    merges = train_bpe(wc, num_merges=15, min_count=2)
    enc = {
        r["word"]: r["subwords"]
        for r in encode_words(wc.select("word"), merges).collect()
    }
    for word, subwords in enc.items():
        # lossless: concatenated subwords minus the end marker == word
        assert "".join(subwords).removesuffix(END_OF_WORD) == word
    # the chain case: aaaa merges pairwise (greedy left-to-right), never
    # the overlapping middle pair
    assert enc["aaaa"][:2] == ["aa", "aa"]


def test_merges_dataframe_schema_and_query_runs(spark):
    from hinbox_spark.plans.queries import q_corpus_bpe_merges

    df = q_corpus_bpe_merges(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == ["rank", "left", "right", "merged", "cnt"]
    assert len(rows) == 20  # sf0.001 vocabulary supports all 20 merges
    assert [r["rank"] for r in rows] == list(range(20))
    # counts are count-weighted over the corpus, so monotone claims don't
    # hold in general, but every kept merge must clear min_count
    assert all(r["cnt"] >= 2 for r in rows)


def test_merge_table_identical_across_scales_is_not_required_but_runs(spark):
    """The vocab (not the corpus) drives training: the same generator at a
    bigger sf yields a superset corpus, so we only assert determinism of
    a re-run at the same sf (same table → identical merge list)."""
    from hinbox_spark.plans.queries import q_corpus_bpe_merges

    a = [tuple(r) for r in q_corpus_bpe_merges(spark, "/root/testdata/sf0.001").collect()]
    b = [tuple(r) for r in q_corpus_bpe_merges(spark, "/root/testdata/sf0.001").collect()]
    assert a == b


def test_regex_quoting_handles_metacharacter_symbols(spark):
    """Symbols with regex metacharacters (., *, +) must merge literally —
    the \\Q…\\E quoting path."""
    docs = spark.createDataFrame(
        [("a.b a.b a.b x*y x*y",)], "text string"
    )
    wc = word_counts(docs)
    merges = train_bpe(wc, num_merges=4, min_count=2)
    freqs = {r["word"]: r["n"] for r in wc.collect()}
    want = _reference_bpe(freqs, num_merges=4, min_count=2)
    assert [(m["left"], m["right"], m["cnt"]) for m in merges] == want


def test_replacement_quoting_handles_dollar_and_backslash(spark):
    """The REPLACEMENT side of regexp_replace interprets $n as group refs
    and backslash as an escape — merged symbols like '$1' or 'a\\' must be
    quoted (Matcher.quoteReplacement semantics) or training crashes /
    corrupts. Pinned merge-for-merge vs the pure-Python reference, and the
    encode round-trip must reproduce the raw words."""
    from hinbox_spark.operators.bpe import encode_words

    docs = spark.createDataFrame(
        [("win $100 now win $100 now a\\b a\\b $$$ $$$",)], "text string"
    )
    wc = word_counts(docs)
    merges = train_bpe(wc, num_merges=6, min_count=2)
    freqs = {r["word"]: r["n"] for r in wc.collect()}
    want = _reference_bpe(freqs, num_merges=6, min_count=2)
    assert [(m["left"], m["right"], m["cnt"]) for m in merges] == want

    enc = encode_words(wc.select("word"), merges).collect()
    for r in enc:
        joined = "".join(r["subwords"]).removesuffix("</w>")
        assert joined == r["word"]


def test_distributed_path_equals_driver_path(spark):
    """Force the distributed merge loop (driver_vocab_cap=0) and pin it
    merge-for-merge against the adaptive driver-side path (the r6
    size-probed fast path) on the same word counts."""
    docs = spark.createDataFrame(_CORPUS, "text string")
    wc = word_counts(docs)
    dist = train_bpe(wc, num_merges=12, min_count=2, driver_vocab_cap=0)
    drv = train_bpe(wc, num_merges=12, min_count=2)
    assert dist == drv and len(drv) > 0
