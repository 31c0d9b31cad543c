"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the tokenizer-
fitting pass a training-data pipeline runs over the deduped corpus before
tokenizing it.

Reference analog: none — /root/reference has no tokenizer trainer; this is
an LLM-data-pipeline operator (SURVEY.md training-data section), built
Spark-first:

* The CORPUS is touched exactly once, to build the word-count table
  (explode + groupBy with map-side partial aggregation). Everything after
  that runs over the VOCABULARY (distinct words + counts), which is
  bounded (~10⁶-10⁸ rows) however large the corpus is — the standard BPE
  scale split: 10¹² documents, but merge decisions depend only on
  count-weighted distinct words.
* Each merge round is pure JVM column work: adjacent symbol pairs via
  `zip_with` over the symbol array, count-weighted groupBy (map-side
  combine), and the global argmax via a 1-row TakeOrderedAndProject
  tournament. The ONLY driver traffic per round is that single winning
  pair — the merge decision itself, which is inherently global.
* Applying a merge rewrites every word's symbol string with one codegen'd
  `regexp_replace` (lookaround-anchored, so chained pairs like
  `a a a a → aa aa` merge exactly like greedy left-to-right BPE); a
  per-round eager localCheckpoint keeps the plan O(1) in rounds.

Determinism: tie-breaks are (count DESC, left ASC, right ASC), so the
merge table is a pure function of the corpus — pinned in
tests/test_bpe.py against an independent pure-Python reference
implementation and across repartitionings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

END_OF_WORD = "</w>"

_SEP = " "  # symbols never contain spaces: words come from split-on-space

# below this many vocabulary rows the merge loop runs driver-side over the
# collected (symbols, count) table — one job instead of 2 per merge round
# (the same adaptive small-side decision as clustering's driver union-find
# cap). 500k rows × ~60 B ≈ 30 MB on the driver; real web-corpus
# vocabularies (10⁶-10⁸) stay on the distributed path.
DRIVER_BPE_MAX_VOCAB = 500_000


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, n) counts; the single corpus-wide pass."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _rx_quote(sym: str) -> str:
    """Java-regex literal quoting, safe even when the symbol contains the
    \\E quote terminator (close the quote, emit the backslash escaped and
    the E quoted, reopen)."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\\\QE") + "\\E"


def _merge_pattern(left: str, right: str) -> str:
    """Match `left right` between symbol boundaries WITHOUT consuming the
    boundary spaces (lookarounds), so back-to-back occurrences
    (`a a a a`) merge pairwise exactly like greedy left-to-right BPE."""
    return (
        "(?<=^|" + _SEP + ")"
        + _rx_quote(left) + _SEP + _rx_quote(right)
        + "(?=" + _SEP + "|$)"
    )


def _rp_quote(sym: str) -> str:
    """Java-regex REPLACEMENT quoting (Matcher.quoteReplacement): the
    replacement side of regexp_replace interprets `$n` as group refs and
    `\\` as escapes — a merged symbol like `$1` or a trailing backslash
    would throw (or silently substitute) without this."""
    return sym.replace("\\", "\\\\").replace("$", "\\$")


def _sym_str(col) -> F.Column:
    """Word column → space-joined symbol string (chars + end-of-word
    marker). ONE owner: train and encode must symbolize identically or
    the learned merge table stops applying."""
    return F.concat_ws(
        _SEP,
        F.concat(
            F.filter(F.split(col, ""), lambda c: c != ""),
            F.array(F.lit(END_OF_WORD)),
        ),
    )


def train_bpe(
    words: DataFrame,
    num_merges: int,
    min_count: int = 2,
    word_col: str = "word",
    count_col: str = "n",
    driver_vocab_cap: int = DRIVER_BPE_MAX_VOCAB,
) -> list[dict]:
    """Learn `num_merges` BPE merges from a (word, count) table.

    Returns the ordered merge table: [{"rank", "left", "right", "merged",
    "cnt"}, ...], stopping early when no pair reaches `min_count`. The
    list is tiny (== num_merges) — the one legitimately driver-sized
    artifact of tokenizer training.
    """
    vocab = words.select(
        _sym_str(F.col(word_col)).alias("sym_str"),
        F.col(count_col).cast("long").alias("n"),
    ).localCheckpoint(eager=True)

    # adaptive driver path: the merge loop is inherently sequential (each
    # round's argmax depends on the previous merge), so under the vocab
    # cap it is 20+ tiny Spark rounds of pure scheduling overhead —
    # collect the bounded table and run the identical loop locally. The
    # probe is a limit-count on the already-materialized checkpoint
    # (moves no rows); identical merges by construction (pinned in
    # tests/test_bpe.py against the independent Sennrich reference).
    if vocab.limit(driver_vocab_cap + 1).count() <= driver_vocab_cap:
        return _train_bpe_local(vocab.collect(), num_merges, min_count)

    merges: list[dict] = []
    for rank in range(num_merges):
        syms = F.split(F.col("sym_str"), _SEP)
        pair_counts = (
            vocab.filter(F.size(syms) >= 2)
            .select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("n").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
        )
        best = (
            pair_counts.orderBy(
                F.desc("cnt"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "cnt": int(cnt),
            }
        )
        vocab = vocab.select(
            F.regexp_replace(
                "sym_str", _merge_pattern(left, right), _rp_quote(left + right)
            ).alias("sym_str"),
            "n",
        ).localCheckpoint(eager=True)  # plan stays O(1) in rounds
    return merges


def _train_bpe_local(rows, num_merges: int, min_count: int) -> list[dict]:
    """Driver-side merge loop over the collected (sym_str, n) vocabulary —
    EXACTLY the distributed semantics: overlapping adjacent pairs each
    count, argmax tie-break (cnt DESC, left ASC, right ASC — Python's
    code-point string order equals Spark's UTF8 binary order), merges
    applied greedy left-to-right non-overlapping (the lookaround-regex
    behavior), early stop when no pair reaches min_count."""
    import collections

    vocab: dict[tuple, int] = {}
    for r in rows:
        k = tuple(r["sym_str"].split(_SEP))
        vocab[k] = vocab.get(k, 0) + int(r["n"])
    merges: list[dict] = []
    for rank in range(num_merges):
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
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "cnt": int(cnt),
            }
        )
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
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
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + n
        vocab = new_vocab
    return merges


def merges_dataframe(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """Materialize a merge table as a DataFrame (the publishable tokenizer
    artifact)."""
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["cnt"]) for m in merges],
        schema="rank INT, left STRING, right STRING, merged STRING, cnt BIGINT",
    )


def encode_words(
    df: DataFrame, merges: list[dict], word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge table to a word column → `subwords`
    array<string>. Pure JVM: one chained `regexp_replace` per merge over
    the space-joined symbol string — fine for the usual few-hundred-merge
    tables; a very large table (10k+) would fold the loop into one
    Arrow-batched pandas UDF instead to bound plan depth."""
    sym_str = _sym_str(F.col(word_col))
    for m in merges:
        sym_str = F.regexp_replace(
            sym_str, _merge_pattern(m["left"], m["right"]),
            _rp_quote(m["merged"]),
        )
    return df.withColumn("subwords", F.split(sym_str, _SEP))
