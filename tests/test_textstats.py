"""Text-analysis column expressions (language-ID, quality, token counts)."""

import pyspark.sql.functions as F
import pytest

from hinbox_spark.functions.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    wordpiece_count,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat and the dog sat in the house of the king"),
        (1, "el perro y la casa de la ciudad es un lugar que brilla"),
        (2, "der hund und die katze von dem haus ist mit der stadt"),
        (3, "xyzzy plugh qwerty"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_lang_id(texts):
    out = {r["id"]: r["pred"] for r in
           texts.select("id", lang_id("text").alias("pred")).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "de"
    assert out[3] == "und"


def test_token_counts(texts):
    out = {r["id"]: (r["tc"], r["wc"]) for r in texts.select(
        "id", token_count("text").alias("tc"), wordpiece_count("text").alias("wc")
    ).collect()}
    assert out[0][0] == 12
    assert out[0][1] >= out[0][0]  # wordpieces ≥ whitespace tokens


def test_quality_and_stopwords(texts):
    rows = {r["id"]: r for r in texts.select(
        "id",
        quality_score("text").alias("q"),
        F.round(stopword_ratio("text"), 4).alias("sr"),
    ).collect()}
    assert 0 <= rows[0]["q"] <= 1
    assert rows[0]["q"] > rows[3]["q"]  # english prose beats gibberish
    assert rows[0]["sr"] > 0.3
    assert rows[3]["sr"] == 0.0


def test_fingerprint_blocks_prefix_dups(spark):
    rows = [
        (0, "a b c d e f g h tail one"),
        (1, "a b c d e f g h tail two"),
        (2, "completely different prefix text right here now ok"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = {r["id"]: r["fp"] for r in
           df.select("id", fingerprint("text").alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]
