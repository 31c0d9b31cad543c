"""Within-article QC parity (reference quality_controls.py:218-306 +
variant collapse :127-215): required-field drops, NFC normalization,
exact-key dedup, variant collapse with alias absorption, mention-in-text
validation."""

from hinbox_spark.operators.extraction import _qc_article


def _m(etype, name, type_attr="t", desc="d", start=""):
    return {
        "entity_type": etype, "name": name, "type": type_attr,
        "description": desc, "start_date": start, "end_date": "",
        "is_fuzzy_date": False,
    }


def test_required_field_drop_events():
    text = "the Hearing happened"
    out = _qc_article("u", text, [
        _m("events", "Hearing", "hearing", "desc", ""),        # missing start_date
        _m("events", "Hearing", "hearing", "", "2023-01-01"),  # missing description
        _m("events", "Hearing", "hearing", "desc", "2023-01-01"),
    ])
    assert len(out) == 1
    assert out[0]["start_date"] == "2023-01-01"


def test_nfc_and_whitespace_normalization():
    text = "Mohammed  Al-Qahtani spoke"
    out = _qc_article("u", text, [_m("people", "Mohammed  Al-Qahtani", "person")])
    assert out[0]["name"] == "Mohammed Al-Qahtani"


def test_exact_key_dedup_and_same_name_type_collapse():
    text = "the FBI and the FBI again"
    out = _qc_article("u", text, [
        _m("organizations", "FBI", "government"),
        _m("organizations", "fbi", "government"),   # same (name, type) key → deduped
        _m("organizations", "FBI", "ngo"),          # distinct key, but X5
                                                    # collapses same-name
                                                    # type variants (reference
                                                    # quality_controls.py:127-215)
    ])
    assert len(out) == 1
    assert out[0]["aliases"] == ["FBI"] or out[0]["aliases"] == []


def test_mention_in_text_guard():
    out = _qc_article("u", "only the CIA is here", [
        _m("organizations", "CIA", "government"),
        _m("organizations", "FBI", "government"),   # hallucinated
    ])
    assert [m["name"] for m in out] == ["CIA"]


def test_variant_collapse_containment():
    text = "Homeland Security officials from the Department of Homeland Security"
    out = _qc_article("u", text, [
        _m("organizations", "Homeland Security", "government"),
        _m("organizations", "Department of Homeland Security", "government"),
    ])
    assert len(out) == 1
    keeper = out[0]
    assert keeper["name"] == "Department of Homeland Security"
    assert "Homeland Security" in keeper["aliases"]


def test_people_never_collapse_in_article():
    text = "John Smith met John Smithson"
    out = _qc_article("u", text, [
        _m("people", "John Smith", "person"),
        _m("people", "John Smithson", "person"),
    ])
    assert len(out) == 2


def test_qc_flag_high_drop_rate():
    """>50% required-field drops of a type (and >2 extracted) trips
    high_drop_rate for that type (reference quality_controls.py:289-290)."""
    flags = []
    out = _qc_article("u", "the Hearing happened", [
        _m("events", "Hearing", "hearing", "d", ""),   # missing start_date
        _m("events", "Hearing2", "hearing", "d", ""),
        _m("events", "Hearing3", "hearing", "d", ""),
        _m("events", "Hearing", "hearing", "d", "2023-01-01"),
    ], flags_out=flags)
    assert ("events", "high_drop_rate") in flags
    assert len(out) == 1


def test_qc_flag_many_duplicates():
    """>50% exact-key dedups + collapsed variants trips many_duplicates
    (reference quality_controls.py:291-292)."""
    flags = []
    out = _qc_article("u", "the FBI met the FBI and the FBI", [
        _m("organizations", "FBI", "government"),
        _m("organizations", "FBI", "government"),
        _m("organizations", "FBI", "government"),
        _m("organizations", "FBI", "government"),
    ], flags_out=flags)
    assert ("organizations", "many_duplicates") in flags
    assert len(out) == 1


def test_qc_flag_many_low_quality_names():
    """≥2 surviving entities of a type with generic/descriptive names trips
    many_low_quality_names (reference quality_controls.py:295-306)."""
    flags = []
    text = "Senior Officials met Security Forces at the Military Base"
    out = _qc_article("u", text, [
        _m("organizations", "Senior Officials", "government"),
        _m("organizations", "Security Forces", "military"),
    ], flags_out=flags)
    assert ("organizations", "many_low_quality_names") in flags
    assert len(out) == 2


def test_qc_flags_not_tripped_on_clean_article():
    flags = []
    _qc_article("u", "the FBI met the CIA", [
        _m("organizations", "FBI", "government"),
        _m("organizations", "CIA", "government"),
    ], flags_out=flags)
    assert flags == []


def test_qc_flags_flow_into_metrics(spark, tmp_path):
    """X3 end-to-end: a crafted duplicate-heavy article produces qc_flag
    rows from the extraction pass, the qc_flags table lands next to
    mentions, and the metrics table carries the qc_* counters beside the
    skip reasons."""
    import datetime

    import pyspark.sql.functions as F

    from hinbox_spark.pipeline import run_pipeline

    ts = datetime.datetime(2024, 1, 1)
    # Guantanamo keyword → relevant; 'CIA' in four sentences → 4 raw
    # mentions, 3 exact-key dedups = >50% → many_duplicates
    body = (
        "The CIA reviewed Guantanamo files. The CIA met again. "
        "The CIA replied. The CIA closed the case."
    )
    html = f"<html><body><article><p>{body}</p></article></body></html>".encode()
    pages = spark.createDataFrame(
        [("u1", ts, html, "", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    t = run_pipeline(spark, pages, str(tmp_path / "qc_out"), resume=False)

    qc = {(r["url"], r["entity_type"], r["qc_flag"])
          for r in t["qc_flags"].collect()}
    assert ("u1", "organizations", "many_duplicates") in qc
    # mentions table carries no flag rows and no qc_flag column
    assert "qc_flag" not in t["mentions"].columns
    assert t["mentions"].filter(F.col("name") == "").count() == 0
    # metrics: qc_* counter rows at run level
    metrics = {r["stage"]: r["rows"] for r in t["metrics"].collect()}
    assert metrics.get("qc_many_duplicates", 0) >= 1


def test_relevance_predicate_and_skip_summary(spark):
    """F4/A2: explicit relevance predicate + per-reason skip counters."""
    import datetime

    from hinbox_spark.config import get_default_config
    from hinbox_spark.functions.ner import default_gazetteer
    from hinbox_spark.operators.extraction import (
        extract_articles, extract_mentions, relevance_predicate,
        skip_reason_summary,
    )

    ts = datetime.datetime(2024, 1, 1)
    mk = lambda body: f"<html><body><article><p>{body}</p></article></body></html>".encode()
    pages = spark.createDataFrame(
        [
            ("r1", ts, mk("Omar Khadr appeared at Guantanamo Bay today."), "", "en"),
            ("i1", ts, mk("Weather was sunny with mild winds."), "", "en"),   # not relevant
            ("e1", ts, b"<html><body><div class='x'>no container</div></body></html>", "", "en"),
            ("s1", ts, mk("Pagina en espanol."), "", "es"),                    # wrong lang
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = get_default_config()
    articles = extract_articles(pages).cache()
    relevant = articles.filter(relevance_predicate(cfg.relevance_keywords))
    assert {r["url"] for r in relevant.collect()} == {"r1"}

    mentions = extract_mentions(relevant, default_gazetteer())
    counts = {
        r["reason"]: r["n"]
        for r in skip_reason_summary(
            pages, articles, mentions, cfg.relevance_keywords
        ).collect()
    }
    assert counts == {
        "wrong_lang": 1,
        "empty_content": 1,
        "not_relevant": 1,
        "no_mentions": 0,
        "processed": 1,
    }


def test_null_lang_pages_counted_as_wrong_lang(spark):
    """ADVICE r2: a null-lang page is neither == nor != 'en' under SQL
    three-valued logic — the null-safe comparison must put it in
    wrong_lang so the A2 counters still partition the input page set."""
    import datetime

    from hinbox_spark.config import get_default_config
    from hinbox_spark.functions.ner import default_gazetteer
    from hinbox_spark.operators.extraction import (
        extract_articles, extract_mentions, relevance_predicate,
        skip_reason_summary,
    )

    ts = datetime.datetime(2024, 1, 1)
    mk = lambda body: f"<html><body><article><p>{body}</p></article></body></html>".encode()
    pages = spark.createDataFrame(
        [
            ("r1", ts, mk("Omar Khadr appeared at Guantanamo Bay today."), "", "en"),
            ("n1", ts, mk("Unlabeled language page."), "", None),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = get_default_config()
    articles = extract_articles(pages).cache()
    mentions = extract_mentions(
        articles.filter(relevance_predicate(cfg.relevance_keywords)),
        default_gazetteer(),
    )
    counts = {
        r["reason"]: r["n"]
        for r in skip_reason_summary(
            pages, articles, mentions, cfg.relevance_keywords
        ).collect()
    }
    assert counts["wrong_lang"] == 1
    # every input page lands in exactly one bucket
    assert sum(counts.values()) == pages.count()
