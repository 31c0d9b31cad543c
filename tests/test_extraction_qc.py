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
