"""Deterministic synthetic Common-Crawl-style page corpus with planted
ground truth.

Produces the `pages(url, warc_ts, html, text, lang)` table mandated by
BASELINE.json input_hint, plus gold mention/link tables used to score the
pipeline's P/R (≥0.95 target). HTML synthesis follows FIXTURES.md §1 so the
byte-identical extraction invariant is exercised: container variants,
h1/header titles, Advertisement paragraphs, empty paragraphs, a no-<p>
fallback page.

Generation is **per-index deterministic** (`page_record(i, seed)` depends
only on (i, seed)), which makes it embarrassingly parallel: the distributed
path (`pages_dataframe_distributed`) renders pages inside mapInPandas over
spark.range(n) — the corpus never passes through the driver, exactly how a
real 10^12-page table would be materialized. The driver-side path
(`generate_corpus`) returns the same rows plus gold mentions for tests.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

from hinbox_spark.config import DOMAIN_LOCS, DOMAIN_ORGS, DOMAIN_PEOPLE

# (canonical, [surface variants]) — variants include acronyms, aliases,
# containment short-forms; linking must cluster all variants per canonical.
PEOPLE_POOL: list[tuple[str, list[str]]] = [(p, [p]) for p in DOMAIN_PEOPLE]
ORG_POOL: list[tuple[str, list[str]]] = [
    (c, list(vs)) for c, (_, vs) in DOMAIN_ORGS.items()
]
LOC_POOL: list[tuple[str, list[str]]] = [
    (c, list(vs)) for c, (_, vs) in DOMAIN_LOCS.items()
]

EVENT_POOL: list[tuple[str, str, str]] = [
    # (title, start_date, event_type)
    ("Periodic Review Hearing", "2023-03-14", "hearing"),
    ("Detainee Transfer", "2022-11-02", "transfer"),
    ("Military Commission Arraignment", "2021-09-07", "hearing"),
    ("Hunger Strike Protest", "2013-04-01", "protest"),
    ("Camp Closure Announcement", "2021-02-12", "announcement"),
    ("Habeas Corpus Ruling", "2020-06-25", "ruling"),
]

ORG_TYPES = {c: t for c, (t, _) in DOMAIN_ORGS.items()}
LOC_TYPES = {c: t for c, (t, _) in DOMAIN_LOCS.items()}

_EPOCH = datetime(2024, 1, 1)

_SENTENCES = [
    "{person} said the review would continue at {loc}.",
    "Officials from the {org} visited {loc} last week.",
    "{person} criticized the {org} over detention policy.",
    "The {org} confirmed that {person} attended the briefing.",
    "Lawyers for {person} filed a motion near {loc}.",
    "A spokesperson for the {org} declined to comment on {loc} operations.",
    "{person} met representatives of the {org} in {loc}.",
    "The facility at {loc} remains under review by the {org}.",
]

_EVENT_SENTENCES = [
    "The {event_title} began on {event_date} according to the {org}.",
    "During the {event_title} on {event_date}, {person} testified.",
]

_FILLER = [
    "The report was released to the public after a lengthy review.",
    "Several documents remain classified, officials said.",
    "The hearing adjourned without a ruling.",
    "Reporters were allowed limited access to the proceedings.",
    "The policy has been debated for more than a decade.",
    "No timeline was provided for the next steps.",
]


@dataclass
class GoldMention:
    url: str
    entity_type: str
    surface: str        # the surface form planted in the text
    canonical: str      # gold canonical name (cluster id within type)
    type_attr: str      # org/loc category; event_type for events
    start_date: str     # events only, "" otherwise


def _url(i: int) -> str:
    return f"https://news.example.com/{2024 + i % 2}/{i:06d}.html"


def _ts(i: int) -> datetime:
    return _EPOCH + timedelta(minutes=17 * i)


def _is_index_page(i: int) -> bool:
    return i % 25 == 24


def _is_spanish(i: int) -> bool:
    return i % 31 == 30 and not _is_index_page(i)


def _is_dup(i: int) -> bool:
    return i % 20 == 19 and i >= 20 and not (_is_index_page(i) or _is_spanish(i))


def _dup_source(i: int) -> int:
    j = i - 13
    while _is_index_page(j) or _is_spanish(j) or _is_dup(j):
        j -= 1
    return j


def _html_page(rng: random.Random, title: str, paragraphs: list[str], page_idx: int) -> str:
    """Wrap paragraphs in one of the container variants (FIXTURES.md §1)."""
    variant = page_idx % 5
    paras = list(paragraphs)
    if rng.random() < 0.5:
        paras.insert(rng.randrange(len(paras) + 1), "Advertisement — subscribe today")
    if rng.random() < 0.3:
        paras.insert(rng.randrange(len(paras) + 1), "   ")

    p_html = "".join(f"<p>{p}</p>" for p in paras)

    if variant == 0:
        body = f"<h1>{title}</h1><article>{p_html}</article>"
    elif variant == 1:
        body = f"<h1>{title}</h1><div class=\"article-body\">{p_html}</div>"
    elif variant == 2:
        body = f"<header>{title}</header><main>{p_html}</main>"
    elif variant == 3:
        body = f"<h1>{title}</h1><div class=\"container\">{p_html}</div>"
    else:
        # no-<p> fallback page: paragraphs as bare divs → get_text fallback
        divs = "".join(f"<div>{p}</div>" for p in paragraphs)
        body = f"<h1>{title}</h1><article>{divs}</article>"

    nav = "<nav><p>Home</p><p>Sections</p></nav>" if variant in (0, 2) else ""
    # realistic boilerplate OUTSIDE the container: navigation, related-story
    # teasers, footer chrome — byte-identical extraction must strip all of it
    chrome_items = "".join(
        f"<li><a href='/s/{rng.randrange(10**6)}'>Related story {k}: "
        f"{rng.choice(_FILLER)}</a></li>"
        for k in range(rng.randint(8, 16))
    )
    sidebar = (
        f"<aside class='related'><ul>{chrome_items}</ul>"
        f"<div class='widget'><p>Subscribe for unlimited access.</p>"
        f"<p>Follow us on social media.</p></div></aside>"
    )
    footer = (
        "<footer><div class='links'>"
        + "".join(f"<span><a href='/p/{k}'>Section {k}</a></span>" for k in range(12))
        + "<p>Copyright. All rights reserved. Terms of use. Privacy policy.</p>"
        "</div></footer>"
    )
    # nav/aside/footer sit OUTSIDE the container so they must not leak
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body>{nav}{body}{sidebar}{footer}</body></html>"
    )


def _article_html(i: int, seed: int) -> tuple[str, list[GoldMention]]:
    """Render the regular-article html for index i (gold carries url(i))."""
    rng = random.Random(seed * 1_000_003 + i)
    url = _url(i)
    gold: list[GoldMention] = []
    n_sent = rng.randint(6, 12)  # realistic article length (~2-5 KB html)
    paragraphs: list[str] = []

    for _ in range(n_sent):
        tpl = rng.choice(_SENTENCES)
        kwargs = {}
        if "{person}" in tpl:
            canonical, variants = rng.choice(PEOPLE_POOL)
            surface = rng.choice(variants)
            kwargs["person"] = surface
            gold.append(GoldMention(url, "people", surface, canonical, "", ""))
        if "{org}" in tpl:
            canonical, variants = rng.choice(ORG_POOL)
            surface = rng.choice(variants)
            kwargs["org"] = surface
            gold.append(
                GoldMention(url, "organizations", surface, canonical, ORG_TYPES[canonical], "")
            )
        if "{loc}" in tpl:
            canonical, variants = rng.choice(LOC_POOL)
            surface = rng.choice(variants)
            kwargs["loc"] = surface
            gold.append(
                GoldMention(url, "locations", surface, canonical, LOC_TYPES[canonical], "")
            )
        paragraphs.append(tpl.format(**kwargs))
        if rng.random() < 0.6:
            paragraphs.append(" ".join(rng.choice(_FILLER) for _ in range(3)))

    if rng.random() < 0.35:
        title_e, date_e, etype = rng.choice(EVENT_POOL)
        tpl = rng.choice(_EVENT_SENTENCES)
        kwargs = {"event_title": title_e, "event_date": date_e}
        if "{org}" in tpl:
            canonical, variants = rng.choice(ORG_POOL)
            surface = rng.choice(variants)
            kwargs["org"] = surface
            gold.append(
                GoldMention(url, "organizations", surface, canonical, ORG_TYPES[canonical], "")
            )
        if "{person}" in tpl:
            canonical, variants = rng.choice(PEOPLE_POOL)
            surface = rng.choice(variants)
            kwargs["person"] = surface
            gold.append(GoldMention(url, "people", surface, canonical, "", ""))
        paragraphs.append(tpl.format(**kwargs))
        gold.append(GoldMention(url, "events", title_e, title_e, etype, date_e))

    page_title = f"Report {i}: developments at Guantanamo"
    html = _html_page(rng, page_title, paragraphs, i)
    return html, gold


def page_record(i: int, seed: int = 42) -> tuple[dict, list[GoldMention]]:
    """One page row + its gold mentions, from (i, seed) alone."""
    url, warc_ts = _url(i), _ts(i)

    if _is_index_page(i):
        html = f"<html><body><div class='other'><p>Index page {i}</p></div></body></html>"
        return (
            {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "en"},
            [],
        )

    if _is_spanish(i):
        html = "<html><body><article><p>Página en español sobre la base.</p></article></body></html>"
        return (
            {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "es"},
            [],
        )

    if _is_dup(i):
        j = _dup_source(i)
        html, src_gold = _article_html(j, seed)
        gold = [
            GoldMention(url, g.entity_type, g.surface, g.canonical, g.type_attr, g.start_date)
            for g in src_gold
        ]
        return (
            {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "en"},
            gold,
        )

    html, gold = _article_html(i, seed)
    return (
        {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "en"},
        gold,
    )


def generate_corpus(
    n_pages: int = 200, seed: int = 42
) -> tuple[list[dict], list[GoldMention]]:
    """Driver-side generation (tests): (pages_rows, gold_mentions)."""
    pages: list[dict] = []
    gold: list[GoldMention] = []
    for i in range(n_pages):
        row, g = page_record(i, seed)
        pages.append(row)
        gold.extend(g)
    return pages, gold


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_dataframe(spark, n_pages: int = 200, seed: int = 42):
    """Driver-side pages DataFrame + gold mentions (test-sized corpora)."""
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    rows, gold = generate_corpus(n_pages, seed)
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema,
    )
    return df, gold


def pages_dataframe_distributed(spark, n_pages: int, seed: int = 42,
                                partitions: int | None = None):
    """Executor-side corpus materialization: spark.range → mapInPandas
    rendering each page from its index. No driver bottleneck — the path a
    real web-scale ingest would take (bench + scaling runs use this)."""
    import pandas as pd

    def _render(batches):
        for pdf in batches:
            rows = [page_record(int(i), seed)[0] for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng = spark.range(n_pages)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(_render, PAGES_SCHEMA_DDL)
