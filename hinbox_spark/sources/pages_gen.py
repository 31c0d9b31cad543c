"""Deterministic synthetic Common-Crawl-style page corpus with planted
ground truth.

Produces the `pages(url, warc_ts, html, text, lang)` table mandated by
BASELINE.json input_hint, plus gold mention/link tables used to score the
pipeline's P/R (≥0.95 target). HTML synthesis follows FIXTURES.md §1 so the
byte-identical extraction invariant is exercised: container variants,
h1/header titles, Advertisement paragraphs, empty paragraphs, a no-<p>
fallback page.

Everything is seeded — no wall-clock, no external data.
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


def _html_page(rng: random.Random, title: str, paragraphs: list[str], page_idx: int) -> str:
    """Wrap paragraphs in one of the container variants (FIXTURES.md §1)."""
    variant = page_idx % 5
    body_parts: list[str] = []

    # occasionally include boilerplate that extraction must drop
    paras = list(paragraphs)
    if rng.random() < 0.5:
        paras.insert(rng.randrange(len(paras) + 1), "Advertisement — subscribe today")
    if rng.random() < 0.3:
        paras.insert(rng.randrange(len(paras) + 1), "   ")

    p_html = "".join(f"<p>{p}</p>" for p in paras)

    if variant == 0:
        body_parts.append(f"<h1>{title}</h1><article>{p_html}</article>")
    elif variant == 1:
        body_parts.append(f"<h1>{title}</h1><div class=\"article-body\">{p_html}</div>")
    elif variant == 2:
        body_parts.append(f"<header>{title}</header><main>{p_html}</main>")
    elif variant == 3:
        body_parts.append(f"<h1>{title}</h1><div class=\"container\">{p_html}</div>")
    else:
        # no-<p> fallback page: paragraphs as bare divs → get_text fallback
        divs = "".join(f"<div>{p}</div>" for p in paragraphs)
        body_parts.append(f"<h1>{title}</h1><article>{divs}</article>")

    nav = "<nav><p>Home</p><p>Sections</p></nav>" if variant in (0, 2) else ""
    # nav <p>s sit OUTSIDE the container so they must not leak into the text
    return f"<html><head><title>{title}</title></head><body>{nav}{body_parts[0]}</body></html>"


def generate_corpus(
    n_pages: int = 200, seed: int = 42
) -> tuple[list[dict], list[GoldMention]]:
    """Generate (pages_rows, gold_mentions).

    pages_rows: dicts with url, warc_ts (datetime), html (bytes), text (""),
    lang. ~5% of pages are exact-duplicate content under a different url
    (exercises dedup), ~4% are non-article pages (no container), ~3% are
    non-English.
    """
    rng = random.Random(seed)
    pages: list[dict] = []
    gold: list[GoldMention] = []
    dup_candidates: list[dict] = []

    for i in range(n_pages):
        url = f"https://news.example.com/{2024 + i % 2}/{i:06d}.html"
        warc_ts = _EPOCH + timedelta(minutes=17 * i)

        if i % 25 == 24:  # non-article page (no recognized container)
            html = f"<html><body><div class='other'><p>Index page {i}</p></div></body></html>"
            pages.append(
                {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "en"}
            )
            continue

        if i % 31 == 30:  # non-English page — pipeline filters on lang
            html = "<html><body><article><p>Página en español sobre la base.</p></article></body></html>"
            pages.append(
                {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "es"}
            )
            continue

        if dup_candidates and i % 20 == 19:  # exact duplicate, different url
            src = rng.choice(dup_candidates)
            pages.append(
                {"url": url, "warc_ts": warc_ts, "html": src["html"], "text": "", "lang": "en"}
            )
            for g in [g for g in gold if g.url == src["url"]]:
                gold.append(GoldMention(url, g.entity_type, g.surface, g.canonical, g.type_attr, g.start_date))
            continue

        # regular article: sample entities and weave sentences
        n_sent = rng.randint(3, 6)
        paragraphs: list[str] = []
        page_people: list[tuple[str, str]] = []
        page_orgs: list[tuple[str, str]] = []
        page_locs: list[tuple[str, str]] = []

        for _ in range(n_sent):
            tpl = rng.choice(_SENTENCES)
            kwargs = {}
            if "{person}" in tpl:
                canonical, variants = rng.choice(PEOPLE_POOL)
                surface = rng.choice(variants)
                kwargs["person"] = surface
                page_people.append((surface, canonical))
            if "{org}" in tpl:
                canonical, variants = rng.choice(ORG_POOL)
                surface = rng.choice(variants)
                kwargs["org"] = surface
                page_orgs.append((surface, canonical))
            if "{loc}" in tpl:
                canonical, variants = rng.choice(LOC_POOL)
                surface = rng.choice(variants)
                kwargs["loc"] = surface
                page_locs.append((surface, canonical))
            paragraphs.append(tpl.format(**kwargs))
            if rng.random() < 0.4:
                paragraphs.append(rng.choice(_FILLER))

        page_events: list[tuple[str, str, str]] = []
        if rng.random() < 0.35:
            title_e, date_e, etype = rng.choice(EVENT_POOL)
            tpl = rng.choice(_EVENT_SENTENCES)
            kwargs = {"event_title": title_e, "event_date": date_e}
            if "{org}" in tpl:
                canonical, variants = rng.choice(ORG_POOL)
                surface = rng.choice(variants)
                kwargs["org"] = surface
                page_orgs.append((surface, canonical))
            if "{person}" in tpl:
                canonical, variants = rng.choice(PEOPLE_POOL)
                surface = rng.choice(variants)
                kwargs["person"] = surface
                page_people.append((surface, canonical))
            paragraphs.append(tpl.format(**kwargs))
            page_events.append((title_e, date_e, etype))

        page_title = f"Report {i}: developments at Guantanamo"
        html = _html_page(rng, page_title, paragraphs, i)
        row = {"url": url, "warc_ts": warc_ts, "html": html.encode(), "text": "", "lang": "en"}
        pages.append(row)
        dup_candidates.append(row)

        for surface, canonical in page_people:
            gold.append(GoldMention(url, "people", surface, canonical, "", ""))
        for surface, canonical in page_orgs:
            gold.append(GoldMention(url, "organizations", surface, canonical, ORG_TYPES[canonical], ""))
        for surface, canonical in page_locs:
            gold.append(GoldMention(url, "locations", surface, canonical, LOC_TYPES[canonical], ""))
        for title_e, date_e, etype in page_events:
            gold.append(GoldMention(url, "events", title_e, title_e, etype, date_e))

    return pages, gold


def pages_dataframe(spark, n_pages: int = 200, seed: int = 42):
    """Create the pages DataFrame (and return gold mentions for scoring)."""
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
