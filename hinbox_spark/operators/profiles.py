"""Stage 6: per-entity versioned profiles with citation grounding.

The reference generates profiles with an LLM + reflection loop
(/root/reference/src/engine/profiles.py:105-494) and verifies citation
grounding with per-claim LLM calls (src/utils/quality_controls.py:512-750).
The deterministic rebuild assembles the profile from structured facts in one
applyInPandas pass per cluster — the whole fold the reference does
article-by-article becomes a single grouped aggregation (SURVEY §2 P1-P3):

- profile.text: templated sections, every factual line cited `^[url]`;
- profile.tags: entity category + activity tags; confidence = deterministic
  function of evidence count (clamped to [0,1], P4);
- profile_versions: one snapshot per contributing article, ordered by
  warc_ts (append-only numbering per profiles.py:39-83);
- grounding: `^[url]` citations are regex-extracted and verified by a join
  back to the pages table — a missing url = missing_source; score =
  verified/total (quality_controls.py:544-750).
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hinbox_spark.config import (
    PROFILE_QC_MIN_TAG_COUNT, PROFILE_QC_MIN_TEXT_LENGTH,
)

CITATION_RE = re.compile(r"\^\[([^\]\s]+)\]")

PROFILE_SCHEMA = (
    "entity_id string, entity_type string, canonical_name string, "
    "profile_text string, profile_tags array<string>, "
    "profile_confidence double, profile_sources array<string>, "
    "current_version int, "
    "versions array<struct<version_number:int, text:string, "
    "trigger_url:string, created_at:timestamp>>, "
    "qc_flags array<string>, name_variants array<string>"
)


# deterministic cap on articles folded into one profile — a mega-entity
# (millions of mentioning pages) must not produce an unbounded profile row;
# total coverage is still reported via entities.n_articles and edge triples
PROFILE_ARTICLES_CAP = 20


def build_profiles(mention_clusters: DataFrame, entities: DataFrame) -> DataFrame:
    """Grouped profile assembly: one applyInPandas over cluster_id.

    Input is pre-reduced to one row per (cluster, url), earliest
    PROFILE_ARTICLES_CAP articles per cluster — so group sizes are bounded
    regardless of entity popularity."""
    from hinbox_spark.functions.skew import bounded_topk

    ent = entities.select(
        "cluster_id", "entity_id", "entity_type", "canonical_name",
        "canonical_type", "aliases", "all_names", "n_articles",
    )
    per_article = (
        mention_clusters.groupBy("cluster_id", "url")
        .agg(
            F.min("warc_ts").alias("warc_ts"),
            F.max("description").alias("description"),
            F.max("start_date").alias("start_date"),
        )
    )
    # tournament top-k (skew.bounded_topk): identical rows to the naive
    # row_number window, but a mega-entity's articles never serialize into
    # one sort task
    rows = bounded_topk(
        per_article,
        keys=["cluster_id"],
        order_by=[F.col("warc_ts"), F.col("url")],
        k=PROFILE_ARTICLES_CAP,
        salt_expr=F.xxhash64("url"),
    ).join(ent, "cluster_id")

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_ts", "url"])
        eid = pdf["entity_id"].iloc[0]
        etype = pdf["entity_type"].iloc[0]
        cname = pdf["canonical_name"].iloc[0]
        ctype = pdf["canonical_type"].iloc[0]
        n_articles_total = int(pdf["n_articles"].iloc[0])

        def _aslist(v):
            return list(v) if v is not None else []

        aliases = [a for a in _aslist(pdf["aliases"].iloc[0]) if a != cname]
        all_names = _aslist(pdf["all_names"].iloc[0])

        urls = list(dict.fromkeys(pdf["url"]))  # earliest-first (pre-capped)
        noun = {
            "people": "person",
            "organizations": "organization",
            "locations": "location",
            "events": "event",
        }[etype]

        lines = ["### Overview"]
        first_url = urls[0]
        kind = f"{ctype} {noun}".strip() if ctype else noun
        lines.append(f"{cname} is a {kind} referenced in the corpus.^[{first_url}]")
        if aliases:
            lines.append(
                "Also referred to as " + ", ".join(sorted(aliases)) + f".^[{first_url}]"
            )
        if etype == "events":
            sd = pdf["start_date"].iloc[0]
            if sd:
                lines.append(f"The event began on {sd}.^[{first_url}]")
            descs = [d for d in dict.fromkeys(pdf["description"]) if d]
            for d, u in zip(descs[:3], urls[:3]):
                lines.append(f"{d}^[{u}]")
        lines.append("### Coverage")
        for u in urls[:10]:
            lines.append(f"Mentioned in {u}.^[{u}]")
        lines.append(
            f"Referenced in {n_articles_total} article(s) in total.^[{first_url}]"
        )
        text = "\n".join(lines)

        tags = sorted({t for t in (ctype, noun) if t})
        confidence = max(0.0, min(1.0, 0.5 + 0.05 * n_articles_total))

        versions = [
            {
                "version_number": vn,
                "text": f"{cname}: profile over {vn} article(s).",
                "trigger_url": row["url"],
                "created_at": row["warc_ts"],
            }
            for vn, (_, row) in enumerate(pdf.iterrows(), start=1)
        ]

        flags = []
        if len(text) < PROFILE_QC_MIN_TEXT_LENGTH:
            flags.append("text_too_short")
        if not CITATION_RE.search(text):
            flags.append("no_citations")
        if len(tags) < PROFILE_QC_MIN_TAG_COUNT:
            tags = sorted(set(tags) | {"needs-review"})
            flags.append("tags_below_minimum")

        return pd.DataFrame(
            {
                "entity_id": [eid],
                "entity_type": [etype],
                "canonical_name": [cname],
                "profile_text": [text],
                "profile_tags": [tags],
                "profile_confidence": [confidence],
                "profile_sources": [urls],
                "current_version": [len(versions)],
                "versions": [versions],
                "qc_flags": [flags],
                "name_variants": [sorted({cname, *aliases, *all_names})],
            }
        )

    return rows.groupBy("cluster_id").applyInPandas(_assemble, PROFILE_SCHEMA)


def ground_profiles(profiles: DataFrame, articles: DataFrame) -> DataFrame:
    """Deterministic grounding verification (P6).

    Citations explode → left join pages on url (null = missing_source) →
    claim verified iff any of the entity's name variants appears in the
    cited article text. grounding_score = verified / total citations.
    """

    @F.pandas_udf("array<string>")
    def _citations(text: pd.Series) -> pd.Series:
        return text.map(lambda t: CITATION_RE.findall(t or ""))

    # the report self-joins profiles; checkpoint so the applyInPandas
    # assembly runs once, not three times
    profiles = profiles.localCheckpoint(eager=False)

    cited = (
        profiles.select(
            "entity_id",
            "name_variants",
            _citations(F.col("profile_text")).alias("cites"),
        )
        .withColumn("cite_url", F.explode("cites"))
        .drop("cites")
    )

    joined = cited.join(
        articles.select(F.col("url").alias("cite_url"), "text"), "cite_url", "left"
    )

    verified = joined.withColumn(
        "status",
        F.when(F.col("text").isNull(), F.lit("missing_source"))
        .when(
            F.exists(
                "name_variants",
                lambda v: F.instr(F.lower(F.col("text")), F.lower(v)) > 0,
            ),
            F.lit("supported"),
        )
        .otherwise(F.lit("not_supported")),
    )

    report = verified.groupBy("entity_id").agg(
        F.count("*").alias("total_claims"),
        F.sum(F.when(F.col("status") == "supported", 1).otherwise(0)).alias(
            "verified_claims"
        ),
        F.sum(F.when(F.col("status") == "missing_source", 1).otherwise(0)).alias(
            "missing_sources"
        ),
    ).withColumn(
        "grounding_score",
        F.when(
            F.col("total_claims") > 0,
            F.col("verified_claims") / F.col("total_claims"),
        ).otherwise(F.lit(0.0)),
    )

    return profiles.join(report, "entity_id", "left")
