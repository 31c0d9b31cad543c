"""Serving-layer queries over the pipeline's output tables — the
reference's frontend query semantics (F6 search/type/tag filters at
src/frontend/routes/people.py:37-84 + filters.py:41-241, A9 distinct
filter-chip values, O6 profile-version resolution at
src/engine/profiles.py:60-83) as plain DataFrame functions.

In the reference these are O(n) Python scans per HTTP request; here each is
a pruned/filtered scan Catalyst can push into parquet."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def search_entities(
    profiles: DataFrame,
    q: str | None = None,
    entity_type: str | None = None,
    types: list[str] | None = None,
    tags: list[str] | None = None,
) -> DataFrame:
    """F6: case-insensitive substring on name ∧ type ∈ selected ∧ any-tag
    overlap, ordered by canonical name."""
    out = profiles
    if entity_type:
        out = out.filter(F.col("entity_type") == entity_type)
    if q:
        out = out.filter(
            F.lower(F.col("canonical_name")).contains(q.lower())
        )
    if types:
        out = out.filter(F.col("profile_tags").isNotNull()).filter(
            F.arrays_overlap(F.col("profile_tags"), F.array(*[F.lit(t) for t in types]))
        )
    if tags:
        out = out.filter(
            F.arrays_overlap(F.col("profile_tags"), F.array(*[F.lit(t) for t in tags]))
        )
    return out.orderBy("canonical_name")


def with_display_keys(entities: DataFrame) -> DataFrame:
    """SC13: the frontend's hash-disambiguated display key
    (src/frontend/data_access.py:113-176):

      people          name (already unique per identity model)
      organizations   "Name (md5(name##type)[:6])"
      locations       "Name (md5(name##type)[:6])"
      events          "Title (md5(title##start_date)[:6])"

    Pure column expressions — md5/substring/concat are JVM built-ins."""
    second = F.when(
        F.col("entity_type") == "events", F.col("canonical_start_date")
    ).otherwise(F.col("canonical_type"))
    h = F.substring(
        F.md5(F.concat(F.col("canonical_name"), F.lit("##"), second)), 1, 6
    )
    return entities.withColumn(
        "display_key",
        F.when(F.col("entity_type") == "people", F.col("canonical_name"))
        .otherwise(F.concat(F.col("canonical_name"), F.lit(" ("), h, F.lit(")"))),
    )


def reference_shaped_entities(entities: DataFrame, entity_type: str) -> DataFrame:
    """Per-type export with the reference's EXACT legacy alternative-name
    shapes (mergers.py:523-575 — the reference writes one parquet per type):

      people          alternative_names: array<string>
      organizations / locations
                      alternative_names: array<struct<name,type>>
      events          alternative_titles: array<struct<title,start_date,
                                                       event_type>>
                      (events use the `alternative_titles` field name —
                      mergers.py:136)

    The internal partitioned table carries one superset struct (a single
    column type across types); this is the final per-partition cast at
    export — a narrow projection, no shuffle."""
    out = entities.filter(F.col("entity_type") == entity_type)
    if entity_type == "people":
        return out.withColumn(
            "alternative_names",
            F.transform("alternative_names", lambda e: e["name"]),
        )
    if entity_type == "events":
        return out.withColumn(
            "alternative_titles",
            F.transform(
                "alternative_names",
                lambda e: F.struct(
                    e["name"].alias("title"),
                    e["start_date"].alias("start_date"),
                    e["type"].alias("event_type"),
                ),
            ),
        ).drop("alternative_names")
    return out.withColumn(
        "alternative_names",
        F.transform(
            "alternative_names",
            lambda e: F.struct(e["name"].alias("name"), e["type"].alias("type")),
        ),
    )


def distinct_filter_values(profiles: DataFrame) -> DataFrame:
    """A9: sorted distinct (entity_type, tag) chips."""
    return (
        profiles.select(
            "entity_type", F.explode("profile_tags").alias("tag")
        )
        .distinct()
        .orderBy("entity_type", "tag")
    )


def profile_version(
    profiles: DataFrame, entity_id: str, version: int | None = None
) -> DataFrame:
    """O6: resolve a specific (or the latest) profile version from the
    append-only versions array."""
    p = profiles.filter(F.col("entity_id") == entity_id)
    if version is None:
        picked = F.try_element_at(
            F.col("versions"), F.col("current_version").cast("int")
        )
    else:
        picked = F.try_element_at(
            F.filter(
                F.col("versions"), lambda v: v["version_number"] == F.lit(version)
            ),
            F.lit(1),
        )
    return p.select(
        "entity_id",
        "canonical_name",
        "current_version",
        picked.alias("version"),
    )
