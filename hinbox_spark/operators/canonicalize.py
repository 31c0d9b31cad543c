"""Stage 5: clusters → canonical entities + (subj, pred, obj) edge triples.

Canonical-name selection generalizes the reference's pairwise 5-layer pick
(/root/reference/src/engine/mergers.py:231-274, 962-998) to whole clusters:
cluster_canonical_score = base score + containment bonus + full-form-over-
acronym bonus, argmax per cluster with deterministic tie-breaks — order-free
where the reference was merge-order-dependent.

Output surfaces:
- `entities`: one row per cluster with the reference-shaped payload
  (canonical name/type, aliases, alternative_names, articles provenance,
  extraction_timestamp = min over members — mergers.py:1158-1165).
- `edges`: the graded (subj, pred, obj) triple table (FIXTURES.md §5) with
  url/warc_ts provenance and spark_partition_id() lineage.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hinbox_spark.functions.names import cluster_canonical_score

# deterministic cap on the nested per-entity articles sample (earliest
# first); shared with the incremental upsert path so a merged entity's
# sample is re-capped identically to a from-scratch batch run
ENTITY_ARTICLES_CAP = 100


def build_clusters(
    mentions: DataFrame,
    nodes: DataFrame,
    labels: DataFrame,
    articles: DataFrame,
) -> DataFrame:
    """Attach cluster_id + article metadata (warc_ts, title) to every
    mention via its node key. One join on url, one on the node key — both
    co-partitioned hash joins."""
    from hinbox_spark.operators.linking import ensure_match_key

    m = ensure_match_key(mentions)
    n = nodes.select("entity_type", "match_key", "type_attr", "start_date", "node_id")
    keyed = m.join(
        n,
        (m["entity_type"] == n["entity_type"])
        & (m["match_key"] == n["match_key"])
        & (m["type"] == n["type_attr"])
        & (m["start_date"] == n["start_date"]),
    ).select(m["*"], n["node_id"], n["type_attr"])
    keyed = keyed.join(
        articles.select("url", "warc_ts", "title"), "url"
    )
    return keyed.join(labels, "node_id")


def canonical_names(
    mention_clusters: DataFrame,
) -> DataFrame:
    """Per cluster: pick the canonical (name, type, start_date) by
    cluster-level scoring with deterministic tie-breaks (score desc, then
    mention count desc, then name asc)."""

    member_names = (
        mention_clusters.groupBy("cluster_id", "entity_type", "name", "type_attr", "start_date")
        .agg(F.count("*").alias("n_mentions"))
    )

    def _pick(key, pdf: pd.DataFrame) -> pd.DataFrame:
        names = pdf["name"].tolist()
        scores = [cluster_canonical_score(n, names) for n in names]
        pdf = pdf.assign(score=scores)
        pdf = pdf.sort_values(
            ["score", "n_mentions", "name"], ascending=[False, False, True]
        )
        top = pdf.iloc[0]
        others = pdf.iloc[1:]
        # alt entries keep the ALT key's OWN attributes paired (reference
        # mergers.py:523-575 stores the alternative key's type/start_date,
        # not the canonical's) — the per-type export shapes derive from this
        alt_entries = sorted(
            {
                (n, t, s)
                for n, t, s in zip(
                    others["name"], others["type_attr"], others["start_date"]
                )
            }
        )
        return pd.DataFrame(
            {
                "cluster_id": [key[0]],
                "entity_type": [key[1]],
                "canonical_name": [top["name"]],
                "canonical_type": [top["type_attr"]],
                "canonical_start_date": [top["start_date"]],
                "alt_names": [sorted(set(others["name"]))],
                "alt_types": [sorted(set(others["type_attr"]))],
                "alt_start_dates": [sorted(set(others["start_date"]))],
                "alt_entries": [
                    [
                        {"name": n, "type": t, "start_date": s}
                        for n, t, s in alt_entries
                    ]
                ],
            }
        )

    schema = (
        "cluster_id string, entity_type string, canonical_name string, "
        "canonical_type string, canonical_start_date string, "
        "alt_names array<string>, alt_types array<string>, "
        "alt_start_dates array<string>, "
        "alt_entries array<struct<name:string,type:string,start_date:string>>"
    )
    return member_names.groupBy("cluster_id", "entity_type").applyInPandas(_pick, schema)


def build_entities(
    mention_clusters: DataFrame, canon: DataFrame
) -> DataFrame:
    """entities table: cluster aggregation of provenance + aliases (J12).

    entity_id = sha2(entity_type || canonical key) — content-addressed, so
    stable across runs (idempotent resume)."""
    from hinbox_spark.functions.skew import bounded_topk

    # provenance sample: full provenance lives in the edges table
    # (mentioned_in triples); the nested articles array is capped BEFORE
    # aggregation so a mega-entity (millions of articles) cannot blow up
    # the collect_list buffer — earliest-first, deterministic. bounded_topk
    # (tournament) instead of a row_number window so a mega-cluster's
    # articles never serialize into one sort task.
    sampled_articles = (
        bounded_topk(
            mention_clusters.select("cluster_id", "url", "warc_ts", "title")
            .dropDuplicates(["cluster_id", "url"]),
            keys=["cluster_id"],
            order_by=[F.col("warc_ts"), F.col("url")],
            k=ENTITY_ARTICLES_CAP,
            salt_expr=F.xxhash64("url"),
        )
        .groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("url", "warc_ts", "title"))
            ).alias("articles")
        )
    )

    # distinct-first aggregation: a hot entity has millions of mention rows
    # but only a handful of distinct aliases/names — deduplicate (with
    # map-side combine) BEFORE collect_list so no reducer ever materializes
    # a multi-million-element list (the mega-entity skew guard)
    alias_agg = (
        mention_clusters.select(
            "cluster_id", F.explode("aliases").alias("alias")
        )
        .distinct()
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list("alias")).alias("mention_aliases"))
    )
    name_agg = (
        mention_clusters.select("cluster_id", "name")
        .distinct()
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list("name")).alias("all_names"))
    )
    scalar_agg = mention_clusters.groupBy("cluster_id").agg(
        F.min("warc_ts").alias("extraction_timestamp"),
        F.count("*").alias("n_mentions"),
        F.countDistinct("url").alias("n_articles"),
    )
    agg = (
        scalar_agg.join(name_agg, "cluster_id")
        .join(alias_agg, "cluster_id", "left")
        .withColumn(
            "mention_aliases",
            F.coalesce("mention_aliases", F.array().cast("array<string>")),
        )
        .join(sampled_articles, "cluster_id")
    )

    out = (
        canon.join(agg, "cluster_id")
        .withColumn(
            "entity_id",
            F.sha2(
                F.concat_ws(
                    "|",
                    "entity_type",
                    "canonical_name",
                    "canonical_type",
                    "canonical_start_date",
                ),
                256,
            ),
        )
        .withColumn(
            "aliases",
            F.array_sort(
                F.array_distinct(F.concat("mention_aliases", "alt_names"))
            ),
        )
        .drop("mention_aliases")
    )
    # alternative_names superset struct: the ALT key's own (name, type,
    # start_date), reference-masked per type (people carry neither type nor
    # date; orgs/locs carry no date; events carry both — mergers.py:523-575
    # legacy shapes). One partitioned table needs one column type; the
    # exact per-type shapes (people: array<string>; orgs/locs: (name,type);
    # events: (title,start_date,event_type)) come from
    # serving.reference_shaped_entities at per-type export.
    out = out.withColumn(
        "alternative_names",
        F.transform(
            "alt_entries",
            lambda e: F.struct(
                e["name"].alias("name"),
                F.when(F.col("entity_type") == "people", F.lit(""))
                .otherwise(e["type"]).alias("type"),
                F.when(
                    F.col("entity_type") == "events", e["start_date"]
                ).otherwise(F.lit("")).alias("start_date"),
            ),
        ),
    )
    return out


def _stable_provenance(edges: DataFrame) -> DataFrame:
    """One row per (subj, pred, obj) with DETERMINISTIC provenance: the
    (earliest warc_ts, lexicographically-smallest url) witness via a
    struct-min aggregate (map-side combinable). A bare dropDuplicates picks
    an arbitrary winner per partitioning — the triple SET would be stable
    but the provenance columns would flap across runs/partitionings."""
    return (
        edges.groupBy("subj", "pred", "obj")
        .agg(F.min(F.struct("warc_ts", "url")).alias("_w"))
        .select(
            "subj", "pred", "obj",
            F.col("_w.url").alias("url"),
            F.col("_w.warc_ts").alias("warc_ts"),
        )
    )


def build_edge_triples(
    mention_clusters: DataFrame, entities: DataFrame
) -> DataFrame:
    """(subj, pred, obj) triples with provenance + per-partition lineage.

    Predicates: mentioned_in (entity → url), alias_of (surface variant →
    canonical), has_type (entity → category). The partition_id column is the
    per-partition lineage counter the north_rule requires. Provenance per
    triple is the deterministic earliest-(warc_ts, url) witness.
    """
    ent = entities.select(
        "cluster_id", "entity_id", "canonical_name", "canonical_type"
    )
    mc = mention_clusters.join(ent, "cluster_id")

    mentioned_in = _stable_provenance(
        mc.select(
            F.col("entity_id").alias("subj"),
            F.lit("mentioned_in").alias("pred"),
            F.col("url").alias("obj"),
            "url",
            "warc_ts",
        )
    )

    alias_of = _stable_provenance(
        mc.filter(F.col("name") != F.col("canonical_name")).select(
            F.col("name").alias("subj"),
            F.lit("alias_of").alias("pred"),
            F.col("entity_id").alias("obj"),
            "url",
            "warc_ts",
        )
    )

    has_type = _stable_provenance(
        mc.filter(F.col("canonical_type") != "").select(
            F.col("entity_id").alias("subj"),
            F.lit("has_type").alias("pred"),
            F.col("canonical_type").alias("obj"),
            "url",
            "warc_ts",
        )
    )

    mc_art = mc.select("url", "warc_ts", "entity_id", "entity_type")
    events = mc_art.filter(F.col("entity_type") == "events").select(
        F.col("url"), F.col("entity_id").alias("event_id")
    )
    participants = _stable_provenance(
        mc_art.filter(F.col("entity_type").isin("people", "organizations"))
        .join(events, "url")
        .select(
            F.col("entity_id").alias("subj"),
            F.lit("co_mentioned_with").alias("pred"),
            F.col("event_id").alias("obj"),
            "url",
            F.col("warc_ts"),
        )
    )

    edges = (
        mentioned_in.unionByName(alias_of)
        .unionByName(has_type)
        .unionByName(participants)
        .withColumn("partition_id", F.spark_partition_id())
    )
    return edges
