"""End-to-end KG-construction pipeline with stage-boundary checkpoints.

Stages (each materializes a parquet table = checkpoint; a rerun anti-joins
inputs against completed work — the reference's processing_status.json
skip-if-unchanged semantics at src/utils/processing_status.py:17-93 and
src/process_and_extract.py:545-565, re-expressed as tables):

  articles   pages → extracted text          (partitioned narrow, no shuffle)
  mentions   articles → typed mentions       (mapInPandas, no shuffle)
  nodes      distinct mention keys           (1 shuffle on key)
  pairs      blocking joins                  (shuffles on blocking keys)
  clusters   connected components            (iterative, O(log n) shuffles)
  entities   canonical entities              (1 shuffle on cluster_id)
  edges      (subj, pred, obj) triples
  profiles   versioned profiles + grounding
  review     gray-band deferred pairs
  metrics    per-stage, per-partition counters (north_rule lineage)
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hinbox_spark import fs as hfs
from hinbox_spark.config import DomainConfig, get_default_config
from hinbox_spark.operators.canonicalize import (
    build_clusters, build_edge_triples, build_entities, canonical_names,
)
from hinbox_spark.operators.clustering import connected_components
from hinbox_spark.operators.extraction import (
    extract_articles, extract_mentions_cached, extract_mentions_with_flags,
    relevance_predicate, scrub_articles, skip_reason_summary,
)
from hinbox_spark.operators.linking import (
    arbitrate_review, candidate_pairs, mention_nodes, name_lsh_band_entries,
    name_lsh_truncation_stats, name_lsh_truncation_stats_from_entries,
    node_evidence_embeddings, score_pairs,
)
from hinbox_spark.operators.profiles import build_profiles, ground_profiles

STAGES = (
    "articles", "mentions", "entities", "edges", "profiles",
    "review", "decisions", "metrics",
)


def _table_path(base: str, name: str) -> str:
    return base.rstrip("/") + "/" + name


def _stage_counts(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts for the lineage metrics table."""
    return (
        df.groupBy("partition_id")
        .agg(F.count("*").alias("rows"))
        .withColumn("stage", F.lit(stage))
        .select("stage", "partition_id", "rows")
    )


def _done(spark: SparkSession, base: str, name: str) -> bool:
    # Hadoop FS API, not os.path — the output dir may be hdfs:/s3a:/file:
    return hfs.exists(spark, _table_path(base, name) + "/_SUCCESS")


def _write(df: DataFrame, base: str, name: str, partition_cols: list[str] | None = None):
    path = _table_path(base, name)
    if "partition_id" not in df.columns:
        # write-time lineage: the partition that produced each row is
        # persisted, so the metrics stage never re-derives it
        df = df.withColumn("partition_id", F.spark_partition_id())
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    # an all-empty write emits no schema-bearing part file → unreadable
    # table; detect from the output listing (free) and rewrite one empty
    # part file carrying the schema
    if not hfs.has_part_files(df.sparkSession, path):
        # write an empty single-file table from a literal (no plan recompute)
        df.sparkSession.createDataFrame([], df.schema).repartition(1).write.mode(
            "overwrite"
        ).parquet(path)


def _with_search_embedding(entities: DataFrame, cfg: DomainConfig) -> DataFrame:
    """Reference schema parity (mergers.py:1301-1313): search_embedding =
    deterministic encoding of the canonical name + aliases, plus the
    model/dim/fingerprint metadata columns."""
    from hinbox_spark.functions.embeddings import (
        EMBEDDING_MODEL, embed_text, fingerprint,
    )

    dim = cfg.embedding_dim

    @F.pandas_udf("array<float>")
    def _embed(name: pd.Series, aliases: pd.Series) -> pd.Series:
        return pd.Series(
            [
                embed_text(f"{n} " + " ".join(list(a) if a is not None else []), dim).tolist()
                for n, a in zip(name, aliases)
            ]
        )

    return (
        entities.withColumn(
            "search_embedding", _embed(F.col("canonical_name"), F.col("aliases"))
        )
        .withColumn("search_embedding_model", F.lit(EMBEDDING_MODEL))
        .withColumn("search_embedding_dim", F.lit(dim))
        .withColumn("search_embedding_fingerprint", F.lit(fingerprint(dim=dim)))
    )


def _with_profile_embedding(profiles: DataFrame, cfg: DomainConfig) -> DataFrame:
    """profile_embedding = encoding of the profile text (+ metadata cols)."""
    from hinbox_spark.functions.embeddings import (
        EMBEDDING_MODEL, embed_text, fingerprint,
    )

    dim = cfg.embedding_dim

    @F.pandas_udf("array<float>")
    def _embed(text: pd.Series) -> pd.Series:
        return text.map(lambda t: embed_text(t or "", dim).tolist())

    return (
        profiles.withColumn("profile_embedding", _embed(F.col("profile_text")))
        .withColumn("profile_embedding_model", F.lit(EMBEDDING_MODEL))
        .withColumn("profile_embedding_dim", F.lit(dim))
        .withColumn("profile_embedding_fingerprint", F.lit(fingerprint(dim=dim)))
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    cfg: DomainConfig | None = None,
    resume: bool = True,
    stage_times: dict | None = None,
) -> dict[str, DataFrame]:
    """Run all stages; stages whose output table already exists are skipped
    when resume=True (checkpoint/resume at stage boundaries).

    When ``stage_times`` is a dict, wall-clock seconds per coarse stage
    block are recorded into it (extract / link_score / cluster_entities /
    edges_profiles / metrics). Blocks overlap background writes, so the
    numbers are boundary-to-boundary wall time on the driver thread — a
    diagnosis aid for the bench sidecar, not disjoint CPU accounting."""
    import time as _time

    _t_block = _time.monotonic()

    def _mark(name: str) -> None:
        nonlocal _t_block
        if stage_times is not None:
            now = _time.monotonic()
            stage_times[name] = round(now - _t_block, 3)
            _t_block = now

    cfg = cfg or get_default_config()
    from hinbox_spark.config_loader import gazetteer_for

    gaz = gazetteer_for(cfg)  # YAML-loaded entries when present, else default
    hfs.mkdirs(spark, output_dir)

    # run-level counters (filled by the stages below when they execute;
    # empty on a resumed run whose stages were skipped)
    cache_stats: dict = {}
    # shared B5 band entries (set by the linking block; None on resume)
    band_entries = None

    import sys
    from concurrent.futures import ThreadPoolExecutor

    # ── stages 1-2: articles ∥ mentions ──
    # The measured 480k-page Amdahl residue is the chain of sequential
    # stage commits, so when both stages run this session the articles
    # table's parquet commit overlaps mention extraction: the parsed
    # articles are eagerly localCheckpoint'ed (the HTML parse runs ONCE),
    # the articles write goes to a background thread, and the NER pass
    # consumes the same blocks concurrently. The extraction-QC flag rows
    # (X3) ride the mentions table itself (qc_flag null on mention rows)
    # so the NER+write job stays FUSED — no extra materialization pass,
    # no second commit; readers slice the table by qc_flag. F4: only
    # relevance-passing articles reach the NER stage — the rest land in
    # the skip-reason counters.
    stage2_needed = not (resume and _done(spark, output_dir, "mentions"))
    pool = ThreadPoolExecutor(max_workers=2)
    background = []  # in-flight concurrent writes, joined in finally
    ckpts = []       # checkpointed inputs, unpersisted in finally
    try:
        if not (resume and _done(spark, output_dir, "articles")):
            # F4 relevance is stamped HERE, while the text is already
            # flowing through the stage — downstream consumers filter on
            # the persisted boolean (parquet predicate pushdown) instead
            # of re-scanning text
            articles = scrub_articles(extract_articles(pages), cfg).withColumn(
                "is_relevant", relevance_predicate(cfg.relevance_keywords)
            )
            if stage2_needed:
                articles = articles.localCheckpoint()  # parse once, eager
                ckpts.append(articles)
                background.append(
                    pool.submit(_write, articles, output_dir, "articles")
                )
            else:
                _write(articles, output_dir, "articles")
                articles = spark.read.parquet(_table_path(output_dir, "articles"))
        else:
            articles = spark.read.parquet(_table_path(output_dir, "articles"))

        if stage2_needed:
            # resume compatibility: an articles checkpoint written before
            # the is_relevant column existed lacks it — stamp it on the
            # fly (same guard skip_reason_summary uses)
            if "is_relevant" not in articles.columns:
                articles = articles.withColumn(
                    "is_relevant", relevance_predicate(cfg.relevance_keywords)
                )
            relevant = articles.filter(F.col("is_relevant"))
            if cfg.extraction_cache_path:
                extracted = extract_mentions_cached(
                    relevant, gaz, cfg.extraction_cache_path,
                    stats_out=cache_stats,
                )
            else:
                extracted = extract_mentions_with_flags(relevant, gaz)
            # one FUSED NER+write job (flag rows included, qc_flag null on
            # mention rows — a handful of flag rows per million articles)
            _write(extracted, output_dir, "mentions", ["entity_type"])
    finally:
        # join background writes before unwinding (same discipline as the
        # linking block): bg errors surface on the happy path, a
        # foreground error stays primary during an unwind
        bg_error = None
        for fut in background:
            try:
                fut.result()
            except Exception as exc:
                if bg_error is None:
                    bg_error = exc
        pool.shutdown(wait=True)
        for df in ckpts:
            df.unpersist()
        if bg_error is not None and sys.exc_info()[0] is None:
            raise bg_error
    _mark("extract")

    articles = spark.read.parquet(_table_path(output_dir, "articles"))
    mentions_raw = spark.read.parquet(_table_path(output_dir, "mentions"))
    # slice the flag channel off the mentions table (parquet filter
    # pushdown — qc_flag IS NULL on every mention row); checkpoints
    # written before the column existed mean "no flags"
    if "qc_flag" in mentions_raw.columns:
        mentions = mentions_raw.filter(F.col("qc_flag").isNull()).drop("qc_flag")
        qc_flags = mentions_raw.filter(F.col("qc_flag").isNotNull()).select(
            "url", "entity_type", "qc_flag"
        )
    else:
        mentions = mentions_raw
        qc_flags = spark.createDataFrame(
            [], "url string, entity_type string, qc_flag string"
        )

    def _metrics_early() -> DataFrame:
        """The metrics rows that need only pages/articles/mentions — the
        EXPENSIVE scans of the metrics stage (skip-reason partition of the
        whole page set, QC flag slice, B5 truncation counters). These run
        in the FINAL metrics stage, where the cluster is otherwise idle:
        overlapping them with the clustering chain from a background
        thread was tried and measured SLOWER (see the note in the linking
        block) — the fat pages scan evicts the cached clustering inputs."""
        m = _stage_counts(articles, "articles").unionByName(
            _stage_counts(mentions, "mentions")
        )
        # A2: per-reason skip counters
        m = m.unionByName(
            skip_reason_summary(
                pages, articles, mentions, cfg.relevance_keywords
            ).select(
                F.when(F.col("reason") == "processed", F.lit("processed"))
                .otherwise(F.concat(F.lit("skip_"), "reason"))
                .alias("stage"),
                F.lit(-1).alias("partition_id"),
                F.col("n").alias("rows"),
            )
        )
        # X3: extraction-QC flag counters next to the skip reasons — one
        # pushdown-filtered slice of the mentions table
        m = m.unionByName(
            qc_flags.groupBy("qc_flag")
            .agg(F.count("*").alias("rows"))
            .select(
                F.concat(F.lit("qc_"), "qc_flag").alias("stage"),
                F.lit(-1).alias("partition_id"),
                "rows",
            )
        )
        # B5 truncation: dropped name-LSH buckets are counted, not silent.
        # When the linking block ran this session the counters derive from
        # the SAME checkpointed band entries (no signature recompute);
        # only a resumed run that skipped linking but lost its metrics
        # pays the standalone fallback.
        trunc = (
            name_lsh_truncation_stats_from_entries(band_entries)
            if band_entries is not None
            else name_lsh_truncation_stats(mention_nodes(mentions))
        )
        m = m.unionByName(
            trunc.select(
                "stage", F.lit(-1).alias("partition_id"),
                F.col("n").alias("rows"),
            )
        )
        run_counters = {
            # A10: extraction-cache hit/miss counters
            **{f"extraction_cache_{k}": v for k, v in cache_stats.items()},
            # F2 skip-if-unchanged analog: cache hits = articles whose
            # content hash was already extracted in a previous run
            "skip_unchanged_hash": cache_stats.get("hits", 0),
        }
        if run_counters:
            # partition_id −1 = run-level counter, not tied to a partition
            m = m.unionByName(
                spark.createDataFrame(
                    [(k, -1, v) for k, v in run_counters.items()],
                    "stage string, partition_id int, rows long",
                )
            )
        return m



    # ── stages 3-5: linking → clustering → canonicalization ──
    # the gate must include EVERY table the block writes — profiles is
    # written last, so a crash between edges and profiles would otherwise
    # leave a resume state that skips the block and then fails reading the
    # missing profiles table (wedged checkpoint dir)
    if not (resume and _done(spark, output_dir, "entities") and _done(spark, output_dir, "edges")
            and _done(spark, output_dir, "review") and _done(spark, output_dir, "decisions")
            and _done(spark, output_dir, "profiles")):
        nodes = mention_nodes(mentions).cache()
        # the B5 MinHash signature pass (the one pandas-UDF job of the
        # blocking family) is computed ONCE and shared: pairing reads it,
        # and the metrics stage derives its truncation counters from the
        # same checkpointed entries instead of re-running the pass
        band_entries = name_lsh_band_entries(nodes).localCheckpoint(eager=False)
        # pairs is checkpointed so the review/score materialization and the
        # decisions anti-joins share one blocking-family computation
        pairs = candidate_pairs(
            nodes, cfg, band_entries=band_entries
        ).localCheckpoint(eager=False)
        node_vecs = node_evidence_embeddings(nodes, mentions, articles, cfg)
        accepted, review = score_pairs(pairs, nodes, node_vecs, cfg)
        # second-stage dispute arbitration (merge_dispute_agent parity):
        # a deterministic richer-feature pass over the gray-band rows can
        # override in both directions — merges feed back as clustering
        # edges, skips are final, defers stay queued for humans. The
        # arbitrated set is eagerly checkpointed: the review write, the
        # queue append, and the decisions aggregates all consume the same
        # materialized blocks, and the write itself moves to a background
        # thread instead of serializing the chain.
        review = arbitrate_review(review).localCheckpoint()
        dispute_merges = review.filter(F.col("decision") == "merge").select(
            "src", "dst", "entity_type",
            F.lit("dispute_merge").alias("reason"), "sim",
        )
        accepted = accepted.unionByName(dispute_merges)
        # materialize the (tiny, pair-level) accepted-edge set once, NOW —
        # the decisions job and the clustering chain consume it from two
        # threads below, and an eager checkpoint removes any double-
        # materialization race a lazy one would allow
        accepted = accepted.localCheckpoint()
        _mark("link_score")

        # A1 parity: merge-decision counters (reference MergeStats —
        # merged/skipped/disputed per type/reason) as a metrics table.
        # skipped = candidate pairs that neither merged nor deferred
        # (failed the match check / a guard) — lazy anti-joins, evaluated
        # once at the decisions write.
        skipped = (
            pairs.join(accepted.select("src", "dst"), ["src", "dst"], "left_anti")
            .join(review.select("src", "dst"), ["src", "dst"], "left_anti")
            .join(
                nodes.select(F.col("node_id").alias("src"), "entity_type"), "src"
            )
            .groupBy("entity_type", "reason")
            .agg(F.count("*").alias("n"))
            .withColumn("decision", F.lit("skipped"))
        )
        decisions = (
            accepted.groupBy("entity_type", "reason")
            .agg(F.count("*").alias("n"))
            .withColumn("decision", F.lit("merged"))
            .unionByName(
                # still-deferred rows are the open disputes; arbitration
                # merges are already counted under merged/dispute_merge
                review.filter(F.col("decision") == "defer")
                .groupBy("entity_type")
                .agg(F.count("*").alias("n"))
                .withColumn("reason", F.lit("gray_band"))
                .withColumn("decision", F.lit("disputed"))
                .select("entity_type", "reason", "n", "decision")
            )
            .unionByName(
                review.filter(F.col("decision") == "skip")
                .groupBy("entity_type")
                .agg(F.count("*").alias("n"))
                .withColumn("reason", F.lit("dispute_skip"))
                .withColumn("decision", F.lit("skipped"))
                .select("entity_type", "reason", "n", "decision")
            )
            .unionByName(skipped.select("entity_type", "reason", "n", "decision"))
        )
        # the review/queue/decisions jobs are independent of the
        # clustering → canonicalization chain (all read only checkpointed
        # inputs), so they run as CONCURRENT Spark jobs from driver
        # threads — at 4N cores the serial tail is ~30% of the run, and
        # overlapping independent jobs is what converts spare cores into
        # wall-clock (at N cores everything is compute-bound and the
        # overlap costs nothing)
        pool = ThreadPoolExecutor(max_workers=4)
        background = []  # in-flight concurrent writes, joined in finally
        # cached/checkpointed inputs, unpersisted in finally
        cached = [nodes, review, accepted]
        try:
            background.append(
                pool.submit(_write, review, output_dir, "review")
            )
            if cfg.snapshot_store_path:
                # append-only review queue (reference parity: the dispute
                # queue is append-only JSONL — humans drain it across
                # runs). The per-run review table stays overwrite; the
                # queue accumulates every run's rows with attribution.
                import uuid as _uuid

                from hinbox_spark.tables import SnapshotTable as _ST

                background.append(
                    pool.submit(
                        _ST(
                            spark,
                            cfg.snapshot_store_path.rstrip("/") + "/review_queue",
                        ).append,
                        review.withColumn("run_id", F.lit(_uuid.uuid4().hex)),
                    )
                )
            background.append(
                pool.submit(_write, decisions, output_dir, "decisions")
            )
            # NOTE: overlapping the expensive half of the metrics stage
            # (full pages/articles/mentions scans) with the clustering
            # chain from a background thread was tried and MEASURED SLOWER
            # at 480k (local[16] ~111 s → ~150 s): the fat html-bearing
            # pages scan competes with the cached mention_clusters /
            # iterative CC jobs for block-manager memory and FIFO task
            # slots, stretching the critical path. The metrics scans stay
            # in the final stage where the cluster is otherwise idle.

            labels = connected_components(
                nodes.select("node_id"), accepted.select("src", "dst")
            )
            mention_clusters = build_clusters(
                mentions, nodes, labels, articles
            ).cache()
            cached.append(mention_clusters)
            canon = canonical_names(mention_clusters)
            entities = build_entities(mention_clusters, canon)
            entities = _with_search_embedding(entities, cfg)
            _write(entities, output_dir, "entities", ["entity_type"])
            entities = spark.read.parquet(_table_path(output_dir, "entities"))

            # optional Iceberg-shaped entity store: publish this run's
            # entities as an atomic snapshot commit (merge-on-read upsert
            # by entity_id — a re-run of the same corpus supersedes, never
            # duplicates)
            if cfg.snapshot_store_path:
                from hinbox_spark.tables import SnapshotTable

                SnapshotTable(
                    spark, cfg.snapshot_store_path.rstrip("/") + "/entities"
                ).merge(entities)

            _mark("cluster_entities")
            # edges and profiles both read only the cached mention_clusters
            # and the written entities table — independent jobs, overlapped
            # the same way as decisions
            edges = build_edge_triples(mention_clusters, entities)
            edges_future = pool.submit(_write, edges, output_dir, "edges", ["pred"])
            background.append(edges_future)

            # ── stage 6: profiles + grounding ──
            profiles = build_profiles(mention_clusters, entities)
            profiles = ground_profiles(profiles, articles)
            profiles = _with_profile_embedding(profiles, cfg)
            _write(profiles, output_dir, "profiles")

            if cfg.snapshot_store_path:
                # bootstrap the incremental-store state tables (profile
                # facts, cited texts, processed-pages log, edges/profiles)
                # so run_incremental can apply deltas on top of this run.
                # The edges append reuses the just-written parquet instead
                # of re-running the provenance aggregation plan — wait for
                # the background edges write first.
                from hinbox_spark.incremental import seed_store_from_run

                edges_future.result()
                seed_store_from_run(
                    spark, cfg, mention_clusters, entities, articles,
                    spark.read.parquet(_table_path(output_dir, "profiles")),
                    spark.read.parquet(_table_path(output_dir, "edges")),
                )
            _mark("edges_profiles")
        finally:
            # join the concurrent writes BEFORE unwinding — a failure in
            # the foreground chain must not leave background writes racing
            # the exception path, and the pool/cached inputs are released
            # on every path. A background write error surfaces on the
            # happy path; during an unwind the foreground error stays
            # primary and the join is best-effort.
            bg_error = None
            for fut in background:
                try:
                    fut.result()
                except Exception as exc:
                    if bg_error is None:
                        bg_error = exc
            pool.shutdown(wait=True)
            for df in cached:
                df.unpersist()
            if bg_error is not None and sys.exc_info()[0] is None:
                raise bg_error

    entities = spark.read.parquet(_table_path(output_dir, "entities"))
    edges = spark.read.parquet(_table_path(output_dir, "edges"))
    profiles = spark.read.parquet(_table_path(output_dir, "profiles"))
    review = spark.read.parquet(_table_path(output_dir, "review"))

    # ── metrics table: per-stage / per-partition lineage counters ──
    # partition_id is persisted at write time by _write, so the late half
    # is one column-pruned scan per small table; the early half scans the
    # big tables on an otherwise-idle cluster (overlapping it with the
    # clustering chain measured slower — see the note in the linking block)
    if not (resume and _done(spark, output_dir, "metrics")):
        m = (
            _metrics_early()
            .unionByName(_stage_counts(entities, "entities"))
            .unionByName(_stage_counts(edges, "edges"))
            .unionByName(_stage_counts(profiles, "profiles"))
            .unionByName(_stage_counts(review, "review"))
        )
        _write(m, output_dir, "metrics")
    _mark("metrics")

    return {
        "articles": articles,
        "mentions": mentions,
        "qc_flags": qc_flags,
        "entities": entities,
        "edges": edges,
        "profiles": profiles,
        "review": review,
        "decisions": spark.read.parquet(_table_path(output_dir, "decisions")),
        "metrics": spark.read.parquet(_table_path(output_dir, "metrics")),
    }
