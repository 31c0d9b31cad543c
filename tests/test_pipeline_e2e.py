"""End-to-end pipeline golden test: synthetic corpus → full pipeline →
P/R ≥ 0.95 against planted gold mentions/links (BASELINE.json target), plus
checkpoint/resume identity.
"""

import pyspark.sql.functions as F
import pytest

from hinbox_spark.functions.names import normalize_for_match
from hinbox_spark.pipeline import run_pipeline
from hinbox_spark.sources.pages_gen import pages_dataframe


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("kg_out"))
    pages, gold = pages_dataframe(spark, n_pages=120, seed=42)
    tables = run_pipeline(spark, pages, out_dir, resume=False)
    return tables, gold, out_dir, pages


def test_mention_extraction_pr(pipeline_out):
    tables, gold, _, _ = pipeline_out
    pred = {
        (r["url"], r["entity_type"], normalize_for_match(r["name"]))
        for r in tables["mentions"].collect()
    }
    # gold surfaces may be collapsed into a keeper's aliases by X5, so
    # count a gold mention as found if its surface OR an alias row matches
    alias_pred = set()
    for r in tables["mentions"].collect():
        for a in r["aliases"] or []:
            alias_pred.add((r["url"], r["entity_type"], normalize_for_match(a)))
    found = pred | alias_pred

    gold_set = {
        (g.url, g.entity_type, normalize_for_match(g.surface)) for g in gold
    }
    tp = len(gold_set & found)
    recall = tp / len(gold_set)
    precision = len(pred & (gold_set | alias_pred)) / len(pred) if pred else 0
    assert recall >= 0.95, f"recall {recall}"
    assert precision >= 0.95, f"precision {precision}"


def test_linking_clusters_variants(pipeline_out):
    """All planted surface variants of one canonical entity must land in the
    same cluster (entity row), and distinct canonicals must not merge."""
    tables, gold, _, _ = pipeline_out
    ents = tables["entities"].collect()

    # map each gold (type, surface) → canonical
    gold_map = {}
    for g in gold:
        gold_map.setdefault((g.entity_type, normalize_for_match(g.surface)), set()).add(
            g.canonical
        )

    # map surface → entity_id from entities (canonical + aliases + alt names)
    surf_to_entity = {}
    for e in ents:
        variants = {e["canonical_name"], *(e["aliases"] or []), *(e["alt_names"] or [])}
        for v in variants:
            surf_to_entity.setdefault(
                (e["entity_type"], normalize_for_match(v)), set()
            ).add(e["entity_id"])

    pair_total = 0
    pair_correct = 0
    # for every gold canonical with ≥2 surfaces: all surfaces same entity_id
    by_canonical: dict[tuple, set] = {}
    for (etype, surf), canonicals in gold_map.items():
        for c in canonicals:
            by_canonical.setdefault((etype, c), set()).add(surf)
    for (etype, canonical), surfaces in by_canonical.items():
        eids = set()
        for s in surfaces:
            eids |= surf_to_entity.get((etype, s), set())
        pair_total += 1
        if len(eids) == 1:
            pair_correct += 1
    assert pair_total > 0
    assert pair_correct / pair_total >= 0.95, (
        f"cluster purity {pair_correct}/{pair_total}"
    )

    # no over-merge: two different canonical orgs never share an entity row
    canon_names = {}
    for e in ents:
        if e["entity_type"] != "organizations":
            continue
        canon_names.setdefault(e["entity_id"], set()).add(e["canonical_name"])
    # each gold canonical maps to exactly one entity_id
    org_gold = {c for (t, c) in by_canonical if t == "organizations"}
    eid_by_canonical = {}
    over_merged = 0
    for c in org_gold:
        eids = surf_to_entity.get(("organizations", normalize_for_match(c)), set())
        for eid in eids:
            if eid in eid_by_canonical and eid_by_canonical[eid] != c:
                over_merged += 1
            eid_by_canonical[eid] = c
    assert over_merged == 0, f"{over_merged} over-merged org clusters"


def test_canonical_name_selection(pipeline_out):
    """Full forms must beat acronyms/aliases as canonical names."""
    tables, _, _, _ = pipeline_out
    orgs = {
        e["canonical_name"]
        for e in tables["entities"].filter(F.col("entity_type") == "organizations").collect()
    }
    # acronym-only canonical names should not exist for known entities
    assert "DoD" not in orgs
    assert "ICE" not in orgs
    assert "DHS" not in orgs


def test_edges_shape_and_provenance(pipeline_out):
    tables, _, _, _ = pipeline_out
    edges = tables["edges"]
    preds = {r["pred"] for r in edges.select("pred").distinct().collect()}
    assert "mentioned_in" in preds
    assert "alias_of" in preds
    assert "has_type" in preds
    assert edges.filter(F.col("url").isNull()).count() == 0
    assert edges.filter(F.col("partition_id").isNull()).count() == 0


def test_profiles_grounded(pipeline_out):
    tables, _, _, _ = pipeline_out
    profiles = tables["profiles"]
    n = profiles.count()
    assert n > 0
    # every profile has citations and high grounding (deterministic build)
    bad = profiles.filter(
        (F.col("total_claims") == 0) | (F.col("grounding_score") < 0.99)
    ).count()
    assert bad == 0
    # version numbering dense from 1..current_version
    row = profiles.orderBy(F.desc("current_version")).first()
    nums = [v["version_number"] for v in row["versions"]]
    assert nums == list(range(1, row["current_version"] + 1))


def test_resume_identity(pipeline_out, spark):
    """Re-running with resume=True must not recompute or change outputs."""
    tables, _, out_dir, pages = pipeline_out
    before = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in tables["edges"].collect()
    )
    tables2 = run_pipeline(spark, pages, out_dir, resume=True)
    after = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in tables2["edges"].collect()
    )
    assert before == after


def test_metrics_per_partition(pipeline_out):
    tables, _, _, _ = pipeline_out
    m = tables["metrics"]
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert {"articles", "mentions", "entities", "edges"} <= stages
    total_mentions = (
        m.filter(F.col("stage") == "mentions").agg(F.sum("rows")).first()[0]
    )
    assert total_mentions == tables["mentions"].count()


def test_pipeline_with_extraction_cache(spark, tmp_path):
    """S8 wired into run_pipeline: a corpus whose pages are ~50% duplicate
    content extracts each distinct hash ONCE (cache rows = distinct hashes),
    re-runs are pure hits, and hit/miss counters land in the metrics table."""
    from hinbox_spark.config import DomainConfig

    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    cache = str(tmp_path / "cache")
    cfg = DomainConfig(extraction_cache_path=cache)

    pages, _ = pages_dataframe(spark, n_pages=80, seed=42)
    t1 = run_pipeline(spark, pages, out1, cfg=cfg, resume=False)
    baseline = run_pipeline(spark, pages, str(tmp_path / "nocache"), resume=False)

    # identical mentions with and without the cache
    key = lambda r: (r["url"], r["entity_type"], r["name"])
    assert sorted(map(key, t1["mentions"].collect())) == sorted(
        map(key, baseline["mentions"].collect())
    )

    # one extraction per distinct content hash
    from hinbox_spark.operators.extraction import extract_articles

    n_hashes = (
        extract_articles(pages).select("content_hash").distinct().count()
    )
    from hinbox_spark.operators.extraction import (
        EXTRACTOR_VERSION, read_extraction_cache,
    )

    cached_hashes = (
        read_extraction_cache(spark, cache, EXTRACTOR_VERSION)
        .select("content_hash").distinct().count()
    )
    assert cached_hashes == n_hashes

    # counters surfaced in metrics (run-level rows, partition_id = -1)
    metrics = {r["stage"]: r["rows"] for r in t1["metrics"].collect()
               if r["stage"].startswith("extraction_cache_")}
    assert metrics["extraction_cache_distinct_hashes"] == n_hashes
    assert metrics["extraction_cache_misses"] == n_hashes
    assert metrics["extraction_cache_hits"] == 0

    # second run over the same corpus: all hits, cache unchanged
    n_cache_rows = read_extraction_cache(spark, cache, EXTRACTOR_VERSION).count()
    t2 = run_pipeline(spark, pages, out2, cfg=cfg, resume=False)
    metrics2 = {r["stage"]: r["rows"] for r in t2["metrics"].collect()
                if r["stage"].startswith("extraction_cache_")}
    assert metrics2["extraction_cache_hits"] == n_hashes
    assert metrics2["extraction_cache_misses"] == 0
    assert (
        read_extraction_cache(spark, cache, EXTRACTOR_VERSION).count()
        == n_cache_rows
    )


def test_overlap_exception_safety(spark, tmp_path, monkeypatch):
    """A profiles-stage failure must not leave the overlapped background
    writes racing the unwind: both concurrent writes (decisions, edges)
    are joined to completion before the error propagates, the pool is shut
    down (structurally guaranteed by the finally), and a subsequent resume
    completes with outputs identical to a fresh run."""
    import hinbox_spark.pipeline as pl
    from hinbox_spark import fs as hfs

    out = str(tmp_path / "boom")
    pages, _ = pages_dataframe(spark, 40, 5)

    def _boom(*a, **k):
        raise RuntimeError("profiles stage failure")

    monkeypatch.setattr(pl, "build_profiles", _boom)
    with pytest.raises(RuntimeError, match="profiles stage failure"):
        pl.run_pipeline(spark, pages, out, resume=False)
    # futures were joined before unwinding: both background writes
    # finished their parquet commit rather than being abandoned mid-write
    assert hfs.exists(spark, out + "/decisions/_SUCCESS")
    assert hfs.exists(spark, out + "/edges/_SUCCESS")

    monkeypatch.undo()
    t = pl.run_pipeline(spark, pages, out, resume=True)
    ref = pl.run_pipeline(spark, pages, str(tmp_path / "ref"), resume=False)
    key = lambda r: (r["subj"], r["pred"], r["obj"])
    assert sorted(map(key, t["edges"].collect())) == sorted(
        map(key, ref["edges"].collect())
    )


def test_background_write_failure_surfaces(spark, tmp_path, monkeypatch):
    """An error inside a background (thread-pool) write must not be
    swallowed: with no foreground error in flight, the joined future's
    exception is re-raised from the overlap block."""
    import hinbox_spark.pipeline as pl

    orig = pl._write

    def _w(df, base, name, partition_cols=None):
        if name == "decisions":
            raise RuntimeError("decisions write failure")
        return orig(df, base, name, partition_cols)

    monkeypatch.setattr(pl, "_write", _w)
    pages, _ = pages_dataframe(spark, 40, 5)
    with pytest.raises(RuntimeError, match="decisions write failure"):
        pl.run_pipeline(spark, pages, str(tmp_path / "bg"), resume=False)


def test_pre_extracted_text_fast_path(spark):
    """Rows with a populated text column bypass the full-parse UDF: the text
    passes through byte-identically and the title comes from the streaming
    h1 scan."""
    from hinbox_spark.operators.extraction import extract_articles

    html = b"<html><body><h1>Pre Title</h1><article><p>Ignored body.</p></article></body></html>"
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            ("u1", ts, html, "Already extracted text.", "en"),
            ("u2", ts, html, "", "en"),          # empty → full parse
            ("u3", ts, html, None, "en"),        # null  → full parse
            ("u4", ts, html, "Texto.", "es"),    # wrong lang → dropped
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = {r["url"]: r for r in extract_articles(pages).collect()}
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["text"] == "Already extracted text."
    assert rows["u1"]["title"] == "Pre Title"
    assert rows["u2"]["text"] == "Ignored body."
    assert rows["u3"]["text"] == "Ignored body."


def test_pipeline_with_file_uri_output(spark, tmp_path):
    """Checkpoint dir addressed by a file: URI — every existence check goes
    through the Hadoop FS API, so no os.path call can break on a remote
    filesystem."""
    out = "file://" + str(tmp_path / "uri_out")
    pages, _ = pages_dataframe(spark, 40, 5)
    t1 = run_pipeline(spark, pages, out, resume=False)
    n_edges = t1["edges"].count()
    assert n_edges > 0
    # resume skips all stages and returns identical tables
    t2 = run_pipeline(spark, pages, out, resume=True)
    assert t2["edges"].count() == n_edges


def test_decisions_mergestat_parity(pipeline_out):
    """A1: decisions table carries the reference MergeStats categories —
    merged (accepted edges per reason), disputed (gray-band deferrals),
    skipped (candidates that failed the match check) — and the counts
    reconcile with the edge/review tables."""
    tables, _, _, _ = pipeline_out
    rows = tables["decisions"].collect()
    by_decision = {}
    for r in rows:
        by_decision.setdefault(r["decision"], 0)
        by_decision[r["decision"]] += r["n"]
    assert set(by_decision) <= {"merged", "disputed", "skipped"}
    assert by_decision.get("merged", 0) > 0
    # after second-stage arbitration, 'disputed' = still-open defers; the
    # arbitrated merge/skip rows are counted under merged/skipped instead
    review = tables["review"]
    assert set(
        r["decision"] for r in review.select("decision").distinct().collect()
    ) <= {"merge", "skip", "defer"}
    import pyspark.sql.functions as F

    assert by_decision.get("disputed", 0) == review.filter(
        F.col("decision") == "defer"
    ).count()
