"""Golden snapshot: the emitted (subj, pred, obj) triples for the seed
fixture corpus are pinned byte-for-byte (SURVEY §5 rebuild test strategy).
Regenerate with: python tests/test_golden_triples.py

Also: partitioning-determinism — the same corpus through different shuffle
partitionings must emit identical triples (catches order-dependent
aggregation bugs that only show at scale).
"""

import json
import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "triples_seed42_n40.json")


def _compute_edges(spark, out_dir, shuffle_partitions=None):
    """Full edge rows incl. provenance (partition_id excluded — it is
    write-time lineage and legitimately varies with partitioning)."""
    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.sources.pages_gen import pages_dataframe

    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    pages, _ = pages_dataframe(spark, 40, 42)
    t = run_pipeline(spark, pages, out_dir, resume=False)
    return sorted(
        (r["subj"], r["pred"], r["obj"], r["url"], str(r["warc_ts"]))
        for r in t["edges"].collect()
    )


def _compute_triples(spark, out_dir, shuffle_partitions=None):
    return sorted(
        (s, p, o) for s, p, o, _, _ in _compute_edges(spark, out_dir, shuffle_partitions)
    )


def test_triples_match_golden(spark, tmp_path):
    triples = _compute_triples(spark, str(tmp_path / "g"))
    with open(GOLDEN_PATH) as f:
        golden = [tuple(t) for t in json.load(f)]
    assert triples == golden, (
        f"{len(set(triples) - set(golden))} extra, "
        f"{len(set(golden) - set(triples))} missing vs golden"
    )


def test_triples_partitioning_invariant(spark, tmp_path):
    """FULL edge rows (incl. url/warc_ts provenance) must be identical
    across partitionings — provenance is a deterministic struct-min pick,
    not an arbitrary dropDuplicates winner."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = _compute_edges(spark, str(tmp_path / "a"), shuffle_partitions=3)
        b = _compute_edges(spark, str(tmp_path / "b"), shuffle_partitions=13)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


if __name__ == "__main__":
    # regold
    from hinbox_spark.session import get_spark
    import tempfile

    spark = get_spark("regold", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    triples = _compute_triples(spark, tempfile.mkdtemp())
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump([list(t) for t in triples], f, indent=0)
    print(f"wrote {len(triples)} triples to {GOLDEN_PATH}")
