"""Domain-config YAML loader tests (reference parity:
src/config_loader.py threshold chain / blocking merge / entity-type keys,
plus a second toy domain driving the pipeline end-to-end)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
import yaml

from hinbox_spark.config import (
    DEFAULT_EQUIVALENCE_GROUPS,
    DEFAULT_SIMILARITY_THRESHOLDS,
    DOMAIN_LOCS,
    DOMAIN_ORGS,
    DOMAIN_PEOPLE,
)
from hinbox_spark.config_loader import (
    available_domains,
    entity_types_for,
    gazetteer_for,
    load_categories,
    load_domain_config,
)


# ── fixture writers ──────────────────────────────────────────────────────


def _write_domain(root, name: str, config: dict, categories: dict[str, dict]):
    ddir = root / name
    (ddir / "categories").mkdir(parents=True, exist_ok=True)
    (ddir / "config.yaml").write_text(yaml.safe_dump(config, sort_keys=False))
    for etype, body in categories.items():
        (ddir / "categories" / f"{etype}.yaml").write_text(
            yaml.safe_dump(body, sort_keys=False)
        )
    return str(root)


def _default_shape_config() -> dict:
    """config.yaml reproducing the built-in domain's values (the same shape
    as the reference's configs/guantanamo/config.yaml)."""
    return {
        "domain": "gtmo_fixture",
        "similarity_threshold": 0.75,
        "dedup": {
            "similarity_thresholds": dict(DEFAULT_SIMILARITY_THRESHOLDS),
            "lexical_blocking": {
                "enabled": True,
                "threshold": 60,
                "max_candidates": 50,
            },
            "name_variants": {
                k: {"equivalence_groups": [list(g) for g in v]}
                for k, v in DEFAULT_EQUIVALENCE_GROUPS.items()
            },
        },
        "merge_evidence": {"max_chars": 1500, "window_chars": 240, "max_windows": 3},
        "processing": {"relevance_check": True},
    }


def _default_shape_categories() -> dict[str, dict]:
    """categories/*.yaml whose examples are the built-in curated pools."""
    org_types: dict[str, dict] = {}
    for canon, (t, variants) in DOMAIN_ORGS.items():
        org_types.setdefault(t, {"description": t, "examples": []})
        org_types[t]["examples"].extend(variants)
    loc_types: dict[str, dict] = {}
    for canon, (t, variants) in DOMAIN_LOCS.items():
        loc_types.setdefault(t, {"description": t, "examples": []})
        loc_types[t]["examples"].extend(variants)
    return {
        "people": {
            "person_types": {
                "person": {"description": "any person", "examples": list(DOMAIN_PEOPLE)}
            }
        },
        "organizations": {"organization_types": org_types},
        "locations": {"location_types": loc_types},
        "events": {
            "event_types": {
                "hearing": {"description": "court hearing", "examples": []},
                "transfer": {"description": "detainee transfer", "examples": []},
            }
        },
    }


APOLLO_CONFIG = {
    "domain": "apollo",
    "dedup": {
        "similarity_thresholds": {"default": 0.7, "people": 0.85},
        "lexical_blocking": {"enabled": True, "threshold": 55, "max_candidates": 40},
        "per_type": {
            "people": {"lexical_blocking": {"max_candidates": 10}},
        },
        "name_variants": {
            "organizations": {
                "equivalence_groups": [
                    [
                        "National Aeronautics and Space Administration",
                        "NASA",
                    ],
                    ["Manned Spacecraft Center", "Mission Control"],
                ]
            },
            "locations": {
                "equivalence_groups": [
                    ["Kennedy Space Center", "Cape Kennedy"],
                ]
            },
        },
    },
    "merge_evidence": {"max_chars": 900, "window_chars": 120, "max_windows": 2},
}

APOLLO_CATEGORIES = {
    "people": {
        "person_types": {
            "astronaut": {
                "description": "crew member",
                "examples": ["Neil Armstrong", "Buzz Aldrin", "Michael Collins"],
            },
            "flight_director": {
                "description": "mission control lead",
                "examples": ["Gene Kranz", "Christopher Kraft"],
            },
        }
    },
    "organizations": {
        "organization_types": {
            "agency": {
                "description": "space agency",
                "examples": [
                    "National Aeronautics and Space Administration",
                    "NASA",
                ],
            },
            "contractor": {
                "description": "aerospace contractor",
                "examples": ["Grumman Corporation", "North American Aviation"],
            },
        }
    },
    "locations": {
        "location_types": {
            "launch_site": {
                "description": "launch complex",
                "examples": ["Kennedy Space Center", "Cape Kennedy"],
            },
            "celestial": {
                "description": "off-earth site",
                "examples": ["Sea of Tranquility"],
            },
            "city": {"description": "city", "examples": ["Houston"]},
        }
    },
    "events": {
        "event_types": {
            "launch": {"description": "rocket launch", "examples": []},
            "landing": {"description": "landing", "examples": []},
        }
    },
}


@pytest.fixture()
def configs_dir(tmp_path):
    root = tmp_path / "configs"
    _write_domain(root, "gtmo_fixture", _default_shape_config(), _default_shape_categories())
    _write_domain(root, "apollo", APOLLO_CONFIG, APOLLO_CATEGORIES)
    # template dir must be skipped even with a config.yaml
    (root / "template").mkdir()
    (root / "template" / "config.yaml").write_text("domain: template\n")
    return str(root)


# ── loader semantics ─────────────────────────────────────────────────────


def test_available_domains_skips_template(configs_dir):
    assert available_domains(configs_dir) == ["apollo", "gtmo_fixture"]
    assert available_domains(os.path.join(configs_dir, "nope")) == []


def test_default_shape_roundtrip(configs_dir):
    """The fixture reproducing the reference config shape loads into exactly
    the built-in defaults (thresholds + equivalence groups + evidence)."""
    cfg = load_domain_config(configs_dir, "gtmo_fixture")
    assert cfg.similarity_thresholds == DEFAULT_SIMILARITY_THRESHOLDS
    assert cfg.equivalence_groups == DEFAULT_EQUIVALENCE_GROUPS
    assert cfg.blocking_max_candidates == 50
    assert (cfg.evidence_max_chars, cfg.evidence_window_chars, cfg.evidence_max_windows) == (1500, 240, 3)
    for etype, expect in DEFAULT_SIMILARITY_THRESHOLDS.items():
        assert cfg.threshold_for(etype) == expect
    # gazetteer built from category examples matches the built-in pools
    gaz = gazetteer_for(cfg)
    assert gaz.get("DoD") == ("organizations", "government")
    assert gaz.get("GTMO") == ("locations", "base")
    assert gaz.get("Carol Rosenberg") == ("people", "person")


def test_threshold_chain(tmp_path):
    root = tmp_path / "configs"
    # per-type → default → legacy → 0.75, exercised one layer at a time
    _write_domain(root, "d1", {"dedup": {"similarity_thresholds": {"people": 0.9, "default": 0.6}}}, {})
    _write_domain(root, "d2", {"similarity_threshold": 0.8}, {})
    _write_domain(root, "d3", {}, {})
    c1 = load_domain_config(str(root), "d1")
    assert c1.threshold_for("people") == 0.9
    assert c1.threshold_for("locations") == 0.6
    c2 = load_domain_config(str(root), "d2")
    assert c2.threshold_for("people") == 0.8  # legacy folded into default
    c3 = load_domain_config(str(root), "d3")
    assert c3.threshold_for("people") == 0.75


def test_lexical_blocking_per_type_merge(configs_dir):
    cfg = load_domain_config(configs_dir, "apollo")
    assert cfg.blocking_max_candidates == 40
    people = cfg.blocking_for("people")
    assert people["max_candidates"] == 10  # per-type override wins
    assert people["threshold"] == 55  # base carried through
    assert people["enabled"] is True
    locs = cfg.blocking_for("locations")
    assert locs["max_candidates"] == 40


def test_entity_types_and_key_fallbacks(configs_dir, tmp_path):
    assert entity_types_for(configs_dir, "apollo", "people") == [
        "astronaut",
        "flight_director",
    ]
    assert entity_types_for(configs_dir, "apollo", "events") == ["launch", "landing"]
    # plural-key and bare-'types' fallbacks (reference: config_loader.py:290-303)
    root = tmp_path / "alt"
    _write_domain(
        root,
        "alt",
        {},
        {
            "people": {"peoples_types": {"x": {}}},  # no match → []
            "organizations": {"organizations_types": {"media": {}}},
            "locations": {"types": {"city": {}}},
        },
    )
    assert entity_types_for(str(root), "alt", "organizations") == ["media"]
    assert entity_types_for(str(root), "alt", "locations") == ["city"]
    assert entity_types_for(str(root), "alt", "people") == []


def test_unknown_domain_and_missing_categories(configs_dir):
    with pytest.raises(ValueError, match="apollo, gtmo_fixture"):
        load_domain_config(configs_dir, "atlantis")
    with pytest.raises(ValueError, match="Categories file not found"):
        load_categories(configs_dir, "apollo", "spacecraft")


def test_gazetteer_from_examples_and_groups(configs_dir):
    cfg = load_domain_config(configs_dir, "apollo")
    gaz = gazetteer_for(cfg)
    assert gaz.get("NASA") == ("organizations", "agency")
    assert gaz.get("Grumman Corporation") == ("organizations", "contractor")
    assert gaz.get("Sea of Tranquility") == ("locations", "celestial")
    assert gaz.get("Neil Armstrong") == ("people", "person")
    # equivalence-group member not in any example list inherits the group type
    assert gaz.get("Mission Control") == ("organizations", "unknown") or gaz.get(
        "Mission Control"
    ) == ("organizations", "agency")
    # relevance keywords include group members and surfaces
    assert "nasa" in cfg.relevance_keywords
    assert "cape kennedy" in cfg.relevance_keywords


def test_relevance_check_false_disables_filter(tmp_path, spark):
    root = tmp_path / "configs"
    _write_domain(root, "open", {"processing": {"relevance_check": False}}, {})
    cfg = load_domain_config(str(root), "open")
    assert cfg.relevance_keywords == ()
    from hinbox_spark.operators.extraction import relevance_predicate

    df = spark.createDataFrame([("anything at all",)], "text string")
    assert df.select(relevance_predicate(()).alias("r")).head()["r"] is True


# ── toy second domain drives the pipeline end-to-end ─────────────────────


_APOLLO_PAGES = [
    (
        "https://example.org/apollo/1",
        "<html><body><article><h1>Eagle has landed</h1>"
        "<p>Neil Armstrong landed at the Sea of Tranquility. "
        "Buzz Aldrin followed him onto the surface. "
        "The National Aeronautics and Space Administration confirmed the landing. "
        "Gene Kranz watched from Mission Control in Houston.</p></article></body></html>",
    ),
    (
        "https://example.org/apollo/2",
        "<html><body><article><h1>Launch day</h1>"
        "<p>NASA launched the mission from Kennedy Space Center. "
        "Michael Collins remained in orbit while Grumman Corporation engineers "
        "monitored the lander.</p></article></body></html>",
    ),
    (
        "https://example.org/apollo/3",
        "<html><body><article><h1>Recipe corner</h1>"
        "<p>Whisk the eggs with sugar until pale. Fold in the flour gently "
        "and bake for forty minutes.</p></article></body></html>",
    ),
]


def test_toy_domain_pipeline_e2e(configs_dir, spark, tmp_path):
    """A domain defined ONLY by YAML drives the full pipeline: relevance
    filter, gazetteer NER, linking with the domain's equivalence groups."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from hinbox_spark.pipeline import run_pipeline

    cfg = load_domain_config(configs_dir, "apollo")
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    ts = dt.datetime(1969, 7, 20, 20, 17)
    pages = spark.createDataFrame(
        [(u, ts, h.encode("utf-8"), None, "en") for u, h in _APOLLO_PAGES], schema
    )
    tables = run_pipeline(
        spark, pages, str(tmp_path / "apollo_out"), cfg=cfg, resume=False
    )

    articles = tables["articles"].collect()
    rel = {r["url"]: r["is_relevant"] for r in articles}
    assert rel["https://example.org/apollo/1"] is True
    assert rel["https://example.org/apollo/2"] is True
    assert rel["https://example.org/apollo/3"] is False  # recipe filtered out

    ents = tables["entities"].collect()
    by_type: dict[str, set[str]] = {}
    for e in ents:
        by_type.setdefault(e["entity_type"], set()).add(e["canonical_name"])

    assert "Neil Armstrong" in by_type.get("people", set())
    assert "Buzz Aldrin" in by_type.get("people", set())
    # NASA + long form merged into ONE org via the YAML equivalence group
    orgs = by_type.get("organizations", set())
    nasa_forms = {
        n
        for n in orgs
        if n in ("NASA", "National Aeronautics and Space Administration")
    }
    assert len(nasa_forms) == 1, orgs
    # no entities extracted from the irrelevant page
    mention_urls = {
        m["url"] for m in tables["mentions"].collect() if m["url"] is not None
    }
    assert "https://example.org/apollo/3" not in mention_urls


def test_cli_domain_flag(spark, tmp_path, capsys):
    """python -m hinbox_spark --configs-dir configs --domain example_space:
    the committed example YAML tree drives a real run via the CLI."""
    import json

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    from hinbox_spark.__main__ import main

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
        ]
    )
    ts = dt.datetime(1969, 7, 20, 20, 17)
    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [(u, ts, h.encode("utf-8"), None, "en") for u, h in _APOLLO_PAGES], schema
    ).write.parquet(pages_path)

    rc = main(
        [
            "--pages", pages_path,
            "--output", str(tmp_path / "out"),
            "--configs-dir", "configs",
            "--domain", "example_space",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    counts = json.loads(out)["rows"]
    assert counts["articles"] == 3
    assert counts["entities"] > 0


def test_acronym_stopwords_key_does_not_crash_loader(tmp_path):
    """dedup.name_variants.acronym_stopwords is a LIST living next to the
    per-type variant dicts — the equivalence-group walk must skip it
    (regression: it was iterated as an entity type and crashed with
    AttributeError on .get)."""
    root = tmp_path / "configs"
    _write_domain(
        root,
        "d1",
        {
            "dedup": {
                "name_variants": {
                    "acronym_stopwords": ["the", "of"],
                    "people": {"equivalence_groups": [["bill", "william"]]},
                }
            }
        },
        {},
    )
    cfg = load_domain_config(str(root), "d1")
    assert cfg.acronym_stopwords == ("the", "of")
    assert cfg.equivalence_groups["people"] == [["bill", "william"]]
    assert "acronym_stopwords" not in cfg.equivalence_groups


def test_blocking_defaults_apply_to_unknown_types(tmp_path):
    """A YAML domain's dedup.lexical_blocking defaults must reach entity
    types WITHOUT a per-type entry (and the no-type call), not only the
    four built-in categories (regression: blocking_for re-hardcoded
    enabled=False/threshold=60 for those)."""
    root = tmp_path / "configs"
    _write_domain(
        root,
        "d1",
        {"dedup": {"lexical_blocking": {"enabled": True, "threshold": 55}}},
        {},
    )
    cfg = load_domain_config(str(root), "d1")
    for probe in (None, "some_new_type"):
        blk = cfg.blocking_for(probe)
        assert blk["enabled"] is True
        assert blk["threshold"] == 55
