"""Domain configuration for the KG-construction pipeline.

Mirrors the reference's domain-config shape (similarity thresholds, lexical
blocking, name-variant equivalence groups, merge-evidence windows) from
/root/reference/configs/guantanamo/config.yaml:13-84 and the resolution chain
in /root/reference/src/config_loader.py:107-126 — re-expressed as a plain
dataclass so executors can broadcast it cheaply.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Per-type cosine-similarity merge thresholds
# (reference: configs/guantanamo/config.yaml:17-22).
DEFAULT_SIMILARITY_THRESHOLDS: dict[str, float] = {
    "default": 0.75,
    "people": 0.82,
    "organizations": 0.78,
    "locations": 0.80,
    "events": 0.76,
}

# Gray-band dispute routing constants (reference: src/constants.py:30-33).
GRAY_BAND_WIDTH = 0.05
GRAY_BAND_CONFIDENCE_CUTOFF = 0.7

# Canonical-name swap margin (reference: src/engine/mergers.py:255-260).
CANONICAL_SWAP_MARGIN = 0.3

# Blocking limits (reference: configs/guantanamo/config.yaml:23-26).
BLOCKING_MAX_CANDIDATES = 50

# Evidence-text build (reference: configs/guantanamo/config.yaml:80-84).
EVIDENCE_MAX_CHARS = 1500
EVIDENCE_WINDOW_CHARS = 240
EVIDENCE_MAX_WINDOWS = 3

# Profile QC (reference: src/constants.py:36-38).
PROFILE_QC_MIN_TEXT_LENGTH = 100
PROFILE_QC_MIN_TAG_COUNT = 1
QC_MIN_NAME_LENGTH = 3

ENTITY_TYPES = ("people", "organizations", "locations", "events")

# Equivalence groups: config-driven synonym sets
# (reference: configs/guantanamo/config.yaml:27-47).
DEFAULT_EQUIVALENCE_GROUPS: dict[str, list[list[str]]] = {
    "organizations": [
        ["Department of Defense", "Defense Department", "DoD", "Pentagon"],
        ["Department of Justice", "Justice Department", "DoJ"],
        ["Department of Homeland Security", "Homeland Security", "DHS"],
        ["Department of State", "State Department"],
        ["Immigration and Customs Enforcement", "ICE"],
        ["Customs and Border Protection", "CBP"],
        ["Central Intelligence Agency", "CIA"],
        ["Federal Bureau of Investigation", "FBI"],
        ["National Security Agency", "NSA"],
        ["Defense Intelligence Agency", "DIA"],
        ["Joint Task Force Guantanamo", "JTF-GTMO", "JTF GTMO"],
        ["American Civil Liberties Union", "ACLU"],
        ["International Committee of the Red Cross", "ICRC", "Red Cross"],
        ["United Nations", "UN", "U.N."],
    ],
    "locations": [
        [
            "Guantanamo Bay",
            "Guantanamo",
            "GTMO",
            "Naval Station Guantanamo Bay",
            "Guantanamo Bay Naval Base",
        ],
        ["United States", "U.S.", "US"],
    ],
}


# Curated domain entities (deterministic stand-in for the reference's
# configs/{domain}/categories/*.yaml + prompt gazetteers): canonical name →
# (category, surface variants). Used by both mention detection and the
# synthetic fixture generator.
DOMAIN_PEOPLE: list[str] = [
    "Mohammed Al-Qahtani", "Omar Khadr", "Carol Rosenberg", "James Mitchell",
    "Gina Haspel", "Lloyd Austin", "Avril Haines", "Mark Martins",
    "Susan Crawford", "David Hicks", "John Bellinger", "Harvey Rishikof",
]

DOMAIN_ORGS: dict[str, tuple[str, list[str]]] = {
    "Department of Defense": ("government", ["Department of Defense", "Defense Department", "DoD", "Pentagon"]),
    "Department of Justice": ("government", ["Department of Justice", "Justice Department", "DoJ"]),
    "Department of Homeland Security": ("government", ["Department of Homeland Security", "Homeland Security", "DHS"]),
    "Immigration and Customs Enforcement": ("government", ["Immigration and Customs Enforcement", "ICE"]),
    "Central Intelligence Agency": ("government", ["Central Intelligence Agency", "CIA"]),
    "Federal Bureau of Investigation": ("government", ["Federal Bureau of Investigation", "FBI"]),
    "American Civil Liberties Union": ("ngo", ["American Civil Liberties Union", "ACLU"]),
    "International Committee of the Red Cross": ("ngo", ["International Committee of the Red Cross", "ICRC", "Red Cross"]),
    "United Nations": ("international", ["United Nations", "UN"]),
    "Joint Task Force Guantanamo": ("military", ["Joint Task Force Guantanamo", "JTF-GTMO"]),
    "National Security Agency": ("government", ["National Security Agency", "NSA"]),
    "Southern Command": ("military", ["Southern Command"]),
}

DOMAIN_LOCS: dict[str, tuple[str, list[str]]] = {
    # the accented form is a transliteration variant: not in any equivalence
    # group, so linking it exercises the MinHash-LSH + evidence-cosine path
    "Guantanamo Bay": ("base", ["Guantanamo Bay", "Guantanamo", "GTMO", "Guantánamo Bay"]),
    "United States": ("country", ["United States"]),
    "Camp Delta": ("facility", ["Camp Delta"]),
    "Camp Justice": ("facility", ["Camp Justice"]),
    "Havana": ("city", ["Havana"]),
    "Washington": ("city", ["Washington"]),
    "Miami": ("city", ["Miami"]),
    "Kandahar": ("city", ["Kandahar"]),
    "Bagram Airfield": ("base", ["Bagram Airfield"]),
    "Caribbean Sea": ("region", ["Caribbean Sea"]),
}


def _default_relevance_keywords() -> list[str]:
    """Deterministic stand-in for the reference's LLM relevance check
    (src/engine/relevance.py): an article is domain-relevant iff it contains
    any known domain surface form. Lowercased for case-insensitive scan."""
    kws: set[str] = {p.lower() for p in DOMAIN_PEOPLE}
    for variants in (DOMAIN_ORGS, DOMAIN_LOCS):
        for _, (_, surfaces) in variants.items():
            kws.update(s.lower() for s in surfaces)
    return sorted(kws)


@dataclass(frozen=True)
class DomainConfig:
    """Pipeline configuration for one domain (broadcastable)."""

    domain: str = "guantanamo"
    similarity_thresholds: dict[str, float] = field(
        default_factory=lambda: dict(DEFAULT_SIMILARITY_THRESHOLDS)
    )
    equivalence_groups: dict[str, list[list[str]]] = field(
        default_factory=lambda: {
            k: [list(g) for g in v] for k, v in DEFAULT_EQUIVALENCE_GROUPS.items()
        }
    )
    blocking_max_candidates: int = BLOCKING_MAX_CANDIDATES
    gray_band_width: float = GRAY_BAND_WIDTH
    gray_band_confidence_cutoff: float = GRAY_BAND_CONFIDENCE_CUTOFF
    canonical_swap_margin: float = CANONICAL_SWAP_MARGIN
    evidence_max_chars: int = EVIDENCE_MAX_CHARS
    evidence_window_chars: int = EVIDENCE_WINDOW_CHARS
    evidence_max_windows: int = EVIDENCE_MAX_WINDOWS
    embedding_dim: int = 256
    # S8: when set, stage 2 consults the content-hash extraction cache at
    # this path (reference sidecar cache, src/utils/extraction_cache.py) —
    # N duplicate pages cost one extraction; hit/miss counters land in the
    # metrics table
    extraction_cache_path: str | None = None
    # F4: explicit domain-relevance predicate (keyword scan — the
    # deterministic analog of src/engine/relevance.py); irrelevant articles
    # skip the NER stage and are counted in the skip-reason summary (A2)
    relevance_keywords: tuple[str, ...] = field(
        default_factory=lambda: tuple(_default_relevance_keywords())
    )
    # When true, article text is PII-scrubbed (functions/pii.py: emails,
    # NANP phones, IPv4s → typed tokens) before anything persists or
    # hashes — the standard web-corpus scrub pass. Default OFF: the
    # byte-identical-extraction invariant vs the reference holds only on
    # unscrubbed text (YAML: processing.scrub_pii).
    scrub_pii: bool = False
    # When set, each pipeline run also publishes its entities into a
    # snapshot-versioned store (hinbox_spark.tables.SnapshotTable — the
    # Iceberg-shaped entity store: atomic optimistic commits, time travel,
    # merge-on-read upsert by entity_id). SURVEY §1.3 mapping.
    snapshot_store_path: str | None = None
    # YAML-loaded gazetteer entries (config_loader.load_domain_config fills
    # these from configs/{domain}/categories/*.yaml examples). None → the
    # built-in curated domain pools above. Tuples so the frozen dataclass
    # stays cheaply hashable/broadcastable.
    gazetteer_orgs: tuple[tuple[str, str], ...] | None = None
    gazetteer_locs: tuple[tuple[str, str], ...] | None = None
    gazetteer_people: tuple[str, ...] | None = None
    # Per-type lexical-blocking config (merged defaults + per-type override,
    # reference: src/config_loader.py:128-158). Empty → defaults everywhere.
    lexical_blocking_per_type: dict[str, dict] = field(default_factory=dict)
    # Domain-wide dedup.lexical_blocking defaults — what blocking_for
    # returns for entity types without a per-type entry (a YAML domain's
    # defaults must apply to NEW types too, not just ENTITY_CATEGORIES).
    lexical_blocking_defaults: dict = field(default_factory=dict)
    # Acronym-generation stopwords for name variants
    # (reference: src/config_loader.py:246-276 defaults).
    acronym_stopwords: tuple[str, ...] = (
        "the", "of", "for", "and", "to", "in", "on", "a", "an", "at", "by",
    )

    def threshold_for(self, entity_type: str) -> float:
        """Resolution chain: per-type → default → 0.75
        (reference: src/config_loader.py:107-126; the YAML loader folds the
        legacy top-level similarity_threshold into 'default')."""
        t = self.similarity_thresholds
        return t.get(entity_type, t.get("default", 0.75))

    def blocking_for(self, entity_type: str | None = None) -> dict:
        """Lexical-blocking config for one entity type: merged defaults +
        per-type override (reference: src/config_loader.py:128-158)."""
        result = {
            "enabled": False,
            "threshold": 60,
            "max_candidates": self.blocking_max_candidates,
        }
        result.update(self.lexical_blocking_defaults)
        if entity_type and entity_type in self.lexical_blocking_per_type:
            result.update(self.lexical_blocking_per_type[entity_type])
        return result


def get_default_config() -> DomainConfig:
    return DomainConfig()
