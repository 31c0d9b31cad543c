"""Domain-config YAML loader.

Reference parity: /root/reference/src/config_loader.py (DomainConfig class,
threshold resolution chain at :107-126, lexical-blocking merge at :128-158,
name-variants defaults at :246-276, entity-type key mapping at :277-303) and
src/dynamic_models.py:13-215 (category YAML → typed mention schema). The
reference builds its pipeline behavior from ``configs/{domain}/config.yaml``
plus ``configs/{domain}/categories/*.yaml``; this module loads the same file
layout into the broadcastable :class:`hinbox_spark.config.DomainConfig`
dataclass plus a :class:`hinbox_spark.functions.ner.Gazetteer`, so a NEW
domain is one directory of YAML away — no code change.

Where the reference derives its per-type mention vocabulary from LLM prompts
constrained by the category enums, the deterministic analog derives the
gazetteer from the category ``examples`` lists (every example surface is a
known mention of its type) plus the equivalence groups — the same YAML, the
same semantics, minus the LLM.
"""

from __future__ import annotations

import os
from typing import Any

import yaml

from hinbox_spark.config import DomainConfig
from hinbox_spark.functions.ner import Gazetteer

ENTITY_CATEGORIES = ("people", "organizations", "locations", "events")

# plural category → singular prefix for the `<singular>_types` YAML key
# (reference: src/config_loader.py:283-291)
_SINGULAR = {
    "people": "person",
    "events": "event",
    "organizations": "organization",
    "locations": "location",
}

_ACRONYM_STOPWORDS_DEFAULT = (
    "the", "of", "for", "and", "to", "in", "on", "a", "an", "at", "by",
)


def available_domains(configs_dir: str) -> list[str]:
    """Domains under ``configs_dir`` that carry a config.yaml
    (reference: src/config_loader.py:39-55; skips the ``template`` dir)."""
    if not os.path.isdir(configs_dir):
        return []
    out = []
    for item in sorted(os.listdir(configs_dir)):
        if item == "template":
            continue
        if os.path.isfile(os.path.join(configs_dir, item, "config.yaml")):
            out.append(item)
    return out


def _read_yaml(path: str) -> dict[str, Any]:
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return data or {}


def load_raw_config(configs_dir: str, domain: str) -> dict[str, Any]:
    """Parse ``{configs_dir}/{domain}/config.yaml``; unknown domain raises
    with the available list (reference: src/config_loader.py:29-37)."""
    domain_dir = os.path.join(configs_dir, domain)
    if not os.path.isdir(domain_dir):
        raise ValueError(
            f"Domain '{domain}' not found. "
            f"Available domains: {', '.join(available_domains(configs_dir))}"
        )
    return _read_yaml(os.path.join(domain_dir, "config.yaml"))


def load_categories(
    configs_dir: str, domain: str, entity_category: str
) -> dict[str, Any]:
    """Parse ``categories/{entity_category}.yaml``
    (reference: src/config_loader.py:64-74)."""
    path = os.path.join(configs_dir, domain, "categories", f"{entity_category}.yaml")
    if not os.path.isfile(path):
        raise ValueError(f"Categories file not found: {path}")
    return _read_yaml(path)


def entity_types_for(
    configs_dir: str, domain: str, entity_category: str
) -> list[str]:
    """Type enum for one category — tries ``<singular>_types`` then
    ``<plural>_types`` then bare ``types``
    (reference: src/config_loader.py:277-303)."""
    cats = load_categories(configs_dir, domain, entity_category)
    singular = _SINGULAR.get(entity_category, entity_category.rstrip("s"))
    for key in (f"{singular}_types", f"{entity_category}_types", "types"):
        if key in cats:
            return list(cats[key].keys())
    return []


def _similarity_thresholds(raw: dict[str, Any]) -> dict[str, float]:
    """Threshold resolution chain: dedup.similarity_thresholds.<type> →
    .default → legacy top-level similarity_threshold → 0.75
    (reference: src/config_loader.py:107-126). The chain is baked into the
    returned dict by injecting the legacy/0.75 fallback as 'default' when
    absent, so DomainConfig.threshold_for reproduces it exactly."""
    thresholds = {
        k: float(v)
        for k, v in (raw.get("dedup", {}).get("similarity_thresholds") or {}).items()
    }
    if "default" not in thresholds:
        thresholds["default"] = float(raw.get("similarity_threshold", 0.75))
    return thresholds


def _lexical_blocking(
    raw: dict[str, Any], entity_type: str | None = None
) -> dict[str, Any]:
    """dedup.lexical_blocking defaults merged with
    dedup.per_type.<type>.lexical_blocking overrides
    (reference: src/config_loader.py:128-158)."""
    dedup = raw.get("dedup", {})
    result = {"enabled": False, "threshold": 60, "max_candidates": 50}
    result.update(dedup.get("lexical_blocking") or {})
    if entity_type:
        per_type = (dedup.get("per_type", {}).get(entity_type) or {})
        result.update(per_type.get("lexical_blocking") or {})
    return result


def _equivalence_groups(raw: dict[str, Any]) -> dict[str, list[list[str]]]:
    """dedup.name_variants.<type>.equivalence_groups
    (reference: src/config_loader.py:246-276)."""
    out: dict[str, list[list[str]]] = {}
    variants = raw.get("dedup", {}).get("name_variants") or {}
    for etype, vcfg in variants.items():
        # name_variants holds non-type keys too (acronym_stopwords is read
        # at load time below); only dict values are per-type variant blocks
        if not isinstance(vcfg, dict):
            continue
        groups = vcfg.get("equivalence_groups") or []
        out[etype] = [[str(m) for m in g] for g in groups]
    return out


def _gazetteer_entries(
    configs_dir: str, domain: str
) -> tuple[dict[str, str], dict[str, str], list[str]]:
    """(org surface→type, loc surface→type, people surfaces) from the
    category YAMLs' ``examples`` lists. Mirrors how the reference's dynamic
    models constrain extraction to the category enums
    (src/dynamic_models.py:13-215) — the examples are the deterministic
    mention vocabulary."""
    orgs: dict[str, str] = {}
    locs: dict[str, str] = {}
    people: list[str] = []

    def _types_block(category: str) -> dict[str, Any]:
        try:
            cats = load_categories(configs_dir, domain, category)
        except ValueError:
            return {}  # domain without this category file → empty vocabulary
        singular = _SINGULAR.get(category, category.rstrip("s"))
        for key in (f"{singular}_types", f"{category}_types", "types"):
            if key in cats:
                return cats[key] or {}
        return {}

    for tname, tdef in _types_block("organizations").items():
        for ex in (tdef or {}).get("examples") or []:
            orgs.setdefault(str(ex), tname)
    for tname, tdef in _types_block("locations").items():
        for ex in (tdef or {}).get("examples") or []:
            locs.setdefault(str(ex), tname)
    for _tname, tdef in _types_block("people").items():
        for ex in (tdef or {}).get("examples") or []:
            people.append(str(ex))
    return orgs, locs, people


def _relevance_keywords(
    raw: dict[str, Any],
    orgs: dict[str, str],
    locs: dict[str, str],
    people: list[str],
    groups: dict[str, list[list[str]]],
) -> tuple[str, ...]:
    """Keyword scan analog of the reference's LLM relevance check
    (src/engine/relevance.py): any known domain surface form marks an
    article relevant. ``processing.relevance_check: false`` disables the
    filter entirely (empty tuple → relevance_predicate returns lit(True))."""
    if not (raw.get("processing", {}) or {}).get("relevance_check", True):
        return ()
    kws: set[str] = {p.lower() for p in people}
    kws.update(s.lower() for s in orgs)
    kws.update(s.lower() for s in locs)
    for etype_groups in groups.values():
        for g in etype_groups:
            kws.update(m.lower() for m in g)
    return tuple(sorted(kws))


def load_domain_config(configs_dir: str, domain: str) -> DomainConfig:
    """``configs/{domain}/`` YAML tree → broadcastable DomainConfig."""
    raw = load_raw_config(configs_dir, domain)
    groups = _equivalence_groups(raw)
    orgs, locs, people = _gazetteer_entries(configs_dir, domain)

    blocking = _lexical_blocking(raw)
    merge_evidence = {"max_chars": 1500, "window_chars": 240, "max_windows": 3}
    merge_evidence.update(raw.get("merge_evidence") or {})

    cache_cfg = raw.get("cache", {}) or {}
    extraction_cache_path = None
    ext_cache = cache_cfg.get("extraction", {}) or {}
    if cache_cfg.get("enabled", True) and ext_cache.get("enabled", True):
        subdir = ext_cache.get("subdir")
        out_dir = (raw.get("output", {}) or {}).get("directory")
        if subdir and out_dir:
            extraction_cache_path = os.path.join(out_dir, subdir)

    return DomainConfig(
        domain=str(raw.get("domain", domain)),
        similarity_thresholds=_similarity_thresholds(raw),
        equivalence_groups=groups,
        blocking_max_candidates=int(blocking["max_candidates"]),
        evidence_max_chars=int(merge_evidence["max_chars"]),
        evidence_window_chars=int(merge_evidence["window_chars"]),
        evidence_max_windows=int(merge_evidence["max_windows"]),
        extraction_cache_path=extraction_cache_path,
        scrub_pii=bool((raw.get("processing", {}) or {}).get("scrub_pii", False)),
        relevance_keywords=_relevance_keywords(raw, orgs, locs, people, groups),
        gazetteer_orgs=tuple(sorted(orgs.items())),
        gazetteer_locs=tuple(sorted(locs.items())),
        gazetteer_people=tuple(people),
        lexical_blocking_per_type={
            etype: _lexical_blocking(raw, etype)
            for etype in ENTITY_CATEGORIES
        },
        lexical_blocking_defaults=_lexical_blocking(raw),
        acronym_stopwords=tuple(
            (raw.get("dedup", {}).get("name_variants", {}) or {})
            .get("acronym_stopwords", _ACRONYM_STOPWORDS_DEFAULT)
        ),
    )


def gazetteer_from_domain(configs_dir: str, domain: str) -> Gazetteer:
    """Standalone Gazetteer for callers that don't need the full config."""
    cfg = load_domain_config(configs_dir, domain)
    return gazetteer_for(cfg)


def gazetteer_for(cfg: DomainConfig) -> Gazetteer:
    """Gazetteer from a DomainConfig: YAML-loaded entries when present,
    the built-in curated domain pools otherwise (both paths honor the
    config's equivalence groups)."""
    if (
        cfg.gazetteer_orgs is None
        and cfg.gazetteer_locs is None
        and cfg.gazetteer_people is None
    ):
        from hinbox_spark.config import DOMAIN_LOCS, DOMAIN_ORGS, DOMAIN_PEOPLE

        return Gazetteer(
            org_entries={v: t for _, (t, vs) in DOMAIN_ORGS.items() for v in vs},
            loc_entries={v: t for _, (t, vs) in DOMAIN_LOCS.items() for v in vs},
            people_entries=list(DOMAIN_PEOPLE),
            equivalence_groups=cfg.equivalence_groups,
        )
    return Gazetteer(
        org_entries=dict(cfg.gazetteer_orgs or ()),
        loc_entries=dict(cfg.gazetteer_locs or ()),
        people_entries=list(cfg.gazetteer_people or ()),
        equivalence_groups=cfg.equivalence_groups,
    )
