"""Deterministic name-variant semantics for entity linking.

Reproduces the observable behavior of the reference's name utilities
(/root/reference/src/utils/name_variants.py:27-393 — normalization, acronym
detection/derivation, word-boundary containment, equivalence groups,
low-quality detection, canonical scoring) as pure functions that run inside
vectorized pandas UDFs. Behavioral parity is pinned by tests/test_names.py,
which mirrors the reference suite tests/test_name_variants.py.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

ACRONYM_STOPWORDS = frozenset(
    ("the", "of", "for", "and", "to", "in", "on", "a", "an", "at", "by")
)

# Punctuation class stripped during match normalization
# (reference: name_variants.py:19).
_PUNCT_RE = re.compile(r"[’'\".,;:!?()\[\]{}&/\\–—-]")

_GENERIC_PLURAL_HEADS = frozenset(
    (
        "departments", "agencies", "officials", "authorities", "forces",
        "organizations", "institutions", "offices", "committees", "groups",
        "teams", "units", "branches", "divisions",
    )
)

_DESCRIPTIVE_LOCATION_RE = re.compile(
    r"(?i)^(?:(?:u\.s\.?|american|cuban|military)\s+)?"
    r"(?:military\s+)?"
    r"(?:base|prison|facility|camp|detention\s+center|jail|compound|complex|site)"
    r"\s+(?:in|at|near|outside|on)\s+"
)

_CONTEXTUAL_SUFFIXES = frozenset(
    ("soil", "territory", "waters", "border", "grounds", "arena", "area")
)

_LEADING_THE_RE = re.compile(r"(?i)^the\s+")


def normalize_display(name: object) -> str:
    """Strip, collapse whitespace runs, Unicode NFC
    (reference: name_variants.py:27-34)."""
    s = " ".join(str(name or "").split())
    return unicodedata.normalize("NFC", s)


def normalize_for_match(name: object) -> str:
    """Lowercase + strip punctuation class + collapse whitespace
    (reference: name_variants.py:37-45)."""
    s = normalize_display(name).lower()
    s = _PUNCT_RE.sub(" ", s)
    return " ".join(s.split())


def is_acronym_form(name: str, min_len: int = 2, max_len: int = 10) -> bool:
    """All-upper alpha 2-10 chars after removing dots/spaces, or ≤4-char
    mixed-case with ≥half upper, e.g. 'DoD'
    (reference: name_variants.py:53-72)."""
    c = str(name or "").replace(".", "").replace(" ", "").strip()
    if not c or not (min_len <= len(c) <= max_len) or not c.isalpha():
        return False
    if c.isupper():
        return True
    if len(c) <= 4:
        return sum(ch.isupper() for ch in c) >= len(c) / 2
    return False


def compute_acronym(long_name: str) -> str | None:
    """First letters of non-stopword words; needs ≥2 words, ≥2 significant
    words, ≥2-char result (reference: name_variants.py:75-100; the
    'Department of Defense'→'DD' quirk is intentional parity)."""
    words = str(long_name or "").split()
    if len(words) < 2:
        return None
    significant = [w for w in words if w.lower() not in ACRONYM_STOPWORDS]
    if len(significant) < 2:
        return None
    acr = "".join(w[0].upper() for w in significant if w)
    return acr if len(acr) >= 2 else None


def acronym_matches(short: str, long_name: str) -> bool:
    """short (dot/space/case-insensitive) equals the derived acronym of
    long_name (reference: name_variants.py:103-122)."""
    if not is_acronym_form(short):
        return False
    derived = compute_acronym(long_name)
    if derived is None:
        return False
    return str(short).replace(".", "").replace(" ", "").strip().upper() == derived


def is_name_contained(short_name: str, long_name: str, min_short_len: int = 4) -> bool:
    """Word-boundary containment of the match-normalized short name (≥4
    chars) in the long name (reference: name_variants.py:130-150)."""
    short_m = normalize_for_match(short_name)
    long_m = normalize_for_match(long_name)
    if len(short_m) < min_short_len:
        return False
    if short_m == long_m:
        return True
    return re.search(r"\b" + re.escape(short_m) + r"\b", long_m) is not None


def expand_equivalents(name: str, equivalence_groups: list[list[str]]) -> set[str]:
    """{name} ∪ every configured group containing it, matched via
    normalize_for_match (reference: name_variants.py:197-215)."""
    out = {name}
    key = normalize_for_match(name)
    for group in equivalence_groups or []:
        if key in {normalize_for_match(g) for g in group}:
            out.update(group)
    return out


def names_likely_same(
    name_a: str,
    name_b: str,
    entity_type: str = "organizations",
    equivalence_groups: list[list[str]] | None = None,
) -> bool:
    """Deterministic same-entity heuristic (reference:
    name_variants.py:223-281): exact normalized match; people are
    conservative (exact / equivalence-group only); non-people additionally
    match on acronym⇄long-form and word-boundary containment."""
    ma, mb = normalize_for_match(name_a), normalize_for_match(name_b)
    if ma == mb:
        return True

    def _in_group(a: str, b_match: str) -> bool:
        if not equivalence_groups:
            return False
        expanded = expand_equivalents(a, equivalence_groups)
        return b_match in {normalize_for_match(e) for e in expanded}

    if entity_type == "people":
        return _in_group(name_a, mb)

    da, db = normalize_display(name_a), normalize_display(name_b)
    if is_acronym_form(da) and not is_acronym_form(db):
        if acronym_matches(da, db):
            return True
    elif is_acronym_form(db) and not is_acronym_form(da):
        if acronym_matches(db, da):
            return True

    if len(ma) != len(mb):
        short, long_ = (da, db) if len(ma) < len(mb) else (db, da)
        if is_name_contained(short, long_):
            return True

    return _in_group(name_a, mb)


def is_low_quality_name(name: str, entity_type: str = "organizations") -> bool:
    """Generic plural head noun (≥2 words) or descriptive location phrase
    (reference: name_variants.py:321-344)."""
    cleaned = str(name or "").strip()
    if not cleaned:
        return False
    words = cleaned.split()
    if len(words) >= 2 and words[-1].lower() in _GENERIC_PLURAL_HEADS:
        return True
    return _DESCRIPTIVE_LOCATION_RE.match(cleaned) is not None


def strip_leading_article(name: str) -> str:
    """Drop a leading 'the ' (reference: name_variants.py:347-352)."""
    return _LEADING_THE_RE.sub("", str(name or "")).strip()


def score_canonical_name(name: str) -> float:
    """Canonicality score: min(len/50,1) − 2·acronym − 3·contextual-suffix
    − 4·low-quality (reference: name_variants.py:363-393)."""
    name = str(name or "")
    score = min(len(name) / 50.0, 1.0)
    if is_acronym_form(name):
        score -= 2.0
    words = name.lower().split()
    if words and words[-1] in _CONTEXTUAL_SUFFIXES:
        score -= 3.0
    if is_low_quality_name(name):
        score -= 4.0
    return score


def _acronym_derivation_bonus(short: str, long_name: str) -> bool:
    """True when `short` is an acronym form whose letters equal the acronym
    derived from `long_name` (reference: mergers.py:260-268 — the full form
    earns +2.0 over its own acronym)."""
    if not is_acronym_form(short):
        return False
    derived = compute_acronym(long_name)
    return bool(derived) and derived.upper() == str(short).replace(".", "").upper()


def pick_canonical(existing_name: str, incoming_name: str) -> tuple[str, str, bool]:
    """Pairwise canonical-name decision (reference: mergers.py:231-274).

    Returns (canonical, demoted, swapped). Scores both names with
    score_canonical_name, adds +1.0 containment bonus to the more complete
    name and +2.0 full-form-over-derived-acronym bonus; swaps only when the
    incoming score exceeds existing + CANONICAL_SWAP_MARGIN (0.3).
    """
    if str(existing_name).lower() == str(incoming_name).lower():
        return existing_name, incoming_name, False

    existing_score = score_canonical_name(existing_name)
    incoming_score = score_canonical_name(incoming_name)

    if is_name_contained(existing_name, incoming_name):
        incoming_score += 1.0
    elif is_name_contained(incoming_name, existing_name):
        existing_score += 1.0

    if _acronym_derivation_bonus(existing_name, incoming_name):
        incoming_score += 2.0
    if _acronym_derivation_bonus(incoming_name, existing_name):
        existing_score += 2.0

    if incoming_score > existing_score + 0.3:
        return incoming_name, existing_name, True
    return existing_name, incoming_name, False


def cluster_canonical_score(name: str, other_names: list[str]) -> float:
    """Cluster-level generalization of the pairwise pick for the
    connected-components path: base score + 1.0 if this name contains some
    other member (more complete) + 2.0 if some other member is this name's
    derived-acronym form. Deterministic regardless of merge order — this is
    the order-free replacement for the reference's sequential re-keying
    (mergers.py:962-998)."""
    s = score_canonical_name(name)
    contains_other = any(
        o != name and is_name_contained(o, name) for o in other_names
    )
    if contains_other:
        s += 1.0
    full_form_of_member = any(
        o != name and _acronym_derivation_bonus(o, name) for o in other_names
    )
    if full_form_of_member:
        s += 2.0
    return s


# ── vectorized wrappers (pandas Series in/out — the pandas-UDF bodies) ──


def v_normalize_display(s: pd.Series) -> pd.Series:
    return s.map(normalize_display)


def v_normalize_for_match(s: pd.Series) -> pd.Series:
    return s.map(normalize_for_match)


def v_compute_acronym(s: pd.Series) -> pd.Series:
    return s.map(lambda x: compute_acronym(x) or "")


def v_is_acronym_form(s: pd.Series) -> pd.Series:
    return s.map(is_acronym_form).astype(bool)


def v_is_low_quality(s: pd.Series) -> pd.Series:
    return s.map(is_low_quality_name).astype(bool)


def v_score_canonical(s: pd.Series) -> pd.Series:
    return s.map(score_canonical_name).astype(np.float64)
