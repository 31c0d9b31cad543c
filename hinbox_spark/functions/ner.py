"""Deterministic typed mention detection (the LLM-extraction replacement).

The reference extracts people/organizations/locations/events per article via
structured LLM calls (/root/reference/src/engine/extractors.py:54-117,
src/utils/extraction.py:162-274) constrained by domain category YAML. The
deterministic stand-in is a gazetteer + capitalized-span heuristic NER built
from the same domain config shape (mirrors the prompt rules at
configs/guantanamo/prompts/*.md): pure Python per document, invoked from a
vectorized pandas UDF so batches move over Arrow.

Output mirrors the reference's dynamic Pydantic mention schemas
(src/dynamic_models.py:41-185): people{name,type,tags},
organizations/locations{name,type}, events{title,description,event_type,
start_date,end_date,is_fuzzy_date,tags}.
"""

from __future__ import annotations

import re

from hinbox_spark.functions.names import normalize_for_match

# ── domain gazetteer (deterministic stand-in for the domain category YAML) ──

ORG_SUFFIXES = (
    "department", "agency", "bureau", "union", "committee", "commission",
    "command", "force", "enforcement", "administration", "council",
    "nations", "cross", "office", "service", "corps",
)
LOC_SUFFIXES = ("bay", "sea", "airfield", "base", "island", "city", "harbor")
LOC_PREFIXES = ("camp", "fort", "naval station")

EVENT_TYPE_BY_HEAD = {
    "hearing": "hearing",
    "arraignment": "hearing",
    "trial": "hearing",
    "transfer": "transfer",
    "release": "transfer",
    "protest": "protest",
    "strike": "protest",
    "announcement": "announcement",
    "ruling": "ruling",
    "decision": "ruling",
    "attack": "attack",
}

# words that start sentences / boilerplate but are never entity heads
_SPAN_STOPLIST = frozenset(
    w.lower()
    for w in (
        "The", "A", "An", "This", "That", "These", "Those", "It", "He", "She",
        "They", "We", "During", "After", "Before", "Officials", "Lawyers",
        "Reporters", "Several", "No", "Home", "Sections", "Report", "Page",
        "Index", "Advertisement", "However", "Meanwhile", "According",
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
        "Sunday", "January", "February", "March", "April", "May", "June",
        "July", "August", "September", "October", "November", "December",
    )
)

_CONNECTORS = frozenset(("of", "and", "the", "for"))

_LOC_CONTEXT = frozenset(("in", "at", "near", "outside", "visited", "from", "to"))

# token: capitalized word (incl. hyphenated/apostrophe), dotted acronym, or
# all-caps token possibly with inner hyphen (JTF-GTMO)
_TOKEN_RE = re.compile(r"[A-Za-z][\w.'\-]*|\d{4}-\d{2}-\d{2}|[^\sA-Za-z0-9]")

_EVENT_RE = re.compile(
    r"\b(?:[Tt]he\s+)([A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*)*)\s+(?:began\s+)?on\s+(\d{4}-\d{2}-\d{2})"
)

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+|\n+")


def _is_cap_token(tok: str) -> bool:
    if not tok or not tok[0].isalpha():
        return False
    if tok[0].isupper():
        return True
    return False


_DOTTED_ACRONYM_RE = re.compile(r"(?:[A-Za-z]\.)+")


def _strip_sentence_dot(tok: str) -> str:
    """Remove a sentence-final period — but keep dotted acronyms (U.S.)."""
    if tok.endswith(".") and not _DOTTED_ACRONYM_RE.fullmatch(tok):
        return tok.rstrip(".")
    return tok


def _clean_span(tokens: list[str]) -> list[str]:
    """Strip leading/trailing connectors and stoplist words."""
    tokens = [_strip_sentence_dot(t) for t in tokens]
    while tokens and (
        tokens[0].lower() in _CONNECTORS or tokens[0].lower() in _SPAN_STOPLIST
    ):
        tokens = tokens[1:]
    while tokens and tokens[-1].lower() in _CONNECTORS:
        tokens = tokens[:-1]
    return tokens


class Gazetteer:
    """Surface-form → (entity_type, type_attr) lookup built from domain
    config (equivalence groups + curated entries), keyed on
    normalize_for_match."""

    def __init__(
        self,
        org_entries: dict[str, str] | None = None,
        loc_entries: dict[str, str] | None = None,
        people_entries: list[str] | None = None,
        equivalence_groups: dict[str, list[list[str]]] | None = None,
    ):
        self.lookup: dict[str, tuple[str, str]] = {}
        groups = equivalence_groups or {}
        for etype, entries in (("organizations", org_entries or {}),
                               ("locations", loc_entries or {})):
            for surface, attr in entries.items():
                self.lookup[normalize_for_match(surface)] = (etype, attr)
        # equivalence-group members inherit the type of any curated member
        for etype in ("organizations", "locations"):
            for group in groups.get(etype, []):
                attr = ""
                for m in group:
                    hit = self.lookup.get(normalize_for_match(m))
                    if hit:
                        attr = hit[1]
                        break
                for m in group:
                    self.lookup.setdefault(normalize_for_match(m), (etype, attr or "unknown"))
        for p in people_entries or []:
            self.lookup[normalize_for_match(p)] = ("people", "person")

    def get(self, surface: str) -> tuple[str, str] | None:
        return self.lookup.get(normalize_for_match(surface))


def default_gazetteer() -> Gazetteer:
    """Gazetteer from the default domain config (curated entities +
    equivalence groups) — the deterministic analog of loading
    configs/{domain}/categories/*.yaml."""
    from hinbox_spark.config import (
        DEFAULT_EQUIVALENCE_GROUPS, DOMAIN_LOCS, DOMAIN_ORGS, DOMAIN_PEOPLE,
    )

    return Gazetteer(
        org_entries={v: t for _, (t, vs) in DOMAIN_ORGS.items() for v in vs},
        loc_entries={v: t for _, (t, vs) in DOMAIN_LOCS.items() for v in vs},
        people_entries=list(DOMAIN_PEOPLE),
        equivalence_groups=DEFAULT_EQUIVALENCE_GROUPS,
    )


def _classify_span(
    span: list[str], prev_tok: str, gaz: Gazetteer
) -> tuple[str, str] | None:
    """Return (entity_type, type_attr) for a capitalized span, or None."""
    surface = " ".join(span)
    hit = gaz.get(surface)
    if hit:
        return hit

    low_last = span[-1].lower().strip(".")
    low_first = span[0].lower().strip(".")

    if low_last in ORG_SUFFIXES:
        return ("organizations", "unknown")
    if low_last in LOC_SUFFIXES or low_first in LOC_PREFIXES:
        return ("locations", "unknown")

    # person pattern: 2-4 capitalized words, none an org/loc suffix,
    # each starting uppercase (allows Al-Qahtani, O'Neill)
    if 2 <= len(span) <= 4 and all(t[0].isupper() for t in span):
        return ("people", "person")

    # single capitalized token after a location preposition → location
    if len(span) == 1 and prev_tok.lower() in _LOC_CONTEXT:
        return ("locations", "unknown")

    return None


def extract_mentions_from_text(
    text: str, gaz: Gazetteer
) -> list[dict]:
    """One document → typed mention dicts (the flatMap body, X1/X2)."""
    mentions: list[dict] = []
    if not text:
        return mentions

    for sentence in _SENT_SPLIT_RE.split(text):
        if not sentence.strip():
            continue

        # events first (they anchor on the date pattern)
        for m in _EVENT_RE.finditer(sentence):
            title, date = m.group(1), m.group(2)
            head = title.split()[-1].lower()
            etype = EVENT_TYPE_BY_HEAD.get(head, "other")
            mentions.append(
                {
                    "entity_type": "events",
                    "name": title,
                    "type": etype,
                    "description": sentence.strip(),
                    "start_date": date,
                    "end_date": "",
                    "is_fuzzy_date": False,
                }
            )

        toks = _TOKEN_RE.findall(sentence)
        event_titles = {m.group(1) for m in _EVENT_RE.finditer(sentence)}

        i = 0
        sentence_start = True
        while i < len(toks):
            tok = toks[i]
            if _is_cap_token(tok):
                span = [tok]
                j = i + 1
                while j < len(toks):
                    nxt = toks[j]
                    if _is_cap_token(nxt):
                        span.append(nxt)
                        j += 1
                    elif nxt.lower() in _CONNECTORS:
                        # consume a run of 1-2 connectors ("of", "of the")
                        # only when a capitalized token follows
                        k = j
                        run = []
                        while (
                            k < len(toks)
                            and toks[k].lower() in _CONNECTORS
                            and len(run) < 2
                        ):
                            run.append(toks[k])
                            k += 1
                        if k < len(toks) and _is_cap_token(toks[k]):
                            span.extend(run)
                            span.append(toks[k])
                            j = k + 1
                        else:
                            break
                    else:
                        break
                prev_tok = toks[i - 1] if i > 0 else ""
                cleaned = _clean_span(span)
                # drop sentence-initial lone stoplisted/common words
                if cleaned and not (
                    sentence_start
                    and len(cleaned) == 1
                    and gaz.get(" ".join(cleaned)) is None
                ):
                    surface = " ".join(cleaned)
                    if surface not in event_titles:
                        cls = _classify_span(cleaned, prev_tok, gaz)
                        if cls:
                            etype, attr = cls
                            mentions.append(
                                {
                                    "entity_type": etype,
                                    "name": surface,
                                    "type": attr,
                                    "description": "",
                                    "start_date": "",
                                    "end_date": "",
                                    "is_fuzzy_date": False,
                                }
                            )
                i = j
                sentence_start = False
            else:
                if tok not in (",", ";", ":", '"', "'"):
                    sentence_start = False
                i += 1

    return mentions
