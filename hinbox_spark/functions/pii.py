"""PII detection and redaction over text columns — pure JVM column
expressions (zero UDFs), the standard scrub pass a web-text training
pipeline runs before anything else touches the corpus.

The reference pipeline ingests raw web pages but never scrubs them (no
counterpart in /root/reference); this module is part of the
training-data-pipeline operator family the engine adds on top. At
100 TB the scrub must be a single narrow map over the text column —
every function here compiles to `regexp_replace` / `regexp_extract_all`
inside whole-stage codegen, so the pass is scan-speed and shuffles
nothing.

Pattern discipline: every regex is RE2-compatible (no backreferences,
no lookaround) so the SAME pattern string runs identically under
Spark's Java regex, DuckDB's RE2 (the driver oracle), and Python `re`
(the unit tests) — the oracle contract depends on engine-identical
match semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Order matters for redaction: emails first (an email contains no phone/
# IP match, but scrubbing IP-like digit runs first could split an email
# across a replacement token and hide it from the email pattern).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local-part per RFC-5321 common subset; TLD ≥ 2 alpha chars.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # NANP-style 3-3-4 with - or . separators (the dominant shape in
    # crawled English text); \b keeps 16-digit card numbers out.
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    # dotted-quad IPv4; octet-range validation is left to consumers —
    # at scrub time over-redaction of 999.1.2.3 is the safe direction.
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of `kind` PII matches in `col` (JVM regexp_extract_all)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact_pii(col: Column) -> Column:
    """All PII kinds replaced by their typed tokens, in declaration
    order. Chained regexp_replace stays one codegen'd projection."""
    out = col
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out
