"""PII / toxicity scrubbing — byte-identical canonicalization.

Analog of the reference's data-label repair: a deterministic
string-canonicalization kernel whose exact output is pinned by tests
(repair_data_label, pinned at
/root/reference/gemProc2caom2/tests/test_storage_name.py:141-157).

The scrub is a fixed, ordered chain of regex replacements. Order
matters (emails before phones: an email's digits must not be half-eaten
by the phone rule), mirroring the reference's strict visitor ordering
(composable.py:94-97). Implemented as Spark ``regexp_replace`` Column
expressions — fully JVM-side, whole-stage-codegen'd, and renderable as
ANSI SQL for the DuckDB oracle. Regex syntax is restricted to the
RE2 ∩ Java common subset so both engines match byte-identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# toxicity placeholder lexicon — single source of truth for BOTH the
# profanity pattern and scrub_expr's byte-level gate (a divergence would
# silently skip the pass for words only one of them knows)
_PROFANITY_WORDS = ("damn", "hell", "crap", "frigging")

# (name, pattern, replacement) — applied strictly in order.
SCRUB_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        # +1-555-123-4567, (555) 123-4567, 555 123 4567, 5551234567 (10+)
        "phone",
        r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<ID>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "profanity",
        r"\b(?:" + "|".join(_PROFANITY_WORDS) + r")\b",
        "<TOX>",
    ),
]


def scrub_expr(text: Column | str) -> Column:
    """Apply the scrub chain; null text stays null.

    Each pass (group) is gated on a cheap byte-level NO-OP detector over
    the ORIGINAL text, so a clean document pays a couple of byte scans
    instead of five regexp_replace passes (each of which, in Spark's
    RegExpReplace, is a full UTF-8→UTF-16 decode + regex scan + rebuild
    even when nothing matches — the dominant memory traffic of this
    stage). A pass is skipped ONLY when its pattern provably cannot
    match, so output stays byte-identical to the ungated chain:

    - email requires '@'; phone/ssn/ipv4 each require a digit; the
      profanity pass requires one of its words as a substring;
    - gating on the ORIGINAL text is sound because no replacement token
      (<EMAIL>/<PHONE>/<ID>/<IP>/<TOX>) contains '@', a digit, or a
      profanity word, and no token can complete one across a splice
      boundary (tokens are uppercase and '<'/'>'-delimited; the gated
      patterns are lowercase/digit-only).

    Only ONE branch of each F.when evaluates per row, so the nesting
    costs nothing at runtime; the DuckDB oracle (scrub_sql) keeps the
    plain five-pass nest — identical results, pinned byte-identical by
    the tx5/cur3 oracle checks and the golden fixtures.
    """
    c = F.col(text) if isinstance(text, str) else text
    rules = {name: (pat, repl) for name, pat, repl in SCRUB_RULES}

    def rr(col: Column, name: str) -> Column:
        pat, repl = rules[name]
        return F.regexp_replace(col, pat, repl)

    prof_gate = F.lit(False)
    for w in _PROFANITY_WORDS:
        prof_gate = prof_gate | c.contains(w)

    t = F.when(c.contains("@"), rr(c, "email")).otherwise(c)
    digit_chain = rr(rr(rr(t, "phone"), "ssn"), "ipv4")
    t = F.when(c.rlike("[0-9]"), digit_chain).otherwise(t)
    return F.when(prof_gate, rr(t, "profanity")).otherwise(t)


def scrub_expr_ungated(text: Column | str) -> Column:
    """The plain five-pass chain (reference semantics; used by the
    parity tests to pin scrub_expr's gating as a pure optimization)."""
    c = F.col(text) if isinstance(text, str) else text
    for _name, pat, repl in SCRUB_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_sql(text_expr: str) -> str:
    """Identical chain rendered as nested ANSI/DuckDB regexp_replace.

    DuckDB replaces only the first match unless the 'g' flag is given.
    """
    e = text_expr
    for _name, pat, repl in SCRUB_RULES:
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{repl}', 'g')"
    return e


def scrub_python(text: str | None) -> str | None:
    """Driver-side scalar reference (golden-fixture generation only)."""
    import re

    if text is None:
        return None
    for _name, pat, repl in SCRUB_RULES:
        text = re.sub(pat, repl, text)
    return text
