"""Language identification stage.

The reference does not trust crawl-supplied metadata: it recomputes
spatial WCS from first principles instead of using the noisy header
values (/root/reference/gemProc2caom2/main_app.py:374-403). The web
analog: re-derive ``lang`` from the extracted text rather than trusting
the crawl's ``lang`` column.

Production deployment would load a fastText model per executor
(module-level lazy singleton, the per-process client-init analog of
composable.py:111-113); that import is gated. The always-available
implementation is a deterministic stopword/charset profile classifier
built from pure Column expressions, so the whole stage is JVM-side and
SQL-oracle-replicable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Distinctive high-frequency function words per language. Deliberately
# disjoint sets so scoring is unambiguous and replicable in ANSI SQL.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "les", "des", "est", "une", "dans", "que", "pour"],
    # ASCII-edge words only: \b at a non-ASCII boundary char diverges
    # between Java (ASCII \b), RE2 and Python-unicode regex engines
    "es": ["los", "las", "por", "una", "para", "con", "del", "esta"],
}
# CJK: classify by character range, not stopwords.
CJK_RE = r"[一-鿿]"


def _profile_score(text_lc: Column, stopwords: list[str]) -> Column:
    """Count of profile-word occurrences (word-boundary matches).
    regexp_count, NOT size(regexp_extract_all): counting must not
    materialize a match array per document."""
    pattern = r"\b(?:" + "|".join(stopwords) + r")\b"
    return F.regexp_count(text_lc, F.lit(pattern))


def langid_expr(text: Column | str, min_hits: int = 2) -> Column:
    """Predicted language code: argmax of profile scores.

    Shape note (r4): a single-scan variant — one regexp_extract_all of
    the 32-word+CJK union pattern, matches re-joined into a tiny hits
    string, per-profile counts over that — was measured 44% SLOWER than
    these five regexp_count scans at the 2 KB prefix (per-match string
    allocation dominates; the decode traffic it saves is only 2 KB x 4).
    Kept as scripts/kernel_ab.py for re-measurement if LANGID_CAP grows.

    Ties break by fixed profile order (deterministic). Docs where no
    profile reaches ``min_hits`` and no CJK chars appear -> 'und'
    (undetermined), the null-guard branch.

    The argmax is array_max over (score, -profile_idx, lang) structs:
    each score expression appears exactly ONCE in the plan. (A chained
    when/otherwise running-max nests the previous chain into both
    branches — expression size doubles per language and Catalyst
    re-evaluates every regex 2^k times. Measured 16x slowdown.)
    """
    t = F.col(text) if isinstance(text, str) else text
    t_lc = F.lower(F.coalesce(t, F.lit("")))
    cjk_hits = F.regexp_count(t_lc, F.lit(CJK_RE))
    scores = F.array(
        *[
            F.struct(
                _profile_score(t_lc, sw).alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("l"),
            )
            for i, (lang, sw) in enumerate(LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scores)  # ties: larger -idx == earlier profile
    best_lang = F.when(best.getField("s") >= min_hits, best.getField("l")).otherwise(
        F.lit("und")
    )
    # CJK dominates when present in volume (stopword profiles can't see it)
    return F.when(cjk_hits >= 5, F.lit("zh")).otherwise(best_lang)


def langid_sql(text_expr: str, min_hits: int = 2) -> str:
    """DuckDB/ANSI rendering of langid_expr for oracle comparison."""
    def score(sw: list[str]) -> str:
        pat = r"\b(?:" + "|".join(sw) + r")\b"
        return f"length(regexp_extract_all(lower(coalesce({text_expr}, '')), '{pat}'))"

    # build the same strictly-greater argmax chain
    langs = list(LANG_PROFILES.items())
    expr_lang = "'und'"
    expr_score = str(min_hits - 1)
    for lang, sw in langs:
        s = score(sw)
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    # literal CJK range: DuckDB's RE2 has no \uXXXX escapes
    cjk = f"length(regexp_extract_all(lower(coalesce({text_expr}, '')), '{CJK_RE}'))"
    return f"CASE WHEN {cjk} >= 5 THEN 'zh' ELSE {expr_lang} END"


def try_fasttext_udf(model_path: str):
    """Scale-path langid: fastText via Arrow-batched pandas UDF with a
    per-executor model singleton. Gated: the lib is not in this image.
    """
    try:
        import fasttext  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "fasttext not available in this environment; use langid_expr()"
        ) from exc

    import pandas as pd  # pragma: no cover

    _model = {}

    @F.pandas_udf("string")  # pragma: no cover
    def _predict(texts: pd.Series) -> pd.Series:
        if "m" not in _model:
            _model["m"] = fasttext.load_model(model_path)
        m = _model["m"]
        labels = [
            m.predict(t.replace("\n", " "))[0][0].removeprefix("__label__")
            if t
            else "und"
            for t in texts.fillna("")
        ]
        return pd.Series(labels)

    return _predict  # pragma: no cover
