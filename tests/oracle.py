"""Pure-Python mirror of the pipeline semantics — the golden oracle.

Plays the role of the reference's golden XML fixtures
(/root/reference/gemProc2caom2/tests/test_main_app.py:171-186): an
independent implementation of every rule, used to GENERATE
tests/data/expected_verdicts.json once (gen_goldens.py) and to check
the Spark pipeline against it. Not imported by engine code.

Parity rules discovered empirically (must hold or goldens diverge):
- Spark F.trim strips ONLY spaces               -> str.strip(" ")
- Spark F.length counts code points             -> len(str)
- Java regex \\w/\\s/\\b are ASCII               -> re.ASCII flag
- Java regexp counts per code point (emoji = 1) -> Python default
"""

from __future__ import annotations

import math
import re

from gemproc2caom2_spark.functions.langid import CJK_RE, LANG_PROFILES
from gemproc2caom2_spark.functions.perplexity import perplexity_of
from gemproc2caom2_spark.functions.scrub import scrub_python
from gemproc2caom2_spark.functions.text import BPEISH_TOKEN_RE, SYMBOL_RE
from gemproc2caom2_spark.operators.extract import extract_text_scalar
from gemproc2caom2_spark.operators.heuristics import RuleConfig, DEFAULT_RULES

_SYMBOL = re.compile(SYMBOL_RE, re.ASCII)
_BPEISH = re.compile(BPEISH_TOKEN_RE, re.ASCII)
_RARE = re.compile(r"[^a-z \.,;:!?'\n-]")
_WS_SPLIT = re.compile(r"\s+", re.ASCII)
_CJK = re.compile(CJK_RE)


def words(text: str) -> list[str]:
    t = text.strip(" ")
    if t == "":
        return []
    return _WS_SPLIT.split(t)


def lines(text: str) -> list[str]:
    return [l.strip(" ") for l in text.split("\n") if l.strip(" ") != ""]


def quality(text: str | None) -> dict:
    from gemproc2caom2_spark.operators.heuristics import ANALYSIS_CAP

    if text is None:
        return dict(doc_len=None, n_words=None, mean_line_len=None,
                    symbol_ratio=None, repeated_line_frac=None,
                    rare_char_ratio=None)
    full_len = len(text)
    text = text[:ANALYSIS_CAP]  # ratio metrics are capped (heuristics.py)
    n = len(text)
    ls = lines(text)
    return dict(
        doc_len=full_len,
        n_words=len(words(text)),
        mean_line_len=(sum(len(l) for l in ls) / len(ls)) if ls else None,
        symbol_ratio=(len(_SYMBOL.findall(text)) / n) if n else None,
        repeated_line_frac=(1.0 - len(set(ls)) / len(ls)) if ls else None,
        rare_char_ratio=(len(_RARE.findall(text.lower())) / n) if n else None,
    )


def langid(text: str | None, min_hits: int = 2) -> str:
    t = (text or "").lower()
    if len(_CJK.findall(t)) >= 5:
        return "zh"
    best_lang, best_score = "und", min_hits - 1
    for lang, sw in LANG_PROFILES.items():
        pat = re.compile(r"\b(?:" + "|".join(sw) + r")\b", re.ASCII)
        score = len(pat.findall(t))
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def verdict(text: str | None, rules: RuleConfig = DEFAULT_RULES) -> dict:
    """Full per-document verdict EXCEPT the corpus-level duplicate flag
    (dedup needs the whole corpus; tested separately)."""
    from gemproc2caom2_spark.operators.heuristics import LANGID_CAP

    q = quality(text)
    lang = langid(text[:LANGID_CAP] if text is not None else None)
    ppl = None
    reason = None
    if text is None or len(text) == 0:
        reason = "empty"
    elif q["doc_len"] < rules.min_doc_len:
        reason = "min_length"
    elif q["doc_len"] > rules.max_doc_len:
        reason = "max_length"
    elif q["n_words"] < rules.min_words:
        reason = "min_words"
    elif any(m in text[:16384].lower() for m in rules.placeholder_markers):
        reason = "placeholder"
    elif lang not in rules.target_langs:
        reason = "langid"
    elif q["symbol_ratio"] is not None and q["symbol_ratio"] > rules.max_symbol_ratio:
        reason = "symbol_ratio"
    elif q["rare_char_ratio"] is not None and q["rare_char_ratio"] > rules.max_rare_char_ratio:
        reason = "rare_chars"
    elif (q["repeated_line_frac"] is not None
          and q["repeated_line_frac"] > rules.max_repeated_line_frac):
        reason = "repeated_lines"
    else:
        ppl = perplexity_of(text)
        ppl = round(ppl, 6) if ppl is not None else None
        if ppl is not None and ppl > rules.max_perplexity:
            reason = "perplexity"
    # scrub is emitted only for docs passing the cheap Column-expr gates
    # (pipeline gates it the same way; ppl-dropped docs still pass cheap)
    scrub_eligible = reason is None or reason == "perplexity"
    return dict(
        lang_pred=lang,
        quality=q,
        perplexity=ppl,
        scrubbed_text=scrub_python(text) if scrub_eligible else None,
        drop_reason_pre_dedup=reason,
    )


def process_document(html: bytes | None, text: str | None,
                     rules: RuleConfig = DEFAULT_RULES) -> dict:
    extracted = text if text is not None else extract_text_scalar(html)
    out = verdict(extracted, rules)
    out["text_extracted"] = extracted
    return out


# ---------------------------------------------------------------------------
# BPE merge training — independent mirror of operators/bpe.py
# ---------------------------------------------------------------------------

BPE_EOW = "</w>"


def bpe_merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge (Sennrich semantics)."""
    out: list[str] = []
    prev: str | None = None
    for s in syms:
        if prev == left and s == right:
            out.append(left + right)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def bpe_train_python(
    word_freq: dict[str, int],
    num_merges: int = 50,
    min_pair_freq: int = 2,
) -> list[tuple[int, str, str, int]]:
    """BPE merge list from a word-frequency table: each round the most
    frequent adjacent pair wins (ties: freq desc, left asc, right asc).
    Must stay behavior-identical to operators.bpe.train_bpe — it is the
    independent implementation the fixture oracle pins."""
    vocab: list[tuple[list[str], int]] = []
    for w, f in word_freq.items():
        syms = list(w)
        if syms:
            syms[-1] = syms[-1] + BPE_EOW
            vocab.append((syms, f))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), pf = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if pf < min_pair_freq:
            break
        merges.append((rank, l, r, pf))
        vocab = [(bpe_merge_word(s, l, r), f) for s, f in vocab]
    return merges


def bpe_encode_python(
    text: str | None, merges: list[tuple[int, str, str, int]]
) -> list[str] | None:
    """Greedy BPE inference mirror: per word, repeatedly apply the
    LOWEST-rank applicable merge (leftmost occurrence on rank ties)
    until none applies — independent of operators.bpe.encode_bpe."""
    if text is None:
        return None
    rank: dict[tuple[str, str], int] = {
        (l, r): k for (k, l, r, _f) in merges
    }
    toks: list[str] = []
    for w in text.strip(" ").lower().split():
        syms = list(w)
        syms[-1] += BPE_EOW
        while True:
            choice = None
            for i in range(len(syms) - 1):
                k = rank.get((syms[i], syms[i + 1]))
                if k is not None and (choice is None or k < choice[0]):
                    choice = (k, i)
            if choice is None:
                break
            i = choice[1]
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
        toks.extend(syms)
    return toks


def bpe_word_freq_python(texts: list[str | None]) -> dict[str, int]:
    """Word frequencies with the engine's tokenization (trim spaces,
    lower, whitespace split)."""
    wf: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        t = t.strip(" ").lower()
        if t == "":
            continue
        for w in _WS_SPLIT.split(t):
            if w != "":
                wf[w] = wf.get(w, 0) + 1
    return wf
