"""Text analysis operators (language-ID, quality scoring, token counts,
fingerprinting) — training-data-pipeline extensions.

Everything is JVM-side column math over strings (split / aggregate /
length arithmetic) — no Python in the hot path, and every measure is
integer-valued or an exact ratio of integers, so DuckDB oracles match
bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import M31, word_hash_expr

# tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
}


def _count_token(text_col: str, token: str) -> Column:
    """# of whitespace tokens equal to `token` — exact token-equality
    count over the split (the earlier padded-replace arithmetic
    undercounted ADJACENT occurrences because the non-overlapping
    replace consumed the shared separating space: 'the the' counted 1)."""
    return F.expr(
        f"cast(size(filter(split({text_col}, ' '), t -> t = '{token}')) as bigint)"
    )


def token_stats(df: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_uniq_tokens, avg_token_len_x100):
    whitespace tokenization; avg token length kept as an exact integer
    ratio x100 (floor) to stay engine-exact."""
    toks = F.expr(f"filter(split({text}, ' '), t -> t != '')")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.expr(
            f"cast(100 * aggregate(filter(split({text}, ' '), t -> t != ''), 0L, "
            f"(a, t) -> a + length(t)) / greatest(size(filter(split({text}, ' '), "
            f"t -> t != '')), 1) as bigint)"
        ).alias("avg_token_len_x100"),
    )


def quality_score(df: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Integer quality features + a simple accept flag:
    stop_hits (count of english stopword markers), uniq_ratio_pct
    (distinct/total tokens), accepted = length in [50, 5000] AND
    stop_hits >= 1 AND uniq_ratio_pct >= 20 — the length/stopword/
    repetition filter family used in web-corpus cleaning."""
    toks = F.expr(f"filter(split({text}, ' '), t -> t != '')")
    stop_hits = sum(
        (_count_token(text, t) for t in LANG_MARKERS["en"]), F.lit(0)
    )
    n_tok = F.size(toks)
    uniq_pct = (F.lit(100) * F.size(F.array_distinct(toks))
                / F.greatest(n_tok, F.lit(1))).cast("bigint")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text).alias("n_chars"),
        n_tok.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        uniq_pct.alias("uniq_ratio_pct"),
        (
            F.length(text).between(50, 5000)
            & (stop_hits >= 1)
            & (uniq_pct >= 20)
        ).alias("accepted"),
    )


def lang_id(df: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts, ties broken by fixed language order, 'und' if all zero."""
    hits = {
        lang: sum((_count_token(text, t) for t in toks), F.lit(0))
        for lang, toks in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in langs:  # strict > means the earlier language wins ties
        best = F.when(hits[lang] > best_n, F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, hits[lang])
    return df.select(
        F.col(id_col).alias("id"),
        *[hits[lang].alias(f"hits_{lang}") for lang in langs],
        best.alias("pred_lang"),
    )


# no backslash classes: Spark SQL and DuckDB string literals disagree
# on backslash handling; space/tab spelled literally keeps the pattern
# byte-identical in both engines
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \t]"


def token_count_bpe(df: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """BPE-ish token counting: alphabetic runs, single digits, and
    punctuation marks each count as one token (the GPT-style
    pre-tokenizer shape: letter runs merge, digits split, punctuation
    separates). ASCII-only regex so Java regex and RE2 agree. Returns
    (id, n_tokens_ws, n_tokens_bpe, bpe_to_ws_x100)."""
    ws = F.size(F.expr(f"filter(split({text}, ' '), t -> t != '')"))
    bpe = F.size(F.expr(f"regexp_extract_all({text}, '{BPE_ISH_PATTERN}', 0)"))
    return df.select(
        F.col(id_col).alias("id"),
        ws.alias("n_tokens_ws"),
        bpe.alias("n_tokens_bpe"),
        (F.lit(100) * bpe / F.greatest(ws, F.lit(1))).cast("bigint").alias("bpe_to_ws_x100"),
    )


def doc_fingerprint(df: DataFrame, *, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Rolling polynomial fingerprint of the whole text (31x + c mod
    2^31) — the content-hash used for exact dedup keys and shard-stable
    sampling. Pure JVM fold; identical in the SQL oracle."""
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"aggregate(split({text}, ''), 0L, (h, ch) -> (h * 31 + ascii(ch)) % {M31})"
        ).alias("fp"),
    )
