"""Text canonicalization for caption/document dedup — pure Catalyst.

Web-scale caption dedup wants a *normalized* exact key before any
probabilistic lane: case, punctuation, accent decoration and whitespace
jitter account for a large slice of real crawl duplicates ("Café Noir!"
vs "cafe noir"), and an exact groupBy on the canonical form removes
them for one shuffle — far cheaper than letting them flow into
MinHash/LSH. This module provides the canonical-form EXPRESSION (a
single Catalyst column: lower → accent translate → punctuation strip →
whitespace collapse, whole-stage-codegen friendly, no UDF) and the
one-shuffle dedup-stats operator over it.

The accent map covers Latin-1 Supplement + Latin Extended-A (the
accented forms that dominate European-language crawls) as an explicit
``translate`` table — deterministic and identical in any engine with a
per-codepoint translate (DuckDB mirrors it verbatim in the oracle;
``sql_normalized_text`` emits that dialect from the same constants, so
the two sides cannot drift). Full Unicode NFKC folding is a documented
non-goal of the JVM-side path: it would need a Python UDF in the hot
path; callers who need it can NFKC-preprocess at ingest.

Reference: apache/datasketches-cpp has no text layer; this extends the
engine's curation surface (operators/curation.py, textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Latin-1 Supplement + Latin Extended-A fold pairs, one codepoint each.
ACCENT_SRC = (
    "àáâãäåāăąçćĉċčďđèéêëēĕėęěĝğġģĥħìíîïĩīĭįıĵķĺļľŀłñńņňòóôõöøōŏő"
    "ŕŗřśŝşšţťŧùúûüũūŭůűųŵýÿŷźżžß"
)
# (translate is strictly 1:1 per codepoint, so ß folds to 's', not 'ss')
ACCENT_DST = (
    "aaaaaaaaacccccddeeeeeeeeegggghhiiiiiiiiijklllllnnnnooooooooo"
    "rrrsssstttuuuuuuuuuuwyyyzzzs"
)
assert len(ACCENT_SRC) == len(ACCENT_DST)

# keep letters/digits/space; RE2 and Java regex agree on \p{L}\p{N}
_PUNCT_RE = r"[^\p{L}\p{N} ]"


def normalized_text(col: Column | str) -> Column:
    """Canonical form: lowercase, accents folded (translate table above),
    punctuation → space, whitespace collapsed, trimmed. One codegen
    expression — no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.translate(c, ACCENT_SRC, ACCENT_DST)
    c = F.regexp_replace(c, _PUNCT_RE, " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def sql_normalized_text(expr: str) -> str:
    """The SAME canonicalization in ANSI/DuckDB SQL, emitted from the
    same constants — the oracle twin of normalized_text()."""
    return (
        "trim(regexp_replace(regexp_replace(translate(lower({e}), "
        "'{src}', '{dst}'), '{punct}', ' ', 'g'), ' +', ' ', 'g'))"
    ).format(e=expr, src=ACCENT_SRC, dst=ACCENT_DST, punct=_PUNCT_RE)


def canonical_dedup_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Normalized-exact dedup in ONE shuffle: groupBy(canonical form) →
    (canonical_id = min id, n_copies). Map-side partial aggregation
    applies (count/min are partial-able), so at 100 TB the exchange
    carries one row per distinct canonical text per map partition, not
    one per document."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            normalized_text(text_col).alias("_norm"),
        )
        .groupBy("_norm")
        .agg(
            F.min("_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies", F.length("_norm").alias("norm_len"))
    )
