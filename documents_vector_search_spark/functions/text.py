"""Text tokenization and shingling as pure Column expressions.

The reference tokenizes implicitly through SQLite FTS5's ``unicode61``
tokenizer (reference main/indexes/indexers/sqllite_indexer.py:102-115)
and quotes each query word for a conjunctive match
(sqllite_indexer.py:145-150). We define ONE explicit tokenizer used by
both indexing and querying so the engine and any SQL oracle agree:
lowercase, split on runs of non-alphanumerics, drop empties.

All functions return Column expressions (no UDFs): tokenization of a
100 TB corpus stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex for "not a token character". Kept ASCII-simple deliberately so the
# same pattern means the same thing in Spark (Java regex) and ANSI SQL
# oracles (RE2/PCRE): a run of anything that is not [a-z0-9].
NON_TOKEN_RE = "[^a-z0-9]+"

# Whitespace-run class for word splitting, shared VERBATIM by the Spark
# (Java regex) and DuckDB-oracle (RE2) dialects. Java's \s includes
# U+000B vertical tab while RE2's \s does not, so a bare \s+ gives a
# document containing VT different word counts between engine and
# oracle; the explicit class pins one meaning for both.
WS_RUN_RE = "[ \\t\\n\\r\\f\\x0B]+"


def tokenize(text: Column | str) -> Column:
    """``"The fast, Fast join!"`` → ``["the","fast","fast","join"]``.

    Lowercase → split on non-alphanumeric runs → drop empty strings
    (leading/trailing separators produce empties in both Spark and
    standard SQL regexp_split implementations).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), NON_TOKEN_RE), lambda t: t != F.lit(""))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles of a token array, space-joined.

    ``["a","b","c","d"], n=3`` → ``["a b c", "b c d"]``. Documents with
    fewer than ``n`` tokens produce a single shingle of all their tokens
    (so short docs still participate in dedup rather than vanishing).

    Used by MinHash/Jaccard dedup (SURVEY §7.2 step 12). Pure
    expression: join the tokens once and pull every overlapping n-gram
    out with ONE codegen'd regex (a zero-width token-start anchor whose
    lookahead group captures the next n tokens).

    Why not the obvious ``transform(sequence(...), i ->
    array_join(slice(tokens, i, n)))``: higher-order-function lambdas
    re-evaluate any non-trivial expression they capture once PER
    ELEMENT — ``slice(tokens, ...)`` with an inline ``tokenize(text)``
    argument re-tokenizes the document once per shingle position, which
    measured 4.4s vs 0.4s over the sf0.1 corpus (12x). The regex form
    references ``tokens`` only outside lambdas, so callers may pass the
    tokenize expression inline without staging it first.

    PRECONDITION (exactly what :func:`tokenize` produces): token
    elements contain no spaces and no NULL/empty elements — otherwise
    the space-joined string is not invertible and the regex grouping
    would disagree with position-based slicing.
    """
    joined = F.array_join(tokens, " ")
    # zero-width match at each token start; the lookahead captures that
    # token plus the following n-1 — overlapping n-grams in one pass
    pat = "(?:^|(?<= ))(?=((?:[^ ]+ ){%d}[^ ]+))" % (n - 1)
    return F.when(F.size(tokens) < n, F.array(joined)).otherwise(
        F.regexp_extract_all(joined, F.lit(pat), 1)
    )


# ---------------------------------------------------------------------------
# Unicode normalization for web-text curation
# ---------------------------------------------------------------------------
# ONE definition consumed by the Column builders below AND the DuckDB
# oracle fragments (clean_text_sql / ascii_fold_sql) so the two dialects
# cannot drift. Both engines operate on UTF-8 code points, and
# translate()/regexp_replace() exist with identical 1:1 semantics in
# Spark and DuckDB.

# smart punctuation → ASCII (1:1, translate-able)
PUNCT_SRC = "‘’‚‛“”„–— ­′″"
PUNCT_DST = "''''\"\"\"--  '\""
# 1:N rewrites that translate() cannot express
PUNCT_MULTI = [("…", "..."), ("«", '"'), ("»", '"')]
# C0/C1 control characters except \t and \n (\r normalizes to \n first)
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

# Latin accent folding (1:1). Multi-char folds follow in FOLD_MULTI.
FOLD_SRC = (
    "àáâãäåèéêë"
    "ìíîïòóôõö"
    "ùúûüçñýÿ"
    "ÀÁÂÃÄÅÈÉÊË"
    "ÌÍÎÏÒÓÔÕÖ"
    "ÙÚÛÜÇÑÝ"
)
FOLD_DST = (
    "aaaaaaeeee"
    "iiiiooooo"
    "uuuucnyy"
    "AAAAAAEEEE"
    "IIIIOOOOO"
    "UUUUCNY"
)
FOLD_MULTI = [
    ("ß", "ss"), ("œ", "oe"), ("Œ", "OE"),
    ("æ", "ae"), ("Æ", "AE"), ("ø", "o"), ("Ø", "O"),
]


def clean_text(text: Column | str) -> Column:
    """Web-text cleanup as ONE codegen'd expression: CRLF/CR → LF,
    smart quotes/dashes/nbsp/ellipsis → ASCII, C0/C1 control chars
    stripped, space/tab runs collapsed to one space, spaces trimmed
    around newlines and at the ends. Idempotent."""
    col = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(col, "\\r\\n?", "\n")
    out = F.translate(out, PUNCT_SRC, PUNCT_DST)
    for src, dst in PUNCT_MULTI:
        out = F.regexp_replace(out, src, dst)
    out = F.regexp_replace(out, CONTROL_RE, "")
    out = F.regexp_replace(out, "[ \\t]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    return F.btrim(out)


def ascii_fold(text: Column | str) -> Column:
    """Fold common Latin accents/ligatures to ASCII (à→a, ß→ss, œ→oe)
    — the deterministic, auditable subset of NFKD+strip that covers
    the bulk of Western-European web text. Characters outside the
    mapping pass through unchanged (folding is NOT transliteration)."""
    col = F.col(text) if isinstance(text, str) else text
    out = F.translate(col, FOLD_SRC, FOLD_DST)
    for src, dst in FOLD_MULTI:
        out = F.regexp_replace(out, src, dst)
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_text` (oracle builder)."""
    out = f"regexp_replace({expr}, '\\r\\n?', chr(10), 'g')"
    out = f"translate({out}, {_sql_quote(PUNCT_SRC)}, {_sql_quote(PUNCT_DST)})"
    for src, dst in PUNCT_MULTI:
        out = f"replace({out}, {_sql_quote(src)}, {_sql_quote(dst)})"
    out = f"regexp_replace({out}, '{CONTROL_RE}', '', 'g')"
    out = f"regexp_replace({out}, '[ \\t]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    return f"trim({out})"


def ascii_fold_sql(expr: str) -> str:
    """DuckDB twin of :func:`ascii_fold` (oracle builder)."""
    out = f"translate({expr}, {_sql_quote(FOLD_SRC)}, {_sql_quote(FOLD_DST)})"
    for src, dst in FOLD_MULTI:
        out = f"replace({out}, {_sql_quote(src)}, {_sql_quote(dst)})"
    return out
