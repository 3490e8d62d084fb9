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

    Used by MinHash/Jaccard dedup (SURVEY §7.2 step 12). Pure expression:
    ``transform(sequence(...), i -> array_join(slice(tokens, i, n)))``.
    """
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)  # slice() is 1-based
    return F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))
