"""Text tokenization / counting column helpers (JVM-side only).

The tokenization contract is shared with the DuckDB oracles, so regexes here
must behave identically under Java's and DuckDB's (RE2-ish) regex engines —
stick to character classes, `+`, and alternation; no lookarounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# "BPE-ish" lexer: runs of letters, runs of digits, or single non-space
# symbols. A crude but deterministic stand-in for subword token counting.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Whitespace-delimited word tokens.
WS_PATTERN = "\\s+"


def ws_tokens(col: Column | str) -> Column:
    """Array of whitespace-delimited tokens of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_PATTERN)


def ws_token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Array of BPE-ish lexer tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def lower_ws_tokens(col: Column | str = "text") -> Column:
    """Lowercased whitespace tokens of trimmed text — THE tokenization
    contract shared with every DuckDB oracle
    (``regexp_split_to_array(lower(trim(text)), '\\s+')``). All operator
    sites must use this helper: the contract is replayed in SQL, so a
    change applied to one inline copy would silently diverge the others.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), WS_PATTERN)


# Adjacent-pair (2-gram) expansion over a token array column named `toks`:
# Spark transform/sequence twin of the oracles' generate_series loop. The
# size guard is load-bearing: Spark's sequence(1, 0) counts DOWN (and with
# an explicit positive step raises ILLEGAL_SEQUENCE_BOUNDARIES), so a
# single-token document would fabricate bigrams or crash under ANSI mode,
# while DuckDB's generate_series(1, 0) is simply empty. Any parameterized
# n-gram variant of this expression needs the same WHEN size(toks) >= n
# guard.
BIGRAM_EXPR = (
    "CASE WHEN size(toks) >= 2 THEN"
    " transform(sequence(1, size(toks)-1), i -> concat_ws(' ', toks[i-1], toks[i]))"
    " ELSE array() END"
)
