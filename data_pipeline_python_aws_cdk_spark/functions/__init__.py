"""Column-level helper functions shared across operators.

Everything here is built from JVM-side ``pyspark.sql.functions`` so it stays
inside whole-stage codegen; no Python UDFs.
"""

from .hashing import hash60, hash60_py, hash60_sql, hash_mode
from .textfns import bpe_ish_token_count, bpe_ish_tokens, ws_token_count, ws_tokens

__all__ = [
    "hash60",
    "hash60_py",
    "hash60_sql",
    "bpe_ish_token_count",
    "bpe_ish_tokens",
    "ws_token_count",
    "ws_tokens",
]
