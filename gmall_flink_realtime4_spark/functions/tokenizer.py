"""Keyword tokenizer (U1 — the engine's twin of the KwSplit UDTF).

Reference: realtime-dws/.../function/KwSplit.java:47-56 + IkUtil.java:14-34
— IK Chinese segmenter (smart mode) collecting tokens into a **HashSet**,
so output is deduped and unordered. IK's exact segmentation can't be
bit-matched from Python (SURVEY §7 "what's hard"); the engine therefore
*defines* its tokenizer as part of the spec:

- split on non-alphanumeric runs (CJK chars are kept as single-char tokens,
  approximating IK's smart-mode fallback for unknown words),
- lowercase, drop empties, dedup,
- emit in sorted order (deterministic twin of HashSet's "unordered").

The same function is handed to oracles/tests, so parity is exact.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column

_TOKEN_RE = re.compile(r"[a-z0-9]+|[一-鿿]")


def tokenize(text: str | None) -> list[str]:
    """Pure-Python tokenizer: deduped, sorted tokens."""
    if not text:
        return []
    return sorted(set(_TOKEN_RE.findall(text.lower())))


def kw_split(col) -> Column:
    """Arrow-batched UDF form (use with explode for the UDTF/J7 shape).

    Prefer the pure-SQL split in hot paths (plans/dws_queries.py uses
    split+array_distinct, JVM-side); this UDF exists for exact KwSplit
    parity incl. CJK handling. The pandas_udf is built lazily because
    registration needs an active SparkSession.
    """

    @F.pandas_udf("array<string>")
    def _kw_split(s: pd.Series) -> pd.Series:
        return s.map(tokenize)

    return _kw_split(col)
