"""Arrow-batched pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf resolves the type hints at definition time, and stringified
annotations referencing a function-local ``pd`` import would fail.
"""

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf


def sentiment_counts_udf(pos_words, neg_words):
    """Per-doc lexicon counts (see queries/text.py q39 for the design
    rationale: only integer counts cross the Arrow boundary; score
    arithmetic stays JVM-side for bit-parity with the DuckDB oracle)."""
    pos, neg = set(pos_words), set(neg_words)

    @pandas_udf("n_tokens long, n_pos long, n_neg long")
    def counts(text: pd.Series) -> pd.DataFrame:
        def one(t):
            # ASCII-pinned \s: Python's default \s matches Unicode
            # whitespace (e.g.  ) while Java's does not — pin both
            # engines to the same whitespace class for oracle parity
            toks = re.split(r"\s+", t.strip().lower(), flags=re.ASCII)
            return (
                len(toks),
                sum(tok in pos for tok in toks),
                sum(tok in neg for tok in toks),
            )

        rows = [one(t) for t in text]
        return pd.DataFrame(rows, columns=["n_tokens", "n_pos", "n_neg"])

    return counts
