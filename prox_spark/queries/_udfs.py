"""Arrow-batched pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf resolves the type hints at definition time, and stringified
annotations referencing a function-local ``pd`` import would fail.
"""

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf


CHUNK_TOKENS = 10


def make_chunk_udtf():
    """Python UDTF (Spark 4 table function): split a document's token
    stream into fixed-size training chunks — one input row fans out to
    N output rows through a LATERAL join. Tokenization matches the
    corpus-wide ASCII-pinned whitespace split (q39 rationale above)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_text string, n_chunk_tokens bigint")
    class ChunkDoc:
        def eval(self, text: str):
            toks = re.split(r"\s+", text.strip().lower(), flags=re.ASCII)
            for i in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
                part = toks[i * CHUNK_TOKENS : (i + 1) * CHUNK_TOKENS]
                yield i, " ".join(part), len(part)

    return ChunkDoc


def make_pandas_sum_long():
    """Grouped-aggregate pandas UDF (the UDAF surface): Arrow hands the
    whole group's column to Python, one scalar comes back. Integer sum,
    so the result is order-independent and bit-identical to SQL. Built
    lazily (a factory, like the others) because pandas_udf parses its
    DDL return type against the ACTIVE session — decorating at module
    import would require a SparkContext before any session exists."""

    @pandas_udf("long")
    def pandas_sum_long(v: pd.Series) -> int:
        return int(v.sum())

    return pandas_sum_long


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


def make_ngram_udtf():
    """POLYMORPHIC UDTF (Spark 4 static ``analyze``): the output schema
    is computed at plan time from the constant ``n`` argument — n=3
    yields (pos, tok0, tok1, tok2) — the table-function counterpart of
    schema-on-read. Evaluation is Arrow-batched via the session conf
    (spark.sql.execution.pythonUDTF.arrow.enabled)."""
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGramUDTF:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            if width < 1:
                raise ValueError("n must be >= 1")
            fields = [StructField("pos", LongType())] + [
                StructField(f"tok{i}", StringType()) for i in range(width)
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, text, n):
            # same token class as TOKENS_SPARK / TOKENS_DUCK
            toks = re.split(r"\s+", text.lower().strip())
            for p in range(len(toks) - n + 1):
                yield (p, *toks[p : p + n])

    return udtf(NGramUDTF)
