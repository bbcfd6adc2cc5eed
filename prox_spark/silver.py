"""Bronze -> silver transformation job (SURVEY.md §7.2 step 4).

Mirrors the reference transformations job (reference
glue_scripts/transformations_script.py:140-181): per table —
key-based dedup, cast-based schema enforcement, assertion — but as a
library function over a {name -> DataFrame} dict instead of a Glue
catalog loop, and without the RDD round-trip anti-pattern (§4.2).
Fail-fast per table like the reference; the pipeline runner decides
retry policy (reference stepfunctions.tf:17-22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from prox_spark.schemas import PRIMARY_KEYS, SILVER_SCHEMAS
from prox_spark.validate import assert_schema, dedup_by_key, enforce_schema


def to_silver(bronze: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Validate every known bronze table into its silver shape."""
    out: dict[str, DataFrame] = {}
    for name, df in bronze.items():
        schema = SILVER_SCHEMAS.get(name)
        if schema is None:  # passthrough for non-domain tables
            out[name] = df
            continue
        conformed = enforce_schema(df, schema, check=True)
        deduped = dedup_by_key(conformed, PRIMARY_KEYS.get(name, [c for c in df.columns]))
        assert_schema(deduped, schema)
        out[name] = deduped
    return out
