"""JSONSchema wire type: schema-validated JSON payloads.

The reference's ``jsonschema``/``json_sr`` wire type is plain JSON whose
schema lives in the Schema Registry and is validated on the way in/out
(kafi/deserializer.py:71-80, kafi/serializer.py:90-105). Spark-side the
decode is ``from_json`` like the json type; validation crosses into
Python once per Arrow batch with the compiled validator in the closure
(compiling per batch, not per row — jsonschema.Draft202012Validator is
the expensive part).

Confluent-framed payloads (magic + schema id) should be stripped with
``schema.confluent_strip_header`` first; the registry round-trip reuses
``SchemaRegistryClient`` with ``schema_type="JSON"``.
"""

from __future__ import annotations

import json

import pandas as pd

try:
    import jsonschema as _js
except ImportError:  # pragma: no cover - bundled in this environment
    _js = None


def validate_json_df(df, col: str, schema: dict | str, mode: str = "error",
                     out: str | None = None):
    """Validate a JSON binary/string column against a JSON Schema.

    * ``mode="error"``  — fail the job on the first invalid payload
      (serializer parity: the reference raises on produce);
    * ``mode="filter"`` — keep only valid rows;
    * ``mode="flag"``   — add a boolean ``<col>_valid`` column.

    NULL payloads are Kafka tombstones, not documents: they flag as
    null (neither valid nor invalid), survive ``filter``, and never
    trip ``error`` — a compacted topic's deletes used to fail the job
    (or silently vanish under ``filter``).

    Returns the DataFrame with ``col`` untouched; pair with
    ``schema.decode_col(col, "json", ...)`` for the typed view.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    if _js is None:
        raise NotImplementedError("python-jsonschema not available")
    sch = json.loads(schema) if isinstance(schema, str) else schema
    _js.Draft202012Validator.check_schema(sch)
    flag_col = out or f"{col}_valid"

    @F.pandas_udf(BooleanType())
    def _valid(s: pd.Series) -> pd.Series:
        validator = _js.Draft202012Validator(sch)

        def one(b):
            if b is None:
                return None  # tombstone: no document to judge
            try:
                doc = json.loads(bytes(b).decode("utf-8") if not isinstance(b, str) else b)
            except (UnicodeDecodeError, json.JSONDecodeError):
                return False
            return validator.is_valid(doc)

        return pd.Series([one(b) for b in s], dtype="boolean")

    flagged = df.withColumn(flag_col, _valid(F.col(col)))
    if mode == "flag":
        return flagged
    if mode == "filter":
        return flagged.filter(
            F.col(flag_col).isNull() | F.col(flag_col)
        ).drop(flag_col)
    if mode == "error":
        # Enforce through a FILTER predicate, not a gated projection of
        # the payload column: Catalyst prunes unused columns, so a
        # query that never consumed the payload (count(), key-only
        # selects) silently skipped validation despite the 'fail on
        # first invalid payload' contract (round-8 review — the earlier
        # payload-column gate only fixed pruning of the side column).
        # A filter must be evaluated for every row regardless of the
        # downstream projection.
        return flagged.filter(
            F.when(
                F.col(flag_col).isNull() | F.col(flag_col), F.lit(True)
            ).otherwise(
                F.raise_error(
                    F.concat(F.lit("jsonschema validation failed: "),
                             F.col(col).cast("string"))
                ).cast("boolean")
            )
        ).drop(flag_col)
    raise ValueError(f"unknown mode: {mode}")
