"""Scalar helpers (reference: ``kafi/helpers.py``, SURVEY §2.8).

Nested-structure normalization, dotted-path access, timestamp and base64
coercions, canonical hashing, the default partitioner, and glob matching —
each a Column expression or a small DataFrame transform; nothing touches
the driver.
"""

from __future__ import annotations

import fnmatch
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StructType


def explode_normalize(df: DataFrame, max_depth: int = 10) -> DataFrame:
    """Recursively explode array columns and flatten struct columns into
    dotted names (kafi/helpers.py:283-303, pandas json_normalize + explode
    semantics; used by the pandas export, kafi/pandas.py:13-28).

    Schema-driven (no data inspection, unlike the reference which sniffs
    ``df.iloc[0]``): arrays explode, structs flatten to ``parent.child``
    columns, repeating until flat or ``max_depth``.
    """
    for _ in range(max_depth):
        schema = df.schema
        array_cols = [f.name for f in schema.fields if isinstance(f.dataType, ArrayType)]
        struct_cols = [f.name for f in schema.fields if isinstance(f.dataType, StructType)]
        if not array_cols and not struct_cols:
            return df
        # one generator per select: explode the first array column this
        # round, flatten every struct, and loop for the rest
        selected = []
        exploded_done = False
        for f_ in schema.fields:
            name = f_.name
            if isinstance(f_.dataType, ArrayType) and not exploded_done:
                selected.append(F.explode_outer(F.col(f"`{name}`")).alias(name))
                exploded_done = True
            elif isinstance(f_.dataType, StructType):
                for child in f_.dataType.fields:
                    selected.append(F.col(f"`{name}`.`{child.name}`").alias(f"{name}.{child.name}"))
            else:
                selected.append(F.col(f"`{name}`"))
        df = df.select(*selected)
    return df


def _path_keys(path: "Sequence[str] | str") -> list[str]:
    """A plain string is a DOTTED path ("meta.lang"), not a char
    sequence — str satisfies Sequence[str], so without this the natural
    call get_path(c, "meta.lang") iterated characters and failed with a
    baffling no-such-field error."""
    return path.split(".") if isinstance(path, str) else list(path)


def get_path(col_or_name: Column | str, path: "Sequence[str] | str") -> Column:
    """Dotted-path read into nested structs (kafi/helpers.py:325-330
    ``get_value``). ``path`` is a key list or a dotted string."""
    c = F.col(col_or_name) if isinstance(col_or_name, str) else col_or_name
    for key in _path_keys(path):
        c = c.getField(key)
    return c


def set_path(col: Column, path: "Sequence[str] | str", value: Column) -> Column:
    """Dotted-path write into nested structs (kafi/helpers.py:329-334
    ``set_value``) via chained ``withField``.

    Null INTERMEDIATE structs raise (row-level, with the path named):
    ``withField`` on a null struct returns null, which silently ERASED
    the write for that row pre-round-8. The reference's dict form
    creates ``{}`` intermediates, but a Spark struct is statically
    typed — an all-null-siblings struct can't be synthesized from a
    pure Column (no schema access) — so the honest contract is to fail
    loudly; callers wanting create-semantics coalesce the struct to a
    typed default first."""
    path = _path_keys(path)
    if len(path) == 1:
        return col.withField(path[0], value)
    inner = col.getField(path[0])
    written = set_path(inner, path[1:], value)
    guarded = F.when(
        col.isNotNull() & inner.isNull(),
        F.raise_error(F.lit(
            f"set_path: intermediate struct {path[0]!r} is null — the "
            f"write to {'.'.join(path)!r} would be silently lost; "
            "coalesce it to a default struct first"
        )),
    ).otherwise(written)
    return col.withField(path[0], guarded)


# -- coercions (kafi/helpers.py:188-267) ------------------------------------

def to_base64(col: Column) -> Column:
    return F.base64(col)


def from_base64(col: Column) -> Column:
    return F.unbase64(col)


def bytes_to_str(col: Column) -> Column:
    return col.cast("string")


def str_to_bytes(col: Column) -> Column:
    return F.encode(col, "utf-8")


def dict_to_json(col: Column) -> Column:
    return F.to_json(col)


def json_to_dict(col: Column, schema: str) -> Column:
    return F.from_json(col, schema)


# -- timestamps (kafi/helpers.py:30-39) -------------------------------------

def get_millis(ts: Column) -> Column:
    """timestamp -> epoch millis (kafi/helpers.py:30-31 get_millis)."""
    return F.unix_millis(ts)


def to_millis(iso: Column) -> Column:
    """ISO string -> epoch millis (kafi/helpers.py:33-35 to_millis)."""
    return F.unix_millis(F.to_timestamp(iso))


def from_millis(ms: Column) -> Column:
    """epoch millis -> timestamp (kafi/helpers.py:37-39 from_millis)."""
    return F.timestamp_millis(ms)


# -- hashing & partitioning -------------------------------------------------

def hash_struct(col: Column) -> Column:
    """Canonical hash of a struct: xxhash64 of its canonical JSON
    (kafi/helpers.py:315-316 hash_dict = hash of sort_keys JSON). Struct
    field order is schema order — canonical within one schema."""
    return F.xxhash64(F.to_json(col))


def default_partition(key: Column, partitions: int) -> Column:
    """hash(key) % n for non-null keys (kafi/helpers.py:338-352); null
    keys return NULL so the caller's round-robin coalesce (see
    FSTopicStorage.produce) can actually see them — xxhash64(null)
    silently returns the seed, which piled every keyless record into
    one constant hot partition."""
    return F.when(
        key.isNotNull(), F.pmod(F.xxhash64(key), F.lit(partitions))
    ).cast("int")


def pattern_match(names: Sequence[str], patterns: str | Sequence[str] | None) -> list[str]:
    """fnmatch glob filter over name lists, sorted (kafi/helpers.py:270-280).
    Driver-side admin helper (topic/group/subject lists are small)."""
    if patterns is None:
        return sorted(names)
    if isinstance(patterns, str):
        patterns = [patterns]
    return sorted(n for n in names if any(fnmatch.fnmatch(n, p) for p in patterns))


def is_internal(name: str) -> bool:
    """Internal-resource filter (kafi/helpers.py:383-384; default topic
    ignore pattern ``_*``, kafi/storage.py:325-330)."""
    return name.startswith("_")
