"""The shared PORTABLE hash: the one definition every oracle-replayable
operator must agree on.

``md5_long(x)`` = numeric value of the first 15 hex digits of md5 — a
uniform 60-bit non-negative integer computable identically in Spark
(``conv(substring(md5(x),1,15),16,10) :: long``) and DuckDB
(``('0x'||substring(md5(x),1,15))::BIGINT``). The Bloom filter, DSIR
importance sampling, and the md5-based ``*_portable`` sketch twins all
derive their positions/buckets/uniforms from this; keeping it in ONE
place is what keeps their DuckDB differentials bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: 2^60 — the value range; uniforms in (0,1) are (md5_long + 0.5) / H_RANGE
H_RANGE = float(1 << 60)


def md5_long(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
