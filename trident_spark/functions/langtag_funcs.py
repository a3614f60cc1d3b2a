"""Arrow-vectorized Spark UDFs wrapping the langtag kernel.

The IANA registry (~9.9k records) is loaded once per Python worker process
(module-level lru_cache) — the Spark analogue of the reference's
"create the parser once and reuse it" guidance (langtag/embedded.go).
Language tags have tiny cardinality in any real corpus, so every batch is
computed over distinct values only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from trident_spark.kernels import langtag as L

__all__ = ["langtag_parse", "langtag_normalize", "langtag_to_extlang"]

LANGTAG_SCHEMA = StructType(
    [
        StructField("tag", StringType()),
        StructField("language", StringType()),
        StructField("extlangs", ArrayType(StringType())),
        StructField("script", StringType()),
        StructField("region", StringType()),
        StructField("variants", ArrayType(StringType())),
        StructField("extensions", ArrayType(StringType())),  # "singleton-value"
        StructField("private_use", ArrayType(StringType())),
        StructField("is_grandfathered", BooleanType()),
        StructField("error", StringType()),
    ]
)

_COLS = ["tag", "language", "extlangs", "script", "region", "variants",
         "extensions", "private_use", "is_grandfathered", "error"]

_ERR_ROW = (None,) * 9


def _to_row(t: L.ParsedTag):
    return (
        t.tag,
        t.language or None,
        list(t.extlangs),
        t.script or None,
        t.region or None,
        list(t.variants),
        [f"{s}-{v}" if v else s for s, v in t.extensions],
        list(t.private_use),
        t.is_grandfathered,
        None,
    )


def _langtag_udf(kernel_fn):
    def batch(s: pd.Series) -> pd.DataFrame:
        reg = L.load_registry()
        uniq = s.dropna().unique()
        table = {}
        for v in uniq:
            try:
                table[v] = _to_row(kernel_fn(v, reg))
            except L.LangTagError as e:
                table[v] = _ERR_ROW + (e.code,)
        rows = [table[v] if v is not None else _ERR_ROW + ("null input",) for v in s]
        return pd.DataFrame(rows, columns=_COLS)

    return pandas_udf(LANGTAG_SCHEMA)(batch)


langtag_parse = _langtag_udf(L.parse)
langtag_normalize = _langtag_udf(L.normalize)
langtag_to_extlang = _langtag_udf(L.to_extlang_form)
