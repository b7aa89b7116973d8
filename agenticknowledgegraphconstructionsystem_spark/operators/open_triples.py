"""D2 — OpenIE-style per-sentence triple extraction as a batched Arrow UDF.

The reference computes doc-level relations implicitly through D1 mentions +
D4 doc-doc classification; the north_star additionally names sentence-level
(subj, pred, obj) extraction.  The extraction logic is the shared pure
function :func:`semantics.extract_open_triples`; here it runs vectorized
over Arrow batches (per input_hint: no per-row Python in the engine — the
UDF maps whole pandas Series per batch).

Scale shape: narrow map stage (text in, small triple arrays out) →
explode → distinct-per-doc is already guaranteed by the function — no
shuffle until any downstream aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import semantics as S

_TRIPLE_ARR = T.ArrayType(
    T.StructType(
        [
            T.StructField("subj", T.StringType()),
            T.StructField("pred", T.StringType()),
            T.StructField("obj", T.StringType()),
            T.StructField("sent_idx", T.IntegerType()),
        ]
    )
)


def _make_extractor(gazetteer):
    @pandas_udf(_TRIPLE_ARR)
    def extract(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: S.extract_open_triples(t, gazetteer))

    return extract


def extract_open_triples(
    docs: DataFrame,
    gazetteer: tuple[tuple[str, str], ...] = S.GAZETTEER,
    text_col: str = "extracted_text",
) -> DataFrame:
    """docs → (url, subj, pred, obj, sent_idx)."""
    ex = _make_extractor(gazetteer)
    return (
        docs.where(F.col(text_col).isNotNull())
        .select("url", F.explode(ex(F.col(text_col))).alias("t"))
        .select("url", "t.subj", "t.pred", "t.obj", "t.sent_idx")
    )
