"""Triple extraction from transcript turns.

nemo analogy: this is our EDB "import" stage — raw text becomes ternary
(subj, pred, obj) facts, like nemo's DSV/RDF readers turn files into
predicates (``nemo/src/io/formats/``). Two implementations with identical
output on any text:

- :func:`extract_triples_expr` — pure Catalyst (regexp), whole-stage codegen,
  zero Python. Preferred when the mention grammar is regular.
- :func:`extract_triples_pandas` — vectorized Arrow-batched ``mapInPandas``
  (the general path for arbitrary mention detectors; NO per-row Python —
  regex is applied per Arrow batch via pandas ``str.extractall``).

Scale notes: extraction is embarrassingly parallel per turn. We repartition by
(conv_id, turn_idx) — NOT conv_id alone — so the planted hot conversation
(~30% of rows) cannot pin a single task; the per-conversation ordering
invariant doesn't need co-location here, only the window check does.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nemo_spark.kg.transcripts import TRIPLE_RE

# all-occurrences pattern for the general extractor (not only sentence-initial)
MENTION_RE = r"((?:entity_|ent-|E\.)\d+) (works_at|located_in|part_of) ((?:entity_|ent-|E\.)\d+) \."

TRIPLES_RAW_SCHEMA = (
    "conv_id string, turn_idx int, subj_alias string, pred string, obj_alias string"
)


def extract_triples_expr(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, subj_alias, pred, obj_alias) via Catalyst regexp."""
    t = F.col("text")
    out = transcripts.select(
        "conv_id",
        "turn_idx",
        F.regexp_extract(t, TRIPLE_RE, 1).alias("subj_alias"),
        F.regexp_extract(t, TRIPLE_RE, 2).alias("pred"),
        F.regexp_extract(t, TRIPLE_RE, 3).alias("obj_alias"),
    )
    return out.filter(F.col("subj_alias") != "")


def extract_triples_pandas(transcripts: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """General extractor: every relation-sentence occurrence in the text,
    via Arrow-batched pandas (vectorized ``str.extractall``)."""
    pattern = re.compile(MENTION_RE)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            hits = pdf["text"].str.extractall(pattern)
            if hits.empty:
                continue
            hits = hits.reset_index(level=1, drop=True)
            hits.columns = ["subj_alias", "pred", "obj_alias"]
            keys = pdf[["conv_id", "turn_idx"]].loc[hits.index].reset_index(drop=True)
            yield pd.concat([keys, hits.reset_index(drop=True)], axis=1)

    cols = transcripts.select("conv_id", "turn_idx", "text")
    # spread the hot conversation across tasks
    cols = cols.repartition(F.col("conv_id"), F.col("turn_idx"))
    return cols.mapInPandas(extract, schema=TRIPLES_RAW_SCHEMA)


EXTRACT_SQL_TEMPLATE = """
SELECT conv_id, turn_idx,
       regexp_extract(text, '{re}', 1) AS subj_alias,
       regexp_extract(text, '{re}', 2) AS pred,
       regexp_extract(text, '{re}', 3) AS obj_alias
FROM ({transcripts})
WHERE regexp_extract(text, '{re}', 1) <> ''
"""


def extract_sql(transcripts_sql: str) -> str:
    """DuckDB oracle for :func:`extract_triples_expr` over a transcripts SQL."""
    # DuckDB standard string literals keep backslashes verbatim: no escaping
    return EXTRACT_SQL_TEMPLATE.format(re=TRIPLE_RE, transcripts=transcripts_sql)
