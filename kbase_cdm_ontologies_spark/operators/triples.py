"""M4 — OpenIE-style pattern triple extraction.

Stays entirely JVM-side (whole-stage codegen): ``regexp_extract_all``
pulls full SVO matches, ``explode`` fans them out, ``regexp_extract``
splits the groups — no Python in the hot path at all. The pattern and
predicate->CURIE mapping are shared with the plain-Python oracle via
functions/text_rules.py (SVO_PATTERN / PREDICATE_CURIE), so both
implementations agree by construction.

Output: raw_triples(url, subj_surface, pred, obj_surface) with
normalized (casefolded, whitespace-collapsed) surfaces and CURIE preds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_rules import PREDICATE_CURIE, SVO_PATTERN
from .alias_dict import normalize_expr


def extract_triples(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    lang_filter: str | None = "en",
) -> DataFrame:
    src = extracted
    if lang_filter is not None:
        src = src.where(F.col("lang") == lang_filter)
    pred_map = F.create_map(*[F.lit(x) for kv in PREDICATE_CURIE.items() for x in kv])
    m = F.col("m")
    return (
        src.select(
            "url",
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(SVO_PATTERN), 0)).alias("m"),
        )
        .select(
            "url",
            normalize_expr(F.regexp_extract(m, SVO_PATTERN, 1)).alias("subj_surface"),
            pred_map[F.regexp_extract(m, SVO_PATTERN, 2)].alias("pred"),
            normalize_expr(F.regexp_extract(m, SVO_PATTERN, 3)).alias("obj_surface"),
        )
    )
