"""Triple-set precision/recall vs golden (the BASELINE.json gate).

Set comparison on (subj, pred, obj) per FIXTURES.md §3 — computed with
distributed anti-joins/intersections, no driver-side set construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

KEY = ["subj", "pred", "obj"]


def precision_recall(got: DataFrame, golden: DataFrame) -> dict:
    g = got.select(*KEY).distinct().cache()
    ref = golden.select(*KEY).distinct().cache()
    n_got = g.count()
    n_ref = ref.count()
    n_hit = g.join(ref, KEY, "left_semi").count()
    g.unpersist()
    ref.unpersist()
    precision = n_hit / n_got if n_got else 0.0
    recall = n_hit / n_ref if n_ref else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": (2 * precision * recall / (precision + recall))
        if (precision + recall)
        else 0.0,
        "got": n_got,
        "golden": n_ref,
        "hit": n_hit,
    }
