"""Evaluation harness: precision / recall / coverage of pipeline outputs
against gold standards.

Port of the reference's golden-output evaluation tooling (SURVEY §5):
  * SearchTableResultAnalyzer.analyzeResult (SJ/statistics/
    SearchTableResultAnalyzer.java:236-445): per-table precision =
    correct/total (:137-140), coverage = total/instances (:142-145),
    combined precision (:408-409);
  * MatchingEvaluator.evaluateMatching (SJ/utils/MatchingEvaluator.java:37);
  * Web2DBPediaAnalyser-style value agreement.

Used by the e2e tests (triple P/R gate ≥ 0.95) and exposed for users running
their own gold sets.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class PRResult:
    precision: float
    recall: float
    coverage: float
    n_got: int
    n_gold: int
    n_correct: int

    @property
    def f1(self) -> float:
        if self.precision + self.recall == 0:
            return 0.0
        return 2 * self.precision * self.recall / (self.precision + self.recall)


def evaluate_sets(got: set, gold: set, instances: int | None = None) -> PRResult:
    """Set-level precision/recall; coverage = |got| / instances (the
    reference's 'how much of the queried space produced output')."""
    correct = len(got & gold)
    precision = correct / len(got) if got else 0.0
    recall = correct / len(gold) if gold else 0.0
    coverage = len(got) / instances if instances else recall
    return PRResult(precision=precision, recall=recall, coverage=coverage,
                    n_got=len(got), n_gold=len(gold), n_correct=correct)


def evaluate_triples(got, gold, keys=("subj", "pred", "obj")) -> PRResult:
    """Triple-set P/R: inputs are Datasets / DataFrames with the triple
    columns; comparison on the ``keys`` projection (obj_type/source excluded
    by default, matching the P/R ≥ 0.95 gate definition)."""
    def to_set(x) -> set:
        if hasattr(x, "to_pandas"):
            x = x.to_pandas()
        if isinstance(x, pd.DataFrame):
            return set(map(tuple, x[list(keys)].itertuples(index=False)))
        return {t[:len(keys)] if isinstance(t, tuple) else t for t in x}

    return evaluate_sets(to_set(got), to_set(gold))


def evaluate_links(got: pd.DataFrame, gold: pd.DataFrame,
                   mention_keys=("url", "table_idx", "row_idx"),
                   label_col: str = "entity_uri") -> PRResult:
    """Link accuracy as P/R: got/gold keyed by mention id; precision over
    emitted links, recall over gold mentions."""
    g = gold.merge(got, on=list(mention_keys), suffixes=("_gold", "_got"),
                   how="outer", indicator=True)
    both = g[g["_merge"] == "both"]
    correct = int((both[f"{label_col}_gold"] == both[f"{label_col}_got"]).sum())
    n_got = int((g["_merge"] != "left_only").sum())
    n_gold = int((g["_merge"] != "right_only").sum())
    return PRResult(
        precision=correct / n_got if n_got else 0.0,
        recall=correct / n_gold if n_gold else 0.0,
        coverage=n_got / n_gold if n_gold else 0.0,
        n_got=n_got, n_gold=n_gold, n_correct=correct,
    )
