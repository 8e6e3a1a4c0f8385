"""The kg_column_match oracle SQL must REPLAY decide_object_matching exactly.

The recursive-CTE oracle (ORACLE_SQL["kg_column_match"]) advances one seed
column per iteration; this fuzz pins its equivalence with the Python greedy
(sorted seed order, per-type threshold, below-threshold break rule,
strictly-higher-score steal, first-seen-keeps ties) on random instances that
hit every branch — ties, near-threshold scores, chains of steals.  No Ray
needed: pure pandas + duckdb.
"""

import random

import duckdb
import pandas as pd

from mannheimsearchjoinsengine_ray.pipelines.queries import ORACLE_SQL
from mannheimsearchjoinsengine_ray.stages.matching import decide_object_matching

TYPES = ["string", "numeric", "unit", "coordinate", "date", "link", "bool"]
SCORE_POOL = [0.0, 0.1, 0.3, 0.4, 0.45, 0.5, 0.79, 0.8, 0.81, 0.9, 1.0]


def _run_oracle(pairs_df: pd.DataFrame, types_df: pd.DataFrame,
                tmp_path) -> dict[tuple[str, str], bool]:
    pp = str(tmp_path / "cm_pairs.parquet")
    tp = str(tmp_path / "cm_types.parquet")
    pairs_df.to_parquet(pp, index=False)
    types_df.to_parquet(tp, index=False)
    sql = ORACLE_SQL["kg_column_match"] \
        .replace("/tmp/graft_kg_oracle/colmatch_pairs.parquet", pp) \
        .replace("/tmp/graft_kg_oracle/colmatch_types.parquet", tp)
    res = duckdb.connect().execute(sql).fetchdf()
    return {(r["left_col"], r["right_col"]): bool(r["decided"])
            for _, r in res.iterrows()}


def test_colmatch_oracle_replays_greedy(tmp_path):
    rng = random.Random(20260818)
    for trial in range(60):
        ncols = rng.randint(2, 14)
        cols = [f"c{j:02d}" for j in range(ncols)]
        col_types = {c: rng.choice(TYPES) for c in cols}
        all_pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
        rng.shuffle(all_pairs)
        pairs = all_pairs[: rng.randint(1, len(all_pairs))]
        scores = {p: rng.choice(SCORE_POOL) for p in pairs}

        matched = decide_object_matching(scores, col_types)
        mp = {(c, p) for c, ps in matched.items() for p in ps}
        py = {p: (p in mp or (p[1], p[0]) in mp) for p in pairs}

        pairs_df = pd.DataFrame({
            "left_col": [a for a, b in pairs],
            "right_col": [b for a, b in pairs],
            "data_type": ["string"] * len(pairs),
            "score": [scores[p] for p in pairs],
            "count": [1] * len(pairs),
            "complement": [0] * len(pairs),
            "label_score": [0.0] * len(pairs),
            "wordnet_label_score": [0.0] * len(pairs),
            "score_raw": [scores[p] for p in pairs],
        })
        types_df = pd.DataFrame({"col": list(col_types),
                                 "dtype": list(col_types.values())})
        sql = _run_oracle(pairs_df, types_df, tmp_path)
        assert sql == py, (trial, col_types, scores)


def test_colmatch_oracle_steal_chain(tmp_path):
    """Hand-built chain: c2 steals b from c0; c0 keeps a; c1 was claimed
    before its turn and never seeds."""
    pairs = [("c0", "pa"), ("c0", "pb"), ("c2", "pb"), ("c0", "c1")]
    scores = {("c0", "pa"): 0.9, ("c0", "pb"): 0.85,
              ("c2", "pb"): 0.95, ("c0", "c1"): 0.88}
    col_types = {c: "string" for c in ["c0", "c1", "c2", "pa", "pb"]}
    matched = decide_object_matching(scores, col_types)
    assert matched == {"c0": ["pa", "c1"], "c2": ["pb"]}

    pairs_df = pd.DataFrame({
        "left_col": [a for a, b in pairs],
        "right_col": [b for a, b in pairs],
        "data_type": ["string"] * 4,
        "score": [scores[p] for p in pairs],
        "count": [1] * 4,
        "complement": [0] * 4,
        "label_score": [0.0] * 4,
        "wordnet_label_score": [0.0] * 4,
        "score_raw": [scores[p] for p in pairs],
    })
    types_df = pd.DataFrame({"col": list(col_types),
                             "dtype": list(col_types.values())})
    sql = _run_oracle(pairs_df, types_df, tmp_path)
    assert sql == {("c0", "pa"): True, ("c0", "pb"): False,
                   ("c2", "pb"): True, ("c0", "c1"): True}
