"""G6 — faithful MODH assignment on the port of the reference's
pickled-score fixture (tests/test_assignment_strategies.py:23-36: the
reference asserts len(alignment) == 6 on test_sim_scores.pickle over
the GO/HPO micro ontologies).

tests/data_modh_fixture.json is extracted from the reference test data:
entity-id lists in KB load order (the matrix row/col order the
reference uses via get_entity_index) plus all 998 scored pairs.
"""

import json
import os

import pytest

from ontoemma_spark.operators.assignment import (
    _ModifiedHungarian,
    modified_hungarian_alignment,
)
from ontoemma_spark.operators.strategy import (
    apply_alignment_strategy,
    greedy_one_to_one_alignment,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "data_modh_fixture.json")


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def scores_df(spark, fixture):
    return spark.createDataFrame(
        [(s, t, sc) for s, t, sc in fixture["scores"]],
        "s_id string, t_id string, score double",
    )


def test_modh_reference_fixture_six_alignments(spark, fixture, scores_df):
    """The reference contract: 6 alignments on its own fixture."""
    out = modified_hungarian_alignment(
        scores_df, fixture["s_ids"], fixture["t_ids"]
    ).collect()
    assert len(out) == 6
    # all six are the score-1.0 gold pairs, each entity used once
    assert all(r["score"] == 1.0 for r in out)
    assert len({r["s_id"] for r in out}) == 6
    assert len({r["t_id"] for r in out}) == 6


def test_modh_deterministic(spark, fixture, scores_df):
    a = sorted(
        map(tuple, modified_hungarian_alignment(
            scores_df, fixture["s_ids"], fixture["t_ids"], seed=42
        ).collect())
    )
    b = sorted(
        map(tuple, modified_hungarian_alignment(
            scores_df, fixture["s_ids"], fixture["t_ids"], seed=42
        ).collect())
    )
    assert a == b and len(a) == 6


def test_greedy_scale_variant_agrees_on_count(spark, fixture, scores_df):
    """The distributed mutual-best greedy (the 10^12-pair path) agrees
    with the reference algorithm on the fixture (all strategies agree
    on this fixture per the reference's own three asserts)."""
    greedy = greedy_one_to_one_alignment(scores_df, threshold=0.9).collect()
    assert len(greedy) == 6
    modh = apply_alignment_strategy(scores_df, "modh", threshold=0.9).collect()
    assert sorted(map(tuple, greedy)) == sorted(map(tuple, modh))


def test_cost_reduction_yields_one_to_one():
    """Pin the greedy + obliteration semantics on a 3×2 matrix (no
    transpose): three rows compete for two columns; the result is a
    1:1 two-pair assignment with both columns used, and row 2 (the
    expensive row) gets the leftover column."""
    import numpy as np

    mat = np.array(
        [
            [0.10, 0.30],
            [0.05, 0.40],
            [0.90, 0.95],
        ]
    )
    got = sorted(_ModifiedHungarian(mat.copy(), seed=1).compute())
    assert got == [(1, 0), (2, 1)]


def test_index_quirk_replicated():
    """modified_hungarian.py:26 drops a row whose CHEAPEST column is
    index 1 (the column INDEX is compared to 1.0, not the cost).
    Replicated for parity — this pins the quirk so a future 'fix'
    shows up as a deliberate divergence, not an accident."""
    import numpy as np

    # 2x2 (no transpose): row 0's cheapest column is 1 → dropped;
    # row 1's cheapest column is 0 → assigned.
    mat = np.array(
        [
            [0.9, 0.1],
            [0.2, 0.8],
        ]
    )
    assert sorted(_ModifiedHungarian(mat.copy(), seed=0).compute()) == [(1, 0)]


def test_transpose_truncation_quirk_replicated():
    """When cols > rows the reference transposes but keeps the
    pre-transpose row/col counts, truncating iteration (:17-28). On
    this 2×3 matrix the truncation + index quirk leave a single
    assignment — pinned as the reference behavior."""
    import numpy as np

    mat = np.array(
        [
            [0.10, 0.30, 1.0],
            [0.05, 1.0, 0.40],
        ]
    )
    assert sorted(_ModifiedHungarian(mat.copy(), seed=0).compute()) == [(0, 1)]
