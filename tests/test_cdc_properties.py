"""Property test: the one-shuffle CDC merge (`sources/cdc.py`) agrees
with a literal Python replay model on random feeds — keys appearing
only in base, only in changes, or both; delete tombstones anywhere in
the sequence; ties between base and change on the ordering column.

Spark jobs are expensive per example, so the random feeds are
generated up front (seeded, 25 scenarios) and replayed through ONE
parametrized loop — same coverage idea as hypothesis but one session.
"""

from __future__ import annotations

import random

from crypto_data_pipeline_spark.sources.cdc import apply_changes


def _python_model(base_rows, change_rows):
    """Literal replay: per key, the (seq, is_change)-max row wins;
    a winning delete removes the key."""
    state = {}
    for k, v, seq in base_rows:
        state[k] = (seq, 0, v, "U")
    for k, v, seq, op in change_rows:
        cur = state.get(k)
        if cur is None or (seq, 1) >= (cur[0], cur[1]):
            state[k] = (seq, 1, v, op)
    return {k: v for k, (seq, c, v, op) in state.items() if op != "D"}


def _random_feed(rng):
    keys = range(rng.randint(1, 8))
    base = [(k, float(rng.randint(0, 99)), rng.randint(0, 10))
            for k in keys if rng.random() < 0.7]
    # unique (key, seq) per change: ties WITHIN the feed are undefined
    # by contract (a CDC log is totally ordered per key)
    seen = set()
    changes = []
    for _ in range(rng.randint(0, 12)):
        k = rng.randint(0, 9)
        seq = rng.randint(0, 10)
        if (k, seq) in seen:
            continue
        seen.add((k, seq))
        op = "D" if rng.random() < 0.3 else "U"
        changes.append((k, float(rng.randint(0, 99)), seq, op))
    return base, changes


def test_cdc_matches_python_replay_model(spark):
    rng = random.Random(42)
    for case in range(25):
        base_rows, change_rows = _random_feed(rng)
        if not base_rows and not change_rows:
            continue
        base = spark.createDataFrame(base_rows or [(0, 0.0, 0)], "k long, v double, seq long")
        if not base_rows:
            base = base.where("false")
        changes = spark.createDataFrame(
            change_rows or [(0, 0.0, 0, "U")], "k long, v double, seq long, op string"
        )
        if not change_rows:
            changes = changes.where("false")
        got = {r.k: r.v for r in apply_changes(base, changes, ["k"], ["seq"]).collect()}
        want = _python_model(base_rows, change_rows)
        assert got == want, f"case {case}: base={base_rows} changes={change_rows}"
