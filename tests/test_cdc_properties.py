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
import pytest


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


@pytest.mark.slow
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


@pytest.mark.slow
def test_ivm_maintained_aggregate_equals_recompute(spark):
    """Property (seeded scenarios, one session): maintaining a
    COUNT/SUM aggregate from CDC deltas (`maintain_group_aggregate`)
    equals recomputing it from the post-change table — across inserts,
    deletes, value updates, group moves, brand-new groups, and groups
    whose count falls to zero (which must VANISH, not linger at 0)."""
    from collections import defaultdict

    from crypto_data_pipeline_spark.sources.cdc import maintain_group_aggregate

    rng = random.Random(17)
    for scenario in range(12):
        groups = ["g0", "g1", "g2", "g3"]
        base = {
            k: (rng.choice(groups), rng.randint(-50, 200))
            for k in range(rng.randint(0, 25))
        }
        # ensure one scenario empties a whole group
        if scenario == 3:
            base = {0: ("solo", 7), 1: ("g0", 5)}
        changes = []
        final = dict(base)
        keys = list(base) or [0]
        for k in rng.sample(keys, min(len(keys), rng.randint(0, len(keys)))):
            op = rng.choice(["del", "upd", "move"])
            pg, pv = base[k]
            if op == "del" or scenario == 3:
                changes.append(("D", None, None, pg, pv))
                final.pop(k, None)
            elif op == "upd":
                nv = rng.randint(-50, 200)
                changes.append(("U", pg, nv, pg, pv))
                final[k] = (pg, nv)
            else:
                ng = rng.choice(groups + ["brand_new"])
                changes.append(("U", ng, pv, pg, pv))
                final[k] = (ng, pv)
        for k in range(1000, 1000 + rng.randint(0, 6)):  # inserts
            g, v = rng.choice(groups + ["brand_new"]), rng.randint(-50, 200)
            changes.append(("U", g, v, None, None))
            final[k] = (g, v)

        agg_rows = defaultdict(lambda: [0, 0])
        for g, v in base.values():
            agg_rows[g][0] += 1
            agg_rows[g][1] += v
        agg = spark.createDataFrame(
            [(g, c, s) for g, (c, s) in agg_rows.items()] or [("_none", 0, 0)],
            "grp string, n_rows long, total long",
        ).where("n_rows > 0")
        ch = spark.createDataFrame(
            changes or [("U", "g0", 0, None, None)][:0],
            "op string, grp string, val long, prev_grp string, prev_val long",
        )
        got = {
            (r["grp"], r["n_rows"], r["total"])
            for r in maintain_group_aggregate(
                agg, ch, "grp", "val", cnt_col="n_rows", sum_col="total",
                prev_group_col="prev_grp", prev_value_col="prev_val",
            ).collect()
        }
        want_rows = defaultdict(lambda: [0, 0])
        for g, v in final.values():
            want_rows[g][0] += 1
            want_rows[g][1] += v
        want = {(g, c, s) for g, (c, s) in want_rows.items() if c != 0}
        assert got == want, (scenario, got ^ want)
