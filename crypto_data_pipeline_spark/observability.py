"""Runtime plan observability: read the ACTUAL shuffle/spill/row
metrics off an executed plan, not just its static shape.

`tools/plan_audit.py` counts Exchanges statically; this module closes
the loop the way a 100 TB deployment does — after a query runs, pull
the SQLMetrics Spark already collected (shuffle bytes/records
written, spill, scan output rows) straight from the executed-plan
tree. bench.py attaches these per query, so a regression that doubles
shuffle volume is visible in the bench artifact even when wall-clock
noise (see docs/BENCH_VARIANCE.md) hides it: bytes are deterministic
where seconds are not.

Implementation notes: with AQE the root is AdaptiveSparkPlanExec and
already-executed stages hide behind QueryStageExec wrappers — both are
unwrapped (`.executedPlan()` / `.plan()`); ReusedExchange metrics are
NOT double-counted (the reuse node carries its own zeroed metrics
map). Everything is py4j reads of state the JVM tracks anyway — zero
execution overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# executed-plan metric keys -> report keys (summed over the tree)
_SUMMED = {
    "shuffleBytesWritten": "shuffle_bytes_written",
    "shuffleRecordsWritten": "shuffle_records_written",
    "spillSize": "spill_bytes",
}


def plan_runtime_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate runtime metrics of ``df``'s LAST execution. Call
    AFTER an action (collect/count/write) — metrics of an unexecuted
    plan are all zero. Returns total shuffle bytes/records written,
    spill bytes, the number of Exchange nodes that actually ran, and
    rows produced by the scan leaves (`scan_output_rows`)."""
    totals = {v: 0 for v in _SUMMED.values()}
    totals["n_exchanges"] = 0
    totals["scan_output_rows"] = 0

    def node_metrics(node) -> dict[str, int]:
        vals: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        return vals

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec" or cls.endswith("QueryStageExec"):
            walk(node.executedPlan() if cls == "AdaptiveSparkPlanExec" else node.plan())
            return
        name = node.nodeName()
        if name.startswith("ReusedExchange"):
            # the reuse delegates to the ORIGINAL exchange's metrics —
            # descending would double-count a shuffle that ran once
            return
        vals = node_metrics(node)
        if name.startswith("Exchange"):
            totals["n_exchanges"] += 1
        if name.startswith("Scan") or cls.endswith("ScanExec"):
            totals["scan_output_rows"] += int(vals.get("numOutputRows", 0))
        for jvm_key, out_key in _SUMMED.items():
            if jvm_key in vals:
                totals[out_key] += int(vals[jvm_key])
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    plan = df._jdf.queryExecution().executedPlan()
    walk(plan)
    return totals
