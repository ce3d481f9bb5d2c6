"""Executed-plan metrics introspection.

``.explain()`` shows the plan you HOPE runs; the SQLMetrics on the
executed plan show what actually happened — rows through each
operator, shuffle bytes written/read, spill sizes, broadcast build
sizes. This module walks the executed SparkPlan tree (via the py4j
handle) after an action and returns the metrics as plain rows, so

- the bench can record shuffle volume next to wall time (a
  regression is then readable as "more data moved" vs "slower
  moving"),
- tests can pin a claim like "the ingest path shuffles zero bytes"
  on MEASURED bytes, not just on the absence of Exchange in a plan
  string,
- a 100 TB operator's memory story ("no spill") is checkable at any
  scale you can run.

Driver cost: the walk is O(plan nodes) py4j calls on an
already-finished query — no jobs, no data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan_metrics(df: DataFrame) -> list[dict]:
    """Metrics of ``df``'s EXECUTED plan as rows of
    {node_id, node, metric, value}. Call AFTER an action has run the
    frame (metrics are zero/absent before execution). AQE is handled:
    the walk descends through AdaptiveSparkPlan's final plan and
    query-stage / reused-exchange wrappers."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[dict] = []
    seen = set()

    def walk(node) -> None:
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            metric = kv._1()
            m = kv._2()
            out.append(
                {
                    "node_id": nid,
                    "node": name,
                    "metric": str(m.name().isDefined() and m.name().get() or metric),
                    "value": int(m.value()),
                }
            )
        # AQE wrappers: descend into the materialized subtree.
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec",
                     "TableCacheQueryStageExec", "ResultQueryStageExec"):
            walk(node.plan())
        elif cls == "ReusedExchangeExec":
            walk(node.child())
        ch = node.children()
        cit = ch.iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(plan)
    return out


def metrics_summary(df: DataFrame) -> dict:
    """The scale-story numbers of an executed frame in one dict:
    total shuffle bytes written, shuffle records, spill bytes
    (memory+disk), peak broadcast (build-side) data size, and the
    max rows any single operator emitted."""
    rows = executed_plan_metrics(df)

    def total(pred) -> int:
        return sum(r["value"] for r in rows if pred(r))

    return {
        "shuffle_bytes_written": total(
            lambda r: r["metric"] == "shuffle bytes written"
        ),
        "shuffle_records_written": total(
            lambda r: r["metric"] == "shuffle records written"
        ),
        "spill_bytes": total(lambda r: "spill size" in r["metric"]),
        "broadcast_bytes": total(
            lambda r: r["node"].startswith("BroadcastExchange")
            and r["metric"] == "data size"
        ),
        "max_operator_rows": max(
            (r["value"] for r in rows if r["metric"] == "number of output rows"),
            default=0,
        ),
    }


def executor_run_time_ms(spark) -> int:
    """Cumulative executor task run time (ms) summed over every stage
    the app status store still retains — the WORK counter the wall
    clock can't give you on a fixed-size machine.

    Deltas around a query isolate its total task-seconds: on a
    32-core box a linear operator fed 10x the data costs ~10x the
    task-time even when its WALL time only doubles (at small scale
    independent DAG subtrees overlap on idle cores; at large scale
    they serialize — utilization, not complexity). The sf1 scale
    probe records both, so "superlinear" accusations are made against
    work, not against scheduling.

    Caveat: the store evicts old stages past spark.ui.retainedStages
    (deltas could then shrink) — callers that diff this counter
    should raise that limit for the session. Driver cost: one py4j
    walk over retained stage summaries, no jobs."""
    sc = spark.sparkContext
    gw = sc._gateway
    empty = sc._jvm.java.util.ArrayList()
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    stages = sc._jsc.sc().statusStore().stageList(
        empty, False, False, no_quantiles, empty
    )
    total = 0
    it = stages.iterator()
    while it.hasNext():
        total += it.next().executorRunTime()
    return int(total)
