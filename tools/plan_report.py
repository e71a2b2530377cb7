"""Generate PLANS.md: a per-registry-query physical-plan feature table.

Machine-generated evidence for the plan claims in SCALE.md/COVERAGE.md —
for every registry query (at sf0.001, streaming/eager queries excluded
from plan inspection where noted), count Exchange (shuffle) nodes and
record whether the executed plan broadcasts, pushes filters to parquet,
or drops to row-Python.

Usage: python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

# Streaming queries (drained at build; their work is micro-batch plans
# under StreamExecution, not comparable one-shot SQL executions): plan
# features stay n/a with the reason.
STREAMING_ON_BUILD = {
    "q31_streaming_window": "streaming (drained; plan = memory sink)",
    "q34_stateful_running_totals": "streaming stateful (drained)",
    "q50_streaming_dedup": "streaming (drained)",
    "q63_stream_stream_join": "streaming join (drained)",
    "q117_streaming_cdc_apply": "streaming stateful upsert (drained)",
    "q133_stream_static_join": "streaming (drained; plan = memory sink)",
    "q136_streaming_quantile_sketch": "streaming stateful sketch (drained; compacted sink read)",
}

# Queries whose stages EXECUTE when built (eager two-pass / iterative
# checkpointed rounds): the returned frame is an RDD scan, but every
# stage that ran IS visible in the SQL status store — r11 verdict task 5
# closed the "— eager" blind spot by auditing the union of those staged
# executions' (Final-Plan) descriptions instead of reporting n/a.
EXECUTES_ON_BUILD = {
    "q58_vocab_coverage": "eager two-pass (checkpointed result)",
    "q22_minhash_lsh_dedup": "eager (checkpointed pair set)",
    "q23_simhash_dedup": "eager (checkpointed pair set)",
    "q47_dedup_pipeline": "eager (checkpointed stages)",
    "q43_dedup_clusters": "iterative (checkpointed rounds)",
    "q72_near_dup_scalable": "eager (checkpointed pair set)",
    "q104_bloom_decontamination": "eager (bitmap built at call; checkpointed result)",
    "q108_semdedup": "eager (quantizer trained at call; checkpointed kept set)",
    "q99_prefix_filter_similarity_join": "eager (persisted shingle base; checkpointed pair set)",
    "q125_kmv_set_ops": "eager (checkpointed input sketches)",
    "q127_quantile_estimate": "eager (checkpointed sketch base)",
    "q128_triangle_counts": "eager (checkpointed edge/orientation bases)",
    "q137_clustering_coefficient": "eager (checkpointed edge/orientation bases)",
    "q130_pmi_bigrams": "eager (persisted token arrays; checkpointed result)",
    "q131_skyline_pareto": "eager two-pass (checkpointed result)",
    "q132_rrf_hybrid_fusion": "eager (checkpointed input rankings)",
    "q114_pagerank": "iterative (checkpointed per-iteration ranks)",
    "q153_hits": "iterative (checkpointed hub/auth rounds; broadcast-round"
    " plan, see operators/graph.py:hits_fixed_point)",
    "q149_label_propagation": "iterative (checkpointed rounds; per-round"
    " plan pinned exchange-free by tests/test_graph.py)",
    "q151_bfs_distances": "iterative (checkpointed frontier rounds)",
    "q198_weighted_sssp": "iterative (checkpointed relaxation rounds)",
    "q100_unigram_surprisal": "eager (persisted token stream; checkpointed result)",
    "q103_tfidf_topk": "eager (persisted tf base; checkpointed result)",
    "q106_bm25_topk": "eager (persisted tok/dl bases; checkpointed result)",
    "q107_dsir_importance": "eager (persisted token stream; checkpointed result)",
    "q119_substring_dedup": "eager (persisted token stream; checkpointed result)",
    "q206_phash_near_dup": "eager (checkpointed pair set)",
    # r12: four eager composites the r11 audit fix missed — their rows
    # showed only the (near-vacuous) lazy tail after the checkpointed
    # stages ran at build.
    "q142_kcore": "iterative (checkpointed peeling rounds)",
    "q195_incremental_near_dup": "eager (persisted shingle base; checkpointed pair set)",
    "q200_leakage_safe_split": "eager (PPJoin pair engine + checkpointed CC labels)",
    "q202_cluster_representatives": "eager (PPJoin pair engine + checkpointed CC labels)",
    "q157_entity_resolution": "eager CC stage (checkpointed rounds) + lazy rollup tail",
    # r13: q188 moved from chained global ranks to collected quartile
    # boundaries (operators/rankstats.py) — boundary finding executes
    # at build, the census result is checkpointed.
    "q188_rfm_segments": "eager (boundary lookups at call; checkpointed census)",
}


def _final_section(desc: str) -> str:
    """The Final-Plan (or mid-adaptive Current-Plan) slice of a
    status-store physicalPlanDescription — AQE descriptions render the
    live plan AND '== Initial Plan ==' for the same query; counting
    both would double every exchange."""
    for marker in ("== Final Plan ==", "== Current Plan =="):
        i = desc.find(marker)
        if i >= 0:
            j = desc.find("== Initial Plan ==", i)
            return desc[i:j] if j > 0 else desc[i:]
    return desc


def _max_exec_id(spark) -> int:
    lst = spark._jsparkSession.sharedState().statusStore().executionsList()
    m = -1
    for i in range(lst.size()):
        m = max(m, lst.apply(i).executionId())
    return m


def _exec_descs_since(spark, after_id: int) -> list[str]:
    """Final-Plan descriptions of every SQL execution with id > after_id
    (the stages an eager/iterative query ran while being built).

    The SQL status store is fed by an ASYNC listener bus: right after an
    eager query returns, its execution events (and AQE plan updates) can
    still be queued — observed in the full-registry run as a staged exec
    whose description lacked the real plan (q206 read '~0 exchanges' in
    the big sweep but 4 in a fresh session).  Poll until two consecutive
    reads agree on the exec set and description sizes (bounded at ~3 s).
    """
    import time

    def snap():
        lst = (
            spark._jsparkSession.sharedState().statusStore().executionsList()
        )
        out = []
        for i in range(lst.size()):
            e = lst.apply(i)
            if e.executionId() > after_id:
                out.append(_final_section(e.physicalPlanDescription()))
        return out

    prev = snap()
    for _ in range(10):
        time.sleep(0.3)
        cur = snap()
        if len(cur) == len(prev) and [len(d) for d in cur] == [
            len(d) for d in prev
        ]:
            return cur
        prev = cur
    return prev


def main() -> None:
    from etl_marketeye_airflow_spark import queries as reg
    from etl_marketeye_airflow_spark.plans import executed_plan, pushed_filters
    from etl_marketeye_airflow_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    # the store caps retained executions (default 1000) — more than any
    # single query's stage count, but raise it to be safe across a run
    # note: conf is read at SharedState creation, so set via get_spark
    # would be needed for a lower default; 1000 is plenty per query
    # because the store is diffed per query (after_id watermark).

    print("# PLANS — per-query physical-plan features (auto-generated)")
    print()
    print(f"`python tools/plan_report.py` over the registry at sf0.001.")
    print("Exchanges = shuffle boundaries in the executed plan (AQE may")
    print("coalesce at runtime); Broadcast = BroadcastHashJoin present;")
    print("Pushed = parquet-level PushedFilters non-empty; RowPy =")
    print("row-at-a-time Python (BatchEvalPython — allowlisted demos only).")
    print()
    print("Eager/iterative queries (stages execute at build) report the")
    print("UNION over their staged SQL executions' Final-Plan descriptions")
    print("(status store, diffed per query): exchanges is the staged total")
    print("(marked `~N/K execs` — iterative rounds repeat their per-round")
    print("plan, and persisted-cache re-renders can inflate it), feature")
    print("flags are any-stage presence.  Streaming queries stay n/a.")
    print()
    print("| query | exchanges | broadcast | pushed filters | row-python |")
    print("|---|---|---|---|---|")
    for name, fn in sorted(reg.QUERIES.items()):
        if name in STREAMING_ON_BUILD:
            print(f"| {name} | — | — | — | — ({STREAMING_ON_BUILD[name]}) |")
            continue
        staged = name in EXECUTES_ON_BUILD
        try:
            before = _max_exec_id(spark) if staged else -1
            df = fn(spark, SF)
            plan = executed_plan(df)
            plans = [plan]
            tag = ""
            if staged:
                descs = _exec_descs_since(spark, before)
                plans = descs + [plan]
                tag = f" (~{len(descs)} staged execs; {EXECUTES_ON_BUILD[name]})"
            n_ex = sum(len(re.findall(r"\bExchange\b", p)) for p in plans)
            ex_s = f"~{n_ex}" if staged else str(n_ex)
            bc = "yes" if any("BroadcastHashJoin" in p for p in plans) else ""
            pushed = "yes" if (
                pushed_filters(df)
                or any(
                    re.search(r"PushedFilters: \[(?!\])", p) for p in plans
                )
            ) else ""
            rowpy = "YES" if any("BatchEvalPython" in p for p in plans) else ""
            print(f"| {name} | {ex_s} | {bc} | {pushed} | {rowpy}{tag} |")
        except Exception as e:  # pragma: no cover - report, don't die
            print(f"| {name} | ? | ? | ? | error: {str(e)[:60]} |")
        finally:
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
