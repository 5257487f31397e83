#!/usr/bin/env python
"""Headline benchmark: index-build throughput + BM25 top-k query latency.

Default: build the packed index over ``$SPARK_GRAFT_SF_DIR/documents``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, run the
FIXTURES.md §4 document query set twice (second pass = warm numbers),
and print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...}

``--scaling``: run the same build at local[N] and local[4N] (default
4/16, see run_scaling) in fresh subprocesses — the sandbox substitute
for N vs 4N executors per the driver instruction — and append the
measured throughputs + scaling efficiency to BENCH/BASELINE.md.

Timing starts after the Spark session is up and the input row count is
known (SURVEY.md §5.5: measurement excludes session startup).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

QUERIES = {
    "q01_rare": "hash",
    "q02_hot": "the",
    "q03_and": "hash join",
    "q04_or": "hash OR join",
    "q05_lang": "lang:zh spark",
    "q06_not": "hash -join",
    "q07_and4": "scan merge window sort",
    "q08_absent": "zzzznotaterm",
    "q14_phrase": '"hash join" spark',  # v6 positional adjacency
    "q15_proximity": '"hash join"~2 spark',  # round-6 ordered window
    "q17_prefix": "s* merge",  # round-6 §3.10 startswith expansion
    "q19_fuzzy": "sort sow~1",  # round-6 §3.12 enumerated d=1 group
    # round-6 §3.19 boolean OR-group + exclusion group: pays the same
    # plan as a plain multi-term query (exact-term IN scan)
    "q25_group": "(hash OR join) sort -(dup OR slow)",
    # round-6 §3.20 minimum should match over the hot-OR shape
    "q26_msm": "the OR scan OR join min_match:2",
    # round-6 §3.24 wildcard group (prefix-bounded scan + glob narrow)
    "q28_wildcard": "s*t hash -d*p",
}

# served through parse(attr_fields=...) — n_chars range rides the
# encoded numeric attr namespace (round-6 §3.13)
ATTR_QUERIES = {
    "q20_range": "hash n_chars:400..530",
}

# code-aware pipeline over the synthetic prod-schema table (the
# north-star workload: BASELINE.json:6 code tokenization + skewed merge)
CODE_QUERIES = {
    "q09_hot_kw": "def",
    "q10_and_hot": "import return",
    "q11_compound": "parse_config",
    "q12_subtoken": "config",
    "q13_lang_hot": "lang:py def",
}


def _timed_steal(fn):
    """Run ``fn`` and return (result, wall_s, steal_pct absorbed by the
    section). BENCH_r04 printed a 1.85x phantom build regression that
    was pure hypervisor steal (CLAUDE.md: bursts vary identical runs by
    +-50%); stamping per-section steal makes every driver sample
    self-adjudicating."""
    t_tot0, t_st0 = _stat_snapshot()
    t0 = time.monotonic()
    out = fn()
    wall = time.monotonic() - t0
    t_tot1, t_st1 = _stat_snapshot()
    steal = round(100.0 * (t_st1 - t_st0) / max(1, t_tot1 - t_tot0), 1)
    return out, wall, steal


def run_bench(sf_dir: str, cpus: int, emit_json: bool = True) -> dict:
    from xsearch_spark.operators.wand import search_wand
    from xsearch_spark.plans.build_index import build_index, checkpoint_source_ids
    from xsearch_spark.plans.query import parse
    from xsearch_spark.session import get_spark
    from xsearch_spark.sources.datagen import generate_code_files
    from xsearch_spark.sources.io import read_documents, read_source

    from xsearch_spark.sources.datagen import ROWS

    sf = _sf_of(sf_dir)
    # SPARK_GRAFT_CODE_SF overrides the code_files scale independently of
    # the documents sf_dir — used for the large-input scaling evidence
    # (the N-vs-4N efficiency criterion needs enough parallel work to
    # amortize fixed cost; see BENCH/BASELINE.md Amdahl analysis)
    sf_key = os.environ.get("SPARK_GRAFT_CODE_SF") or (
        f"{sf:g}" if f"{sf:g}" in ROWS else "0.01"
    )
    code_parquet = generate_code_files(
        sf_key, os.path.join(REPO, ".cache", "code_files", f"sf{sf_key}")
    )

    spark = get_spark(
        "xsearch-bench", master=f"local[{cpus}]", shuffle_partitions=max(32, 4 * cpus)
    )
    from pyspark.sql import functions as F

    docs = read_documents(spark, sf_dir)
    n_docs = docs.count()  # session warm-up; excluded from timing
    code_src = read_source(spark, code_parquet)
    n_code = code_src.count()
    # count() is metadata-only on parquet: the content bytes stay COLD.
    # Touch them once so the timed section measures the ENGINE, not the
    # first disk read of a ~GB parquet (measured 2.4x wall difference on
    # this box between cold and warm page cache; SURVEY.md §5.5 excludes
    # environment warm-up from timing).
    docs.agg(F.sum(F.length("text"))).collect()
    code_src.agg(F.sum(F.length("content"))).collect()

    tmp_dirs: list[str] = []
    per_query: dict[str, float] = {}
    build_iters = int(os.environ.get("SPARK_GRAFT_BUILD_ITERS", "2"))
    try:
        # --- workload 1: documents table (driver fixture, base variant) --
        # best-of-N fresh builds, each stamped with the hypervisor steal
        # it absorbed: a single stolen window can no longer print a
        # phantom regression (the BENCH_r04 lesson). Each run gets a
        # fresh out dir so the checkpoint machinery never short-circuits.
        doc_walls: list[float] = []
        doc_steals: list[float] = []
        built = None
        for _ in range(build_iters):
            out = tempfile.mkdtemp(prefix="xsbench_idx_")
            tmp_dirs.append(out)
            built, wall, steal = _timed_steal(
                lambda o=out: build_index(
                    spark, docs, o,
                    text_col="text", variant="base",
                    docs_per_segment=4096, segs_per_shard=4, num_buckets=32,
                    n_docs=n_docs, fused_merge=True,
                    # v6 (round-5): the documents index carries the
                    # positional stream so q14_phrase runs; the HEADLINE
                    # code build stays non-positional for wall
                    # comparability across rounds. n_chars (round-6
                    # §3.13) is a numeric attr so q20_range/q21_sorted
                    # run index-only
                    positions=True,
                    attr_cols=("lang", "n_chars"),
                )
            )
            doc_walls.append(wall)
            doc_steals.append(steal)
        build_s = min(doc_walls)

        def _doc_queries():
            from xsearch_spark.operators.wand import (
                facet_counts,
                facet_histogram,
                field_stats,
                search_sorted,
                suggest_terms,
            )

            for _pass in range(2):  # second pass = warm
                for name, q in QUERIES.items():
                    tq = time.monotonic()
                    search_wand(built, parse(q), source_df=docs).collect()
                    per_query[name] = time.monotonic() - tq
                # round-6 Q11: full-match-set facet, index-only
                tq = time.monotonic()
                facet_counts(built, parse("hash OR join"), "lang").collect()
                per_query["q16_facet"] = time.monotonic() - tq
                # round-6 §3.11: dictionary completion (pushed
                # startswith scan + distinct over the matched slice)
                tq = time.monotonic()
                suggest_terms(built, "s", 10).collect()
                per_query["q18_suggest"] = time.monotonic() - tq
                # round-6 §3.13/§3.14: numeric range filter (pushed
                # term-interval scan) and sort-by-field pagination
                for name, q in ATTR_QUERIES.items():
                    tq = time.monotonic()
                    search_wand(
                        built, parse(q, attr_fields=("lang", "n_chars"))
                    ).collect()
                    per_query[name] = time.monotonic() - tq
                tq = time.monotonic()
                search_sorted(
                    built,
                    parse("hash OR join", attr_fields=("lang", "n_chars")),
                    "n_chars",
                    ascending=False,
                    k=10,
                    offset=5,
                ).collect()
                per_query["q21_sorted"] = time.monotonic() - tq
                # round-6 §3.14 cursor page: fixed mid-range cursor —
                # the pushed encoded-term bound means this should never
                # be SLOWER than q21_sorted's offset page
                tq = time.monotonic()
                search_sorted(
                    built,
                    parse("hash OR join", attr_fields=("lang", "n_chars")),
                    "n_chars",
                    ascending=False,
                    k=10,
                    after=(500, 0),
                ).collect()
                per_query["q22_cursor"] = time.monotonic() - tq
                # round-6 §3.17: match-set stats + histogram (index-only
                # partial-agg reads of the numeric attr postings)
                tq = time.monotonic()
                field_stats(
                    built,
                    parse("hash OR join", attr_fields=("lang", "n_chars")),
                    "n_chars",
                ).collect()
                per_query["q23_stats"] = time.monotonic() - tq
                tq = time.monotonic()
                facet_histogram(
                    built,
                    parse("hash OR join", attr_fields=("lang", "n_chars")),
                    "n_chars",
                    100,
                ).collect()
                per_query["q24_histogram"] = time.monotonic() - tq
                # round-6 §3.23: relevance-order cursor page (deep page
                # cost == page-1 cost; fixed mid-order cursor)
                from xsearch_spark.operators.wand import search_after_topk

                tq = time.monotonic()
                search_after_topk(
                    built,
                    parse("the OR scan OR join"),
                    k=10,
                    after=(1.0, 0),
                ).collect()
                per_query["q27_score_cursor"] = time.monotonic() - tq
                # round-6 §3.28/§3.29: phrase-prefix (positional union
                # slot + pushed expansion) and field collapse (window
                # over the index-only facet join)
                from xsearch_spark.operators.wand import search_collapse

                tq = time.monotonic()
                search_wand(built, parse('"hash jo*" spark')).collect()
                per_query["q29_phrase_prefix"] = time.monotonic() - tq
                tq = time.monotonic()
                search_collapse(
                    built, parse("hash OR join"), "lang", k=10, per_value=2
                ).collect()
                per_query["q30_collapse"] = time.monotonic() - tq

        # query sections carry their own steal stamp too (round 6): the
        # r5->r6 adjudication showed query-latency regressions can be
        # pure host window — make every driver sample self-adjudicating
        _, _, doc_q_steal = _timed_steal(_doc_queries)

        # --- workload 2: code_files (prod schema, code-aware variant) ----
        # ids are checkpointed (stage 0) so the window shuffle runs once,
        # not once per consumer; the build itself is the fused one-lineage
        # topology (pack -> cached runs -> merge) — see build_index.
        # Best-of-N with per-run steal, each run doing the FULL timed
        # span (own ids checkpoint + build) so walls stay comparable
        # with prior rounds' single-run numbers.
        code_walls: list[float] = []
        code_steals: list[float] = []
        built_code, code_ids = None, None
        for _ in range(build_iters):
            out_code = tempfile.mkdtemp(prefix="xsbench_codeidx_")
            tmp_dirs.append(out_code)

            def _code_build(o=out_code):
                ids, _n = checkpoint_source_ids(spark, code_src, o)
                bi = build_index(
                    spark, ids, o,
                    text_col="content", variant="code",
                    docs_per_segment=4096, segs_per_shard=4, num_buckets=64,
                    n_docs=n_code, fused_merge=True,
                )
                return ids, bi

            (code_ids, built_code), wall, steal = _timed_steal(_code_build)
            code_walls.append(wall)
            code_steals.append(steal)
        code_build_s = min(code_walls)

        def _code_queries():
            for _pass in range(2):
                for name, q in CODE_QUERIES.items():
                    tq = time.monotonic()
                    search_wand(
                        built_code, parse(q, "code"), source_df=code_ids
                    ).collect()
                    per_query[name] = time.monotonic() - tq

        _, _, code_q_steal = _timed_steal(_code_queries)

        # batched query throughput: the whole doc+code query set, each
        # set as ONE Spark job (the serving path — per-job overhead
        # amortized across queries)
        from xsearch_spark.operators.wand import search_wand_batch

        def _batch():
            search_wand_batch(
                built, {n: parse(q) for n, q in QUERIES.items()}, source_df=docs
            ).collect()
            search_wand_batch(
                built_code,
                {n: parse(q, "code") for n, q in CODE_QUERIES.items()},
                source_df=code_ids,
            ).collect()

        _, batch_wall, batch_steal = _timed_steal(_batch)
        batch_qps = (len(QUERIES) + len(CODE_QUERIES)) / batch_wall

        # --- workload 3: ANN probe vs brute-force over the embeddings ----
        # (round-3: the persisted bucket-partitioned index makes a probe a
        # pruned partition read; record both so the speedup is measured,
        # not claimed)
        from xsearch_spark.operators.similarity import (
            ann_index_topk,
            build_ann_index,
            cosine_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvecs = [
            r["embedding"]
            for r in emb.filter("vec_id < 8").orderBy("vec_id").select("embedding").collect()
        ]
        qvec = qvecs[0]
        ann_dir = tempfile.mkdtemp(prefix="xsbench_ann_")
        try:
            tq = time.monotonic()
            ann = build_ann_index(spark, emb, ann_dir, num_planes=8)
            ann_build_s = time.monotonic() - tq  # kept out of query p50
            for _pass in range(2):  # second pass = warm
                tq = time.monotonic()
                cosine_topk(emb, qvec, k=10).collect()
                per_query["ann_brute"] = time.monotonic() - tq
                tq = time.monotonic()
                ann_index_topk(ann, qvec, k=10, probe_hamming=2).collect()
                per_query["ann_probe"] = time.monotonic() - tq
                tq = time.monotonic()
                ann_index_topk(ann, qvec, k=10, probe_hamming=4).collect()
                per_query["ann_probe_hr"] = time.monotonic() - tq
            # recall@10 vs exact brute force over the bench query-vector
            # set, at the serving default (hamming=2) AND the dialed-up
            # points — the trade-off is a tracked CURVE, not one number
            # (round-5 verdict item 4). These embeddings are isotropic
            # (similarity.DEFAULT_PROBE_HAMMING docstring has the
            # analysis): high recall requires a wide probe BY DATA, so
            # the curve is the honest report.
            brutes = {}
            for i, v in enumerate(qvecs):
                brutes[i] = {r["vec_id"] for r in cosine_topk(emb, v, k=10).collect()}
            recall_curve = {}
            for h in (2, 3, 4):
                hits, want = 0, 0
                for i, v in enumerate(qvecs):
                    probe = {
                        r["vec_id"]
                        for r in ann_index_topk(ann, v, k=10, probe_hamming=h).collect()
                    }
                    hits += len(brutes[i] & probe)
                    want += len(brutes[i])
                recall_curve[f"hamming{h}"] = round(hits / max(1, want), 4)
            ann_recall = recall_curve["hamming2"]  # at the serving default
            ann_recall_hr = recall_curve["hamming4"]
        finally:
            shutil.rmtree(ann_dir, ignore_errors=True)

        lat = sorted(per_query.values())
        p50 = lat[len(lat) // 2]
        total = build_s + code_build_s + sum(per_query.values())
        result = {
            "metric": "index_build_plus_bm25_topk_warm",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {
                "index_build_documents": round(build_s, 3),
                "index_build_code": round(code_build_s, 3),
                "ann_index_build": round(ann_build_s, 3),
                **{k: round(v, 4) for k, v in per_query.items()},
            },
            "sf": sf,
            "n_docs": n_docs,
            "n_code_docs": n_code,
            "docs_per_sec": round(n_code / code_build_s, 1),
            "query_p50_sec": round(p50, 4),
            "batch_qps": round(batch_qps, 1),
            "ann_recall_at_10": ann_recall,
            "ann_recall_at_10_hr": ann_recall_hr,
            "ann_recall_curve": recall_curve,
            # self-adjudication (round-4 verdict item 1): all build walls
            # + the hypervisor steal each absorbed; headline build times
            # above are best-of-N
            "build_runs": {
                "documents": [round(w, 3) for w in doc_walls],
                "code": [round(w, 3) for w in code_walls],
            },
            "steal_pct": {
                "documents_builds": doc_steals,
                "code_builds": code_steals,
                "doc_queries": doc_q_steal,
                "code_queries": code_q_steal,
                "batch": batch_steal,
            },
            "cpus": cpus,
        }
        if emit_json:
            print(json.dumps(result))
        return result
    finally:
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _kernel_probe(code_parquet: str, procs: int, n_docs: int = 20_000) -> float:
    """Raw tokenize-kernel throughput (docs/s) at ``procs`` processes —
    the hardware+Python ceiling the engine is measured against. Runs the
    exact hot kernel (operators.build.count_batch) over a sample of the
    same corpus via plain multiprocessing: no Spark, no shuffle, no
    Arrow. Best-of-2 (hypervisor steal arrives in bursts)."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(code_parquet)
    texts = []
    for batch in pf.iter_batches(columns=["content"], batch_size=10_000):
        texts.extend(batch.column(0).to_pylist())
        if len(texts) >= n_docs:
            break
    texts = texts[:n_docs]
    pinned = os.environ.get("SPARK_GRAFT_PIN") == "1"
    old_aff = os.sched_getaffinity(0)
    best = 0.0
    try:
        if pinned:  # children inherit affinity: same cpuset as the engine
            os.sched_setaffinity(0, set(range(procs)))
        for _ in range(2):
            chunks = [texts[i::procs] for i in range(procs)]
            t0 = time.monotonic()
            with mp.Pool(procs) as pool:
                pool.map(_kernel_work, chunks)
            best = max(best, len(texts) / (time.monotonic() - t0))
    finally:
        if pinned:
            os.sched_setaffinity(0, old_aff)
    return round(best, 1)


def _kernel_work(chunk_texts: list) -> int:
    import numpy as np
    import pandas as pd

    from xsearch_spark.operators.build import count_batch

    r = count_batch(
        pd.Series(chunk_texts), np.arange(len(chunk_texts), dtype=np.int64), "code"
    )
    return 0 if r is None else len(r[0])


def _stat_snapshot() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat — lets each scaling
    run report the hypervisor steal it actually absorbed. Note: the guest
    cannot pin SMT siblings (checked: every vCPU's thread_siblings_list
    is itself — host-level SMT sharing is invisible here), so measured
    steal%% is the only way to tag quiet vs stolen windows."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[7]


def run_scaling(sf_dir: str) -> None:
    """N vs 4N scaling evidence (BASELINE.json:14): same input, local[N]
    vs local[4N], fresh JVM each, efficiency = (thr_4N/thr_N)/4.

    Default pair 4/16: a raw-CPU microbenchmark (BENCH/BASELINE.md) shows
    this VM's 32 vCPUs are SMT/oversubscribed — plain multiprocessing
    sha256 scales 8->32 at only 2.4x (0.60), so no engine could hit 0.8
    there; 4->16 the hardware gives 3.7x (0.93), making it the honest
    N-vs-4N probe of ENGINE scaling. Override with
    SPARK_GRAFT_SCALING_CORES="8,32".

    Alongside the engine, the raw tokenize KERNEL (count_batch via plain
    multiprocessing — no Spark) is probed at the same core counts: the
    kernel curve is this box's ceiling for the dominant parallel section,
    and engine_eff / kernel_eff separates engine-owned overhead from
    hardware (cumulative hypervisor steal here is ~47% of user time, in
    bursts — single samples conflate the two).
    """
    lo, hi = (
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "4,16").split(",")
    )
    iters = int(os.environ.get("SPARK_GRAFT_SCALING_ITERS", "2"))
    results = {}
    for cpus in (lo, hi):
        best = None
        for _ in range(iters):
            # best-of-N per config: min-wall is the standard noisy-host
            # protocol (steal spikes would otherwise be attributed to
            # the engine); each run also records the steal%% it absorbed
            env = dict(
                os.environ,
                SPARK_GRAFT_SF_DIR=sf_dir,
                SPARK_GRAFT_CPUS=str(cpus),
                # scaling children run ONE cold build each (fresh JVM,
                # same protocol as every prior round): the default
                # in-process best-of-2 reports the WARM-JVM wall, which
                # flatters the small config (JIT warmup is a larger
                # share of its first build) and corrupts the N-vs-4N
                # ratio — measured: 4-core docs/s jumped 1191->1580
                # under best-of-2 while 16-core stayed ~1600.
                SPARK_GRAFT_BUILD_ITERS=os.environ.get(
                    "SPARK_GRAFT_SCALING_BUILD_ITERS", "1"
                ),
            )
            cmd = [sys.executable, os.path.abspath(__file__)]
            if os.environ.get("SPARK_GRAFT_PIN") == "1":
                # pin the WHOLE run (JVM + Python workers) to a cpuset of
                # exactly `cpus` vCPUs: an unpinned local[N] run spreads
                # its N JVM threads + N Python workers over every idle
                # core of the box, which flatters the small config — a
                # real cluster's N-core executor is containerized to N
                # cores for both. Pinned N vs 4N is the faithful model of
                # "N vs 4N executors" on one box.
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            s0_tot, s0_st = _stat_snapshot()
            out = subprocess.run(
                cmd,
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            s1_tot, s1_st = _stat_snapshot()
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            # whole-run steal (run_bench's own steal_pct key holds the
            # per-build-section breakdown)
            r["steal_pct_run"] = round(
                100.0 * (s1_st - s0_st) / max(1, s1_tot - s0_tot), 1
            )
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        results[cpus] = best

    from xsearch_spark.sources.datagen import ROWS

    sf_key = os.environ.get("SPARK_GRAFT_CODE_SF") or (
        f"{_sf_of(sf_dir):g}" if f"{_sf_of(sf_dir):g}" in ROWS else "0.01"
    )
    code_parquet = os.path.join(
        REPO, ".cache", "code_files", f"sf{sf_key}", "code_files.parquet"
    )
    kern = {c: _kernel_probe(code_parquet, c) for c in (lo, hi)}

    thr_lo = results[lo]["docs_per_sec"]
    thr_hi = results[hi]["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    kern_eff = (kern[hi] / kern[lo]) / (hi / lo)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")

    def row(c: int) -> str:
        r = results[c]
        return (
            f"| {c} | {r['queries']['index_build_documents']} "
            f"| {r['queries']['index_build_code']} | {r['docs_per_sec']} "
            f"| {kern[c]} | {r['query_p50_sec']} | {r.get('steal_pct_run', '?')} |"
        )

    with open(md, "a") as f:
        pin_note = (
            " [PINNED cpusets: each config confined to exactly its core "
            "count — the faithful N-vs-4N-executor model]"
            if os.environ.get("SPARK_GRAFT_PIN") == "1"
            else ""
        )
        f.write(
            f"\n## Scaling run {stamp} — {sf_dir} "
            f"(code_files n={results[hi]['n_code_docs']}){pin_note}\n\n"
            f"| cores | docs build sec | code build sec | code docs/sec "
            f"| kernel docs/sec | query p50 sec | steal % |\n"
            f"|---|---|---|---|---|---|---|\n{row(lo)}\n{row(hi)}\n\n"
            f"**Engine scaling efficiency ({lo} -> {hi} cores): {eff:.3f}**; "
            f"tokenize-kernel (hardware ceiling) efficiency: {kern_eff:.3f}; "
            f"engine/kernel ratio: {eff / kern_eff:.3f} "
            f"(threshold >= 0.8, BASELINE.json:14; throughput = code_files "
            f"docs indexed / build sec incl. ids checkpoint, fresh JVM per "
            f"size, best-of-{iters}; steal %% = hypervisor steal absorbed "
            f"by the best run of each config)\n"
        )
    print(
        json.dumps(
            {
                f"thr{lo}": thr_lo,
                f"thr{hi}": thr_hi,
                "efficiency": round(eff, 3),
                f"kernel{lo}": kern[lo],
                f"kernel{hi}": kern[hi],
                "kernel_efficiency": round(kern_eff, 3),
                "steal_pct": {
                    str(c): results[c].get("steal_pct_run") for c in (lo, hi)
                },
            }
        )
    )


def _default_cpus() -> int:
    """Sweet-spot parallelism for this box. The 32 vCPUs are
    SMT-oversubscribed with bursty hypervisor steal (BENCH/BASELINE.md):
    measured build throughput peaks around 16 threads (string-heavy
    stages saturate memory bandwidth first), so the default caps there
    rather than blindly taking every vCPU. Override: SPARK_GRAFT_CPUS."""
    return min(16, os.cpu_count() or 16)


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or _default_cpus()
        run_bench(sf_dir, cpus)
