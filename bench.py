"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

By default the KG pipeline additionally runs at local[2]/local[8]/
local[<cpus>] on the same input and the line reports the two-cluster-size
throughput + scaling efficiency + raw-CPU hardware ceiling (BASELINE.md
methodology); SPARK_GRAFT_BENCH_SCALING=0 skips that for quick runs.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_pred_counts",
    "kg_components",
    "kg_entity_links",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "window_latest_event_per_user",
    "minhash_dup_pairs_docs",
    "simhash_docs",
    "ann_topk_cosine",
    # the round-3 heavy operators (VERDICT r3 #4): a regression in the most
    # expensive composed ops must be visible in BENCH_r*, not just tests
    "tfidf_top_terms_docs",
    "corpus_filter_docs",
    # the custom stateful streaming gate (VERDICT r5 #7): sessionize at
    # sf0.1 was measured once off-line (13.6 s); keep it in the recorded
    # headline with its probe bracket like every other entry
    "streaming_sessionize_events",
]


QUIET_SPEEDUP = {2: 1.7, 8: 7.8, 32: 25.8}  # measured quiet parallel speedups


def pass_quality(row: dict, cpus_list=(2, 8, 32)) -> float:
    """Window quality of one scaling pass: each config's parallel-speedup
    probe over its measured quiet value, min over configs. Probes only
    BRACKET a run — this score attests the windows, it must NOT select the
    ratio (a quiet probe can be followed by mid-run steal).

    Widths without a measured quiet baseline are skipped (ADVICE r5: with
    SPARK_GRAFT_CPUS=16 the old code raised KeyError AFTER all expensive
    passes completed); the score then attests only the calibrated widths."""
    vals = [
        row[f"probe[{c}]"] / QUIET_SPEEDUP[c]
        for c in cpus_list
        if c in QUIET_SPEEDUP and f"probe[{c}]" in row
    ]
    if not vals:
        raise ValueError(
            f"pass_quality: no config in {cpus_list} has both a quiet "
            f"baseline ({sorted(QUIET_SPEEDUP)}) and a probe in the row"
        )
    return min(vals)


def pair_ratio(pass_rows: list, a_key: str, b_key: str, factor: float):
    """Scaling efficiency for one config pair. Returns (efficiency,
    used_fallback).

    Selection: the pass maximizing the max-min-normalized pair — each
    config's throughput over its best across passes, min of the two — i.e.
    the pass where BOTH configs ran closest to their demonstrated
    capability. Contention only ever lowers tps, so this reads the timed
    intervals themselves; a plain pair SUM is dominated by the larger
    config and can pick a pass whose small config was stolen.

    Clamp: if the selected same-pass ratio exceeds 1.0 — physically
    impossible for this workload, so the windows shifted INSIDE the pass —
    fall back to the cross-best ratio (conservative: it biased DOWN 0.779
    vs 0.835/0.907 in clean sessions, which is why it is only the
    impossibility fallback, never the primary).

    Every alternative failed live in round 5: cross-best always → 0.779
    bias; max same-pass ratio → fabricated 1.129; probe-quality selection
    → 0.189 after mid-run steal under a quiet probe; pair-sum → picked the
    1.129 pass because local[8] dominated the sum. The regression locks in
    tests/test_bench_estimators.py replay each scenario."""
    best_a = max(r[a_key] for r in pass_rows)
    best_b = max(r[b_key] for r in pass_rows)
    row = max(
        pass_rows,
        key=lambda r: min(r[a_key] / best_a, r[b_key] / best_b),
    )
    eff = (row[b_key] / row[a_key]) / factor
    if eff > 1.0:
        return round((best_b / best_a) / factor, 3), True
    return round(eff, 3), False


def make_spark(cpus: int):
    from jsonld_rs_spark.conf import session_builder

    return (
        session_builder(f"local[{cpus}]", "jsonld-rs-spark-bench")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm_python_workers(spark, cpus: int) -> None:
    """Spin up the Python worker pool + Arrow path before timing — real
    clusters run long-lived executors; cold-start isn't the metric."""
    def _ident(batches):
        for pdf in batches:
            yield pdf

    spark.range(cpus * 4).repartition(cpus * 2).mapInPandas(_ident, "id long").count()


def _run(fn, spark, sf_dir, trials: int = None):
    """Best-of-N wall time: this VM is a shared-host guest with CPU steal
    (identical runs vary up to 5x under contention); min over trials
    measures the engine, not the neighbors."""
    trials = trials or int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    best = None
    n = 0
    for _ in range(trials):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        # collect, not count: count() lets Catalyst eliminate each query's
        # final global sort, understating sort-dominated queries
        n = len(df.collect())
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    # Release py4j DataFrame refs NOW: queries built on localCheckpoint
    # (CC rounds, shingle/signature tables) pin their checkpointed RDDs in
    # the JVM until Python's cyclic GC happens to run; across an 11-query
    # sweep that state inflates later queries' shuffles (observed: minhash
    # 16.3 s mid-sweep vs 8.9 s fresh-session at identical quiet probes).
    # `del df` first — a still-bound last-trial frame would survive the
    # collect and pin its state through the NEXT query's timed window
    # (review r4). The explicit collect lets ContextCleaner reclaim between
    # queries — measuring each query, not the sweep's debris.
    import gc

    del df
    gc.collect()
    return best, n


def kg_throughput(spark, sf_dir, replicate: int = None, trials: int = 3):
    """Median triples/sec of the extraction heart (pages → canonical triple
    rows). Input is materialized outside the timed window; ``replicate``
    scales the page count so every core has meaningful work.

    Default replicate matches BASELINE.md's methodology (×32 → ≥4.5 s timed
    windows on this box): at replicate=1 the timed stage is ~0.5 s and
    job-fixed overhead dominates, under-reporting the engine ~7×. The
    BENCH_r* headline must be comparable to the published baseline."""
    if replicate is None:
        replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "32"))
    from jsonld_rs_spark.pipeline.synth import latest_pages, synthesize_pages
    from jsonld_rs_spark.pipeline.triples import extract_triples

    pages = latest_pages(synthesize_pages(spark, sf_dir, replicate)).cache()
    pages.count()
    times = []
    n_triples = 0
    for _ in range(trials):
        t0 = time.monotonic()
        n_triples = extract_triples(pages).count()
        times.append(time.monotonic() - t0)
    pages.unpersist()
    times.sort()
    dt = times[len(times) // 2]
    # the sorted per-trial walls travel with the estimate: a stolen trial
    # shows up as spread in the recorded line (divergence attribution,
    # VERDICT r6 #3) instead of hiding inside the median
    return n_triples / dt, n_triples, dt, [round(x, 3) for x in times]


def stage_breakdown(sf_dir: str, n_docs: int = 1000) -> dict:
    """Single-thread per-stage wall share of the extraction heart
    (BASELINE.md methodology: extract/expand → toRDF → canonicalize),
    measured by running the same pure-Python chain the Arrow workers run,
    with each stage timed separately over a deterministic document sample.
    Shares, not absolutes: the absolute throughput number is the
    distributed kg_throughput above.

    This hand-inlines the stage sequence of triples.doc_to_quad_rows (the
    authoritative chain) to time the seams; tests/test_ops.py pins the two
    against each other by asserting identical triple counts over a shared
    sample, so a pipeline-stage change that this copy misses fails a test
    instead of silently skewing the published shares. Returns n_triples
    for that cross-check."""
    import pandas as pd

    from jsonld_rs_spark.jsonldpy import DefaultNodeGenerator, expand as _unused  # noqa: F401
    from jsonld_rs_spark.jsonldpy.context import Context
    from jsonld_rs_spark.jsonldpy.expand import expand_core
    from jsonld_rs_spark.jsonldpy.rdf import jsonld_to_rdf
    from jsonld_rs_spark.jsonldpy.urdna2015 import canonicalize_dataset
    from jsonld_rs_spark.jsonldpy import iri as iri_mod
    from jsonld_rs_spark.pipeline.context_store import BUILTIN_CONTEXTS, make_loader
    from jsonld_rs_spark.pipeline.synth import synthesize_rows
    from jsonld_rs_spark.pipeline.triples import extract_jsonld_blocks

    import json as _json

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").head(n_docs)
    pages = []
    for d in docs.itertuples():
        crawls = list(synthesize_rows(int(d.doc_id), d.text, d.lang, d.source))
        pages.append(max(crawls, key=lambda r: r["warc_ts"]))

    loader = make_loader(BUILTIN_CONTEXTS)
    cache: dict = {}
    n_triples = 0
    t = {"parse_blocks": 0.0, "expand": 0.0, "to_rdf": 0.0, "canonicalize": 0.0}
    for p in pages:
        t0 = time.perf_counter()
        blocks = []
        for b in extract_jsonld_blocks(p["html"]):
            try:
                blocks.append(_json.loads(b))
            except ValueError:
                pass  # synth plants malformed blocks; pipeline skips them too
        t["parse_blocks"] += time.perf_counter() - t0
        for doc in blocks:
            try:
                t0 = time.perf_counter()
                ctx = Context(base_iri=iri_mod.parse_base(p["url"]))
                expanded = expand_core(ctx, doc, loader, cache)
                t["expand"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                dataset = jsonld_to_rdf(expanded, DefaultNodeGenerator())
                t["to_rdf"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                canon = canonicalize_dataset(dataset)
                t["canonicalize"] += time.perf_counter() - t0
                n_triples += sum(len(qs) for qs in canon.values())
            except Exception:
                continue  # bad blocks are quarantined in the pipeline too
    total = sum(t.values()) or 1e-9
    out = {k: round(v / total, 3) for k, v in t.items()}
    out["total_sec"] = round(total, 3)
    out["n_docs"] = len(pages)
    out["n_triples"] = n_triples
    return out


def main() -> None:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, CPUS)

    # The extraction-throughput headline runs FIRST, on the freshly warmed
    # session: measuring it after an 11-query sweep reports the sweep's
    # accumulated JVM state (checkpoint RDDs, GC debt), not the engine —
    # observed 398k after the sweep vs 605k in a fresh JVM, same window.
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "32"))
    # Bracket the in-process throughput with its own window probes
    # (VERDICT r6 #3): the r6 driver line diverged 1.43x between the
    # in-process and fresh-subprocess estimators of this very number, and
    # the only probes in the line were minutes away from this window — the
    # gap could not be attributed from the artifact. One probe-justified
    # retry: when either bracket reads contended, the median is measuring
    # the neighbors, so re-run once after the spike and keep the run whose
    # brackets are quieter (never the faster run per se — window quality,
    # not outcome, picks).
    tput_probe_pre = _window_probe(CPUS)
    tps, n_triples, extract_sec, tput_trials = kg_throughput(
        spark, SF_DIR, replicate=replicate
    )
    tput_probe_post = _window_probe(CPUS)
    tput_retried = False
    if not (_probe_quiet(tput_probe_pre) and _probe_quiet(tput_probe_post)):
        time.sleep(5)
        pre2 = _window_probe(CPUS)
        tps2, n2, dt2, trials2 = kg_throughput(spark, SF_DIR, replicate=replicate)
        post2 = _window_probe(CPUS)
        tput_retried = True
        if pre2["speedup"] + post2["speedup"] > (
            tput_probe_pre["speedup"] + tput_probe_post["speedup"]
        ):
            tps, n_triples, extract_sec, tput_trials = tps2, n2, dt2, trials2
            tput_probe_pre, tput_probe_post = pre2, post2

    # Per-query window attestation (VERDICT r3 #1): the global probes below
    # are point-in-time while the headline queries run over minutes — a
    # quiet probe at the end cannot certify a window that was stolen in the
    # middle. Sample a cheap noise+width probe immediately BEFORE each
    # query's best-of-N trials and once after the last. These are sub-second
    # BRACKETS, below the repo's >=5s trustworthy-window floor (CLAUDE.md):
    # read them as supporting context around each query, never as a verdict
    # on their own (_window_probe docstring).
    from jsonld_rs_spark.pipeline import components as _components

    per_query = {}
    query_probes = {}
    cc_stats = {}
    # cc_stats attribution guard (ADVICE r4): LAST_STATS is last-writer-wins,
    # so the snapshot below is only valid if kg_components runs BEFORE any
    # other CC-running query (corpus_filter_docs). Assert the ordering here
    # instead of trusting future HEADLINE edits to remember.
    if "kg_components" in HEADLINE and "corpus_filter_docs" in HEADLINE:
        assert HEADLINE.index("kg_components") < HEADLINE.index(
            "corpus_filter_docs"
        ), "kg_components must precede corpus_filter_docs or cc_stats misattributes"
    for name in HEADLINE:
        query_probes[name] = _window_probe(CPUS)
        dt, nrows = _run(queries[name], spark, SF_DIR)
        per_query[name] = round(dt, 3)
        if nrows > 100_000:
            # Large-result attribution (VERDICT r6 #5): the timed wall above
            # collects every result row through py4j into the Python driver
            # — for minhash_dup_pairs_docs at sf0.1 that is ~1.23M pair rows,
            # and a quiet-window experiment showed the engine computes them
            # in 2.6-3.0 s while the recorded wall reads 7.3-9.2 s (the gap
            # is py4j serialization + Python tuple materialization, a
            # harness cost a 100 TB user writing to a sink never pays; it
            # also explains the r6 "regression" and the warm-up descent).
            # Record a one-shot digest-only trial (bit_xor of xxhash64 over
            # all columns: forces every row to be computed JVM-side, ships 1
            # row back) so the artifact carries the engine-only floor
            # in-line. Caveat: the aggregate lets Catalyst drop a final
            # global sort, so engine_sec is a compute floor, not a substitute
            # headline — the recorded wall stays collect-based for
            # round-over-round comparability.
            import gc

            from pyspark.sql import functions as F

            t0 = time.monotonic()
            d = queries[name](spark, SF_DIR)
            d.select(F.bit_xor(F.xxhash64(*d.columns))).collect()
            query_probes[name]["engine_sec"] = round(time.monotonic() - t0, 3)
            query_probes[name]["collect_rows"] = nrows
            del d
            gc.collect()
        if name == "kg_components":
            # kg_components cost attribution (VERDICT r3 #8): snapshot the
            # CC rounds/jobs IMMEDIATELY after its trials — corpus_filter
            # later in the sweep also runs connected_components and would
            # overwrite LAST_STATS (review r4), misattributing the stats.
            cc_stats = dict(_components.LAST_STATS)
    # Sink benchmark (VERDICT r4 #6): the bucketed write + manifest +
    # metrics path was the one pipeline stage with zero recorded wall time.
    # Probe-bracketed like every other headline entry.
    query_probes["kg_materialize"] = _window_probe(CPUS)
    mat_sec, mat_rows = _bench_materialize(spark, replicate)
    per_query["kg_materialize"] = mat_sec
    query_probes["after_last"] = _window_probe(CPUS)
    # host-noise probe: single-thread sha256 burn. ~1.2-1.6 s on a quiet
    # window of this shared-host VM; >2.5 s means neighbors are stealing CPU
    # and every wall-clock number in this line is inflated (BASELINE.md
    # methodology — identical runs vary up to 5× under contention).
    t0 = time.monotonic()
    _sha_burn(2_000_000)
    noise_probe = round(time.monotonic() - t0, 3)
    # The 1-thread probe alone cannot certify a 32-wide window: identical
    # headline runs have swung 2x+ with a quiet 1-thread probe while 32-proc
    # raw-CPU scaling collapsed (neighbor steal shows up only under width).
    # host_parallel_speedup: aggregate CPUS-proc sha256 rate over the
    # 1-thread rate — quiet ≈ 0.8×nproc EVEN past the 16 physical cores
    # (SMT threads each sustain ~0.8× a dedicated core on this workload:
    # measured ≈ 25 at nproc=32, ≈ 7.8 at nproc=8 in quiet windows); well
    # under half of that means neighbors are stealing cores and every
    # wall-clock number in this line is inflated. Read BOTH probes.
    parallel_speedup = _parallel_speedup(CPUS, 2_000_000 / max(noise_probe, 1e-9))
    result = {
        "metric": "kg_pipeline_headline_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "note": (
            "per-query: best-of-N wall over the session-cached synthetic "
            "input (page synthesis is a sandbox stand-in for a materialized "
            "crawl table); end-to-end extraction throughput is "
            "triples_per_sec, measured uncached"
        ),
        "queries": per_query,
        # the round-3 headline had 9 queries; rounds 4-6 added the heavy
        # composed ops, the sink, and the streaming gate, so `value` totals
        # are not comparable across rounds — this subtotal is (sum over the
        # original 9 only; every later addition must join this exclusion
        # list or the continuity metric silently shifts)
        "value_legacy9": round(
            sum(v for k, v in per_query.items()
                if k not in ("tfidf_top_terms_docs", "corpus_filter_docs",
                             "kg_materialize", "streaming_sessionize_events")),
            3,
        ),
        "materialize_rows_per_sec": round(mat_rows / max(mat_sec, 1e-9), 1),
        "materialize_rows": mat_rows,
        "query_probes": query_probes,
        "cc_rounds": cc_stats.get("rounds"),
        "cc_jobs": cc_stats.get("jobs"),
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "triples_per_sec": round(tps, 1),
        "n_triples": n_triples,
        "extract_sec": round(extract_sec, 3),
        "throughput_replicate": replicate,
        "throughput_probes": {"pre": tput_probe_pre, "post": tput_probe_post},
        "throughput_trials_sec": tput_trials,
        "throughput_retried": tput_retried,
        "host_noise_probe_sec": noise_probe,
        "host_parallel_speedup": parallel_speedup,
        "stage_breakdown": stage_breakdown(SF_DIR),
        "cpus": CPUS,
    }

    # ON by default (VERDICT r2 #9): BENCH_r* files persist across rounds,
    # BASELINE.md edits don't — every round's BENCH JSON should carry its
    # own two-cluster-size scaling evidence + hardware ceiling. Set
    # SPARK_GRAFT_BENCH_SCALING=0 for a quick headline-only run.
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
        # Two-cluster-size evidence (north rule). This VM's 32 "CPUs" are
        # ~16 physical cores + SMT: a pure-CPU sha256 baseline measures the
        # hardware ceiling so Spark's efficiency is judged against what the
        # box can actually deliver, and the N→4N pair with near-ideal
        # hardware headroom (2→8) is reported alongside 8→32.
        spark.stop()
        scaling = {}
        probes = {}
        # fresh subprocess per config (one JVM across sequential contexts
        # degrades); interleaved passes sample different host-noise
        # windows — per-config best is the least contaminated estimate.
        # Each subprocess self-reports ITS OWN parallel-speedup probe
        # (scaling_probes), so a contaminated config window is visible
        # next to the number it produced.
        passes = int(os.environ.get("SPARK_GRAFT_BENCH_SCALING_PASSES", "2"))
        pass_rows = []
        for _pass in range(passes):
            row = {}
            for cpus in (2, 8, CPUS):
                tps_c, probe_c = _throughput_subprocess(cpus, replicate)
                key = f"local[{cpus}]"
                row[key] = tps_c
                row[f"probe[{cpus}]"] = probe_c
                if tps_c > scaling.get(key, 0.0):
                    scaling[key] = tps_c
                    probes[key] = probe_c
            pass_rows.append(row)
        result["scaling"] = scaling
        result["scaling_probes"] = probes
        result["scaling_replicate"] = replicate
        # Efficiency ratios are taken WITHIN a pass, never across passes
        # (CLAUDE.md: compare ratios from one quiet window only) — ratio of
        # per-config bests from different windows is biased DOWN whenever
        # the small config lands a quieter window than the big one (observed
        # r5: cross-best 0.779 while same-pass pairs read 0.835/0.907).
        # The reported pass is chosen by pair_ratio's MAX-MIN-NORMALIZED
        # selection (the pass where both configs ran closest to their
        # demonstrated best), with the cross-best ratio only as the
        # impossibility fallback when the same-pass ratio exceeds 1.0.
        # NOT probe-quality selection (read 0.189 live after mid-run steal
        # under a quiet probe), NOT max ratio (kept a fabricated 1.129),
        # NOT pair-sum (magnitude-dominated, picked the 1.129 pass) — see
        # pair_ratio's docstring and tests/test_bench_estimators.py.
        # Per-pass rows + probes stay in the line; pass_quality here only
        # ATTESTS the windows (< 0.75 flags the whole gate).
        result["scaling_passes"] = pass_rows
        result["scaling_pass_quality"] = round(
            max(pass_quality(row, (2, 8, CPUS)) for row in pass_rows), 3
        )
        if result["scaling_pass_quality"] < 0.75:
            result["scaling_contended_flag"] = (
                "no pass had all configs within 75% of quiet probes — "
                "efficiency ratios untrustworthy, re-run"
            )
        # The headline throughput uses the documented least-contaminated
        # estimator (BASELINE.md methodology): best of the in-process
        # median and the fresh-subprocess passes at the same width — the
        # subprocess runs the identical measurement in a clean JVM, so
        # taking the max selects the quieter window, never a different
        # workload. The raw in-process figure stays in the line.
        key = f"local[{CPUS}]"
        result["triples_per_sec_inprocess"] = result["triples_per_sec"]
        result["triples_per_sec"] = max(result["triples_per_sec"], scaling[key])
        # estimator-divergence attestation (ADVICE r4 / VERDICT r4 #3): if
        # the best-of estimator ever exceeds the in-process median by >1.5x,
        # the two windows disagree badly enough that the headline should not
        # be trusted without re-running — flag it in-line, never silently.
        div = round(
            result["triples_per_sec"] / max(result["triples_per_sec_inprocess"], 1e-9),
            3,
        )
        result["triples_per_sec_divergence"] = div
        if div > 1.3:
            # threshold tightened 1.5 → 1.3 (VERDICT r6 #3: r6 recorded
            # 1.429 unflagged — "just under" a loose flag is still a line
            # whose two estimators disagree by 43%)
            result["triples_per_sec_divergence_flag"] = (
                "estimator max/median > 1.3x — contended window, re-run"
            )
        if div > 1.15:
            # Automatic attribution (VERDICT r6 #3): when the two
            # estimators of the same quantity disagree >15%, say WHICH
            # window was bad from the probes already in this line, instead
            # of leaving the gap for the reader to re-derive.
            inproc_quiet = _probe_quiet(tput_probe_pre) and _probe_quiet(
                tput_probe_post
            )
            sub_quiet = probes[key] >= _speedup_quiet_threshold(CPUS)
            spread = round(max(tput_trials) / max(min(tput_trials), 1e-9), 2)
            if not inproc_quiet and sub_quiet:
                why = (
                    "in-process bracket probes contended, subprocess window "
                    "quiet — the gap is host steal during the in-process "
                    "trials; the subprocess figure is the engine"
                )
            elif inproc_quiet and not sub_quiet:
                why = (
                    "subprocess probe contended, in-process brackets quiet — "
                    "best-of may still UNDER-estimate; re-run scaling"
                )
            elif not inproc_quiet:
                why = "both windows contended — whole line suspect, re-run"
            else:
                why = (
                    f"both windows probe quiet (trial spread {spread}x) — "
                    "divergence not explained by the probes; treat the "
                    "conservative in-process figure as the headline"
                )
            result["triples_per_sec_divergence_attribution"] = {
                "inprocess_brackets_quiet": inproc_quiet,
                "inprocess_trial_spread": spread,
                "subprocess_probe_speedup": probes[key],
                "verdict": why,
            }
            if inproc_quiet and sub_quiet:
                # unexplained divergence: do NOT let the favorable half win
                result["triples_per_sec"] = result["triples_per_sec_inprocess"]
        # estimator CHANGED in round 4 (was: in-process median, measured
        # after the query sweep) — recorded in-line so BENCH_r* files stay
        # self-describing across rounds
        result["triples_per_sec_estimator"] = (
            "max(in-process median pre-sweep, fresh-subprocess best at "
            f"local[{CPUS}]); rounds<=3 recorded the post-sweep in-process "
            "median"
        )
        eff28, fb28 = pair_ratio(pass_rows, "local[2]", "local[8]", 4)
        result["scaling_efficiency_2_8"] = eff28
        if fb28:
            result["scaling_efficiency_2_8_fallback"] = "cross-best (same-pass >1.0)"
        if CPUS != 8:
            eff8n, fb8n = pair_ratio(
                pass_rows, "local[8]", f"local[{CPUS}]", CPUS / 8
            )
            result[f"scaling_efficiency_8_{CPUS}"] = eff8n
            if fb8n:
                result[f"scaling_efficiency_8_{CPUS}_fallback"] = (
                    "cross-best (same-pass >1.0)"
                )
        if CPUS == 32:
            result["hardware_ceiling_8_32"] = _cpu_ceiling_8_to_32()

    print(json.dumps(result))
    # Full-line persistence (VERDICT r5 #2): BENCH_r05's recorded minhash
    # 9.95 s could not defend itself — its query_probes bracket was
    # truncated out of the driver's fixed-size stdout tail. Write the
    # COMPLETE metric line (all probes, all scaling passes) to a repo file
    # every run so every recorded per-query number's window evidence is
    # reconstructible even when the stdout tail loses it.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError as exc:  # a read-only checkout must not kill the bench
        print(f"warning: BENCH_LOCAL.json not written: {exc}", file=sys.stderr)
    # Tail-survivable summary (VERDICT r4 #2): BENCH_r04 recorded
    # parsed=null because the full line outgrew the driver's fixed-size
    # stdout tail once query_probes was added. Emit a SECOND, compact JSON
    # line — same headline fields, no probe/attestation bloat — as the LAST
    # stdout line so any tail window captures one parseable object. The full
    # self-describing line above stays for humans and BASELINE.md.
    compact_keys = (
        "metric", "value", "unit", "queries", "sf", "cpus",
        "triples_per_sec", "n_triples", "extract_sec",
        "scaling", "scaling_efficiency_2_8", f"scaling_efficiency_8_{CPUS}",
        "hardware_ceiling_8_32", "cc_rounds", "cc_jobs",
        "triples_per_sec_divergence", "scaling_pass_quality",
        "scaling_contended_flag",
    )
    compact = {k: result[k] for k in compact_keys if k in result}
    print(json.dumps(compact))


def _bench_materialize(spark, replicate: int, trials: int = None):
    """Best-of-N wall time of the SINK only: write_triples (bucketed parquet
    + manifest + metrics) into a fresh temp dir per trial, os.sync() inside
    the timed window so buffered pages are actually on disk. The triples
    input is extracted and locally checkpointed OUTSIDE the window — this
    measures the write path, not extraction (VERDICT r4 #6)."""
    import shutil
    import tempfile

    from jsonld_rs_spark.pipeline.materialize import write_manifest, write_triples
    from jsonld_rs_spark.pipeline.synth import latest_pages, synthesize_pages
    from jsonld_rs_spark.pipeline.triples import extract_triples

    pages = latest_pages(synthesize_pages(spark, SF_DIR, replicate)).cache()
    pages.count()
    triples = extract_triples(pages).localCheckpoint()
    n = triples.count()
    pages.unpersist()
    trials = trials or int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    best = None
    for _ in range(trials):
        out = tempfile.mkdtemp(prefix="bench_mat_")
        t0 = time.monotonic()
        write_triples(triples, out)
        write_manifest(spark, out, "bench", "bench", "complete", {"rows": n})
        os.sync()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
        shutil.rmtree(out, ignore_errors=True)
    del triples
    import gc

    gc.collect()
    return round(best, 3), n


def _throughput_subprocess(cpus: int, replicate: int):
    """Returns (tps, same-window parallel-speedup probe at this width)."""
    import subprocess

    code = (
        "import sys, time; sys.path.insert(0, {root!r})\n"
        "import bench\n"
        "s = bench.make_spark({cpus}); s.sparkContext.setLogLevel('ERROR')\n"
        "bench.warm_python_workers(s, {cpus})\n"
        "tps, n, dt, tri = bench.kg_throughput(s, {sf!r}, replicate={replicate})\n"
        "# best-of-2 burns: the 1-thread denominator must not be poisoned by\n"
        "# a sub-second steal spike (CLAUDE.md window rule applies to it too)\n"
        "r1 = max(bench._timed_burn(2_000_000) for _ in range(2))\n"
        "print('TPS', tps)\n"
        "print('SPD', bench._parallel_speedup({cpus}, r1))\n"
        "s.stop()\n"
    ).format(root=os.path.dirname(os.path.abspath(__file__)), cpus=cpus,
             sf=SF_DIR, replicate=replicate)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
    )
    tps = spd = None
    for line in out.stdout.splitlines():
        if line.startswith("TPS "):
            tps = round(float(line.split()[1]), 1)
        elif line.startswith("SPD "):
            spd = float(line.split()[1])
    if tps is None or spd is None:
        # a missing probe must fail as loudly as a missing throughput — a
        # null in scaling_probes would silently void the attestation
        raise RuntimeError(f"scaling subprocess failed: {out.stderr[-500:]}")
    return tps, spd


def _sha_burn(n: int) -> None:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()


def _timed_burn(n: int) -> float:
    t0 = time.monotonic()
    _sha_burn(n)
    return n / (time.monotonic() - t0)


def _parallel_speedup(nproc: int, rate1: float, per: int = 400_000) -> float:
    """Aggregate nproc-process sha256 rate over the 1-thread rate — the
    width-sensitive half of the window-quality attestation. Each worker
    times ITS OWN burn (fork/teardown excluded) and the aggregate is the
    sum of concurrent per-worker rates, so the figure reflects sustained
    parallel throughput, not pool startup (review r3: the wall-clock-
    around-the-pool version folded fork cost into a sub-second window)."""
    import multiprocessing as mp

    with mp.Pool(nproc) as pool:
        rates = pool.map(_timed_burn, [per] * nproc)
    return round(sum(rates) / rate1, 2)


def _window_probe(cpus: int, burn: int = 1_000_000) -> dict:
    """Cheap (~1.5 s) point sample of window quality, taken per headline
    query: 1-thread sha256 time normalized to the 2M-iteration reference
    burn (quiet ≈ 1.0-1.6 s), plus the width-sensitive parallel speedup
    (quiet per width in QUIET_SPEEDUP; re-measured r7 at w32: 20.2-26.7,
    NOT the 0.8×min(nproc, 16) an earlier draft claimed). Shorter burns
    than the global
    probes — a probe that cost as much as the query would double the bench —
    so single samples are noisier; read them as a bracket around each
    query, not a verdict on their own."""
    rate1 = _timed_burn(burn)
    return {
        "noise_sec": round(2_000_000 / rate1, 3),
        "speedup": _parallel_speedup(cpus, rate1, per=200_000),
    }


def _speedup_quiet_threshold(cpus: int) -> float:
    """Half the MEASURED quiet parallel speedup at this width (QUIET_SPEEDUP,
    the same table pass_quality normalizes against); 0.4×cpus only as the
    uncalibrated fallback. Review r7: the old flat 0.4×cpus formula and a
    stale '0.8×min(nproc, 16 physical)' docstring claim disagreed about what
    quiet even MEANS at width 32 — re-measured this round: quiet w32 short
    probes read 20.2-26.7 (the 25.8 table entry), so half-of-quiet is 12.9,
    which the flat formula only matched by coincidence at 32 and mis-stated
    everywhere the docstring was believed instead."""
    return 0.5 * QUIET_SPEEDUP.get(cpus, 0.8 * cpus)


def _probe_quiet(probe: dict, cpus: int = None) -> bool:
    """Window-quality test for a _window_probe sample: quiet means the
    1-thread burn is in its quiet band (<= 2.0 s normalized; quiet ≈
    1.0-1.6) AND the width probe reaches at least half the measured quiet
    parallel speedup for this width (QUIET_SPEEDUP; e.g. 25.8 at 32 →
    threshold 12.9). Conservative on purpose: a false 'contended' costs one
    extra measurement; a false 'quiet' records a stolen window as the
    engine."""
    cpus = cpus or CPUS
    return (
        probe["noise_sec"] <= 2.0
        and probe["speedup"] >= _speedup_quiet_threshold(cpus)
    )


def _cpu_ceiling_8_to_32() -> float:
    """Raw-CPU (sha256) 8→32-process scaling on this box — the upper bound
    any 8→32 software efficiency can reach here."""
    import multiprocessing as mp

    rates = {}
    for nproc in (8, 32):
        t0 = time.monotonic()
        with mp.Pool(nproc) as pool:
            pool.map(_sha_burn, [300_000] * nproc)
        rates[nproc] = nproc * 300_000 / (time.monotonic() - t0)
    return round((rates[32] / rates[8]) / 4, 3)


if __name__ == "__main__":
    main()
