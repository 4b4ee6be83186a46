"""Workload-matched 8->32 hardware ceiling for the extraction stage.

VERDICT r4 #4 asked where the 8->32 scaling residual lives: BENCH_r04
recorded Spark extraction efficiency 0.477 against a sha256 hardware
ceiling of 0.598 (80% of silicon). This tool measures the ceiling with the
ACTUAL workload instead of sha256: the same parse->expand->toRDF->canon
chain (pipeline.triples.doc_to_quad_rows) over the same synthesized pages,
run in N independent OS processes with no Spark, no Arrow, no scheduler —
nothing but the Python workload and the silicon.

Method: synthesize all sf0.1 pages once in the parent, replicate to >=4 s
walls, fork a Pool(N) over even chunk splits, time the pool wall. Best of
``passes`` interleaved 8/32 passes (CLAUDE.md window rule: this VM has CPU
steal; interleaving samples the same windows for both widths). A 1-thread
sha256 noise probe brackets each pass.

Reading: if mp_efficiency(8->32) for the real workload lands at ~0.4-0.5,
the sha256 ceiling was an overestimate for THIS workload — extraction is
allocation/memory-heavy Python, and SMT siblings contend on the memory
subsystem far harder than on sha256's register-dense compute. In that case
Spark's 0.477 is AT the workload ceiling and the residual is attributed to
the silicon, not to Arrow batching or scheduler overhead.
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noise_probe() -> float:
    h = b"x" * 64
    t0 = time.monotonic()
    for _ in range(2_000_000):
        h = hashlib.sha256(h).digest()
    return round(time.monotonic() - t0, 3)


def _work(chunk):
    from jsonld_rs_spark.pipeline.triples import BUILTIN_CONTEXTS, doc_to_quad_rows

    counters = {"docs": 0, "blocks": 0, "triples": 0,
                "err_json": 0, "err_jsonld": 0, "err_canon": 0}
    cache = {}
    n = 0
    for row in chunk:
        html = row["html"]
        h = html if isinstance(html, bytes) else html.encode()
        n += len(doc_to_quad_rows(row["url"], h, BUILTIN_CONTEXTS, counters, cache, []))
    return n


def main():
    import pyarrow.parquet as pq

    from jsonld_rs_spark.pipeline.synth import synthesize_rows

    t = pq.read_table(os.path.join(SF, "documents.parquet")).to_pydict()
    docs = list(zip(t["doc_id"], t["text"], t["lang"], t["source"]))
    replicate = int(os.environ.get("MP_CEILING_REPLICATE", "32"))
    pages = [r for d in docs for r in synthesize_rows(int(d[0]), d[1], d[2], d[3])]
    pages = pages * replicate
    # Same-pass ratio via bench.pair_ratio (ADVICE r5, medium): the original
    # best[32]/best[8] across interleaved passes is exactly the cross-best
    # estimator CLAUDE.md forbids and bench.py replaced — it biases the
    # ceiling LOW whenever the 8-proc width lands a quieter window than the
    # 32-proc width, corrupting the residual attribution this tool exists to
    # settle. pair_ratio picks the pass where BOTH widths ran closest to
    # their demonstrated capability, with cross-best only as the >1.0
    # impossibility fallback.
    from bench import pair_ratio

    passes = int(os.environ.get("MP_CEILING_PASSES", "3"))
    best = {}
    pass_rows = []
    for p in range(passes):
        row = {}
        for nproc in (8, 32):
            probe = _noise_probe()
            chunks = [pages[i::nproc] for i in range(nproc)]
            t0 = time.monotonic()
            with mp.Pool(nproc) as pool:
                total = sum(pool.map(_work, chunks))
            wall = time.monotonic() - t0
            tps = total / wall
            print(f"pass={p} nproc={nproc} wall={wall:.3f} tps={tps:.0f} "
                  f"noise_probe={probe}s")
            row[f"mp[{nproc}]"] = tps
            if tps > best.get(nproc, 0.0):
                best[nproc] = tps
        pass_rows.append(row)
    eff, fallback = pair_ratio(pass_rows, "mp[8]", "mp[32]", 4)
    cross = (best[32] / best[8]) / 4
    print(f"BEST 8={best[8]:.0f} 32={best[32]:.0f} "
          f"mp_efficiency_8_32={eff:.3f} "
          f"({'cross-best fallback, same-pass >1.0' if fallback else 'same-pass'}; "
          f"cross-best={cross:.3f})")


if __name__ == "__main__":
    main()
