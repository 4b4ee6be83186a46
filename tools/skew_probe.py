"""Hub-skew evidence for the melt canonicalize (VERDICT r6 #4).

The r6 melt rewrite (pipeline/components.py:canonicalize_subjects) was a
static-plan win (20->8 exchanges); its 100x risk is hub skew: one entity id
carrying a large fraction of the melted key rows. This probe synthesizes a
hub-heavy corpus — one component holding ~20% of all nodes, three hub
member ids carrying ~30% of all triples — and records:

  (a) melt == joinwise on the hub graph (distributed multiset digest);
  (b) the narrow keys-x-components join AQE-SKEW-SPLITS instead of
      stalling one task, with broadcast disabled so the sort-merge path
      (the shape a 100 TB components table forces) is actually exercised.

AQE's skew thresholds default to 256 MB / factor 5 — sized for real
clusters; at sandbox volume (tens of MB per skewed partition) they are
scaled down proportionally, which demonstrates the MECHANISM without
pretending sandbox bytes are cluster bytes (the thresholds a production
deployment uses are the defaults).

Writes a marker-delimited section at the end of PLANS.md (idempotent
replace); tools/explain_audit.py preserves the section when regenerating.

Usage: python tools/skew_probe.py [n_triples] (default 3_000_000)
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

MARKER_BEGIN = "<!-- SKEW_PROBE_BEGIN -->"
MARKER_END = "<!-- SKEW_PROBE_END -->"

N_NODES = 200_000
HUB_SHARE = 0.2  # one component holds 20% of all nodes
HOT_SUBJ_SHARE = 0.3  # three hub member ids carry 30% of all triples


def synth(spark, n_triples: int, lit_bytes: int = 0):
    """Deterministic hub-heavy (triples, components) pair.

    ``lit_bytes`` pads every literal obj_value with that many filler bytes —
    the fat-literal profile models a real corpus, where text payloads
    dominate row bytes and the melt's literals-never-cross-a-rewrite-
    exchange property is the one that pays.

    components: node e<i> for i in [0, N_NODES); nodes with i < 20% of
    N_NODES form ONE component (representative e0); the rest pair up
    (2i, 2i+1) -> min.  Built directly (not via connected_components) so
    the probe isolates the melt, not CC.

    triples: 30% of rows concentrate their subj on three hub members
    (e1, e2, e3 — rewritable, heavy); the rest draw subj uniformly from
    all nodes. 25% of rows are id-objects pointing at uniform nodes, the
    rest string literals. graph is the default marker (non-rewritable)
    for 90% of rows and a hub member for 10%.
    """
    from pyspark.sql import functions as F

    hub_n = int(N_NODES * HUB_SHARE)
    nodes = spark.range(N_NODES).select(
        F.concat(F.lit("http://e/e"), F.col("id")).alias("node"),
        F.when(F.col("id") < hub_n, F.lit("http://e/e0"))
        .otherwise(
            F.concat(
                F.lit("http://e/e"),
                (F.col("id") - F.pmod(F.col("id"), F.lit(2))),
            )
        )
        .alias("component"),
    )
    # deterministic pseudo-random draws from the row index (no RNG state)
    t = spark.range(n_triples)
    h = F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000))
    hot = h < int(HOT_SUBJ_SHARE * 1_000_000)
    uni = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(N_NODES))
    obj_uni = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(N_NODES))
    is_id = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(4)) == 0  # 25%
    graph_hub = F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(10)) == 0
    triples = t.select(
        F.concat(F.lit("http://crawl/p"), F.pmod(F.col("id"), F.lit(50_000))).alias(
            "url"
        ),
        F.when(
            graph_hub,
            F.concat(F.lit("http://e/e"), F.pmod(F.col("id"), F.lit(3)) + 1),
        )
        .otherwise(F.lit("@default"))
        .alias("graph"),
        F.when(
            hot, F.concat(F.lit("http://e/e"), F.pmod(F.col("id"), F.lit(3)) + 1)
        )
        .otherwise(F.concat(F.lit("http://e/e"), uni))
        .alias("subj"),
        F.concat(F.lit("http://schema.org/p"), F.pmod(F.col("id"), F.lit(20))).alias(
            "pred"
        ),
        F.when(is_id, F.lit("id")).otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(is_id, F.concat(F.lit("http://e/e"), obj_uni))
        .otherwise(
            F.concat(
                F.lit("value "),
                F.col("id"),
                F.lit(" "),
                # realistic-entropy filler: hex is ~2x compressible under
                # lz4, like natural text — constant filler ("xxxx...")
                # compresses to nothing and falsely zeroes literal bytes
                # out of the shuffle comparison
                *[
                    F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 256)
                    for i in range(max(0, lit_bytes) // 64)
                ],
            )
        )
        .alias("obj_value"),
        F.when(is_id, F.lit(None).cast("string"))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string"))
        .alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )
    return triples, nodes


def digest(df):
    """(row count, order-independent multiset digest, the EXECUTED digest df).

    The third element matters: with AQE, a DataFrame's queryExecution holds
    the final adaptive plan only for the dataframe an action actually ran
    on — deriving a new select() yields a fresh, never-executed plan
    (isFinalPlan=false) whose skew/broadcast decisions were never made."""
    from pyspark.sql import functions as F

    dd = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("d"),
    )
    row = dd.collect()[0]
    return row["n"], row["d"], dd


_UNIT = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}


def _drain_listener_bus(spark, timeout_s: float = 30.0) -> None:
    """Block until the async listener bus has delivered all queued events.
    The SQL status store is fed by this bus, so reading it right after
    collect() races the delivery thread (review r7: the 'most recent
    execution' could be stale or carry partial metrics). waitUntilEmpty is
    private[spark] in Scala, which compiles to public bytecode — the
    standard py4j test hook; signature changed across Spark versions, so
    try no-arg then (timeoutMillis)."""
    bus = spark.sparkContext._jsc.sc().listenerBus()
    try:
        bus.waitUntilEmpty()
    except Exception:
        bus.waitUntilEmpty(int(timeout_s * 1000))


def latest_exec_id(spark) -> int:
    """Highest SQL executionId currently in the status store (-1 if none).
    Taken BEFORE a measured action, it scopes the metric read to executions
    the action itself created."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    n = execs.size()
    return execs.apply(n - 1).executionId() if n else -1


def shuffle_bytes_since(spark, prev_id: int, timeout_s: float = 30.0) -> int:
    """Sum of 'shuffle bytes written' across every SQL execution with
    id > prev_id, read from the SQL status store (public Spark status API).
    Drains the listener bus first, then polls until at least one newer
    execution is visible (review r7: the bus is async — an immediate read
    could attribute bytes to the preceding checkpoint's execution). Summing
    ALL newer executions, not just the last, also counts the per-round
    localCheckpoint shuffles a CC-backed operator runs before the final
    digest. The store formats size metrics as
    'total (min, med, max …)\\n12.3 MiB (…)' — the first size token is the
    total."""
    deadline = time.monotonic() + timeout_s
    store = spark._jsparkSession.sharedState().statusStore()
    while True:
        _drain_listener_bus(spark, timeout_s)
        if latest_exec_id(spark) > prev_id:
            break
        if time.monotonic() > deadline:
            raise RuntimeError(
                f"no SQL execution newer than {prev_id} appeared in "
                f"{timeout_s}s — nothing to attribute shuffle bytes to"
            )
        time.sleep(0.2)
    total = 0
    execs = store.executionsList()
    for i in range(execs.size()):
        e = execs.apply(i)
        if e.executionId() <= prev_id:
            continue
        id2name = {}
        it = e.metrics().iterator()
        while it.hasNext():
            m = it.next()
            id2name[m.accumulatorId()] = m.name()
        vit = store.executionMetrics(e.executionId()).iterator()
        while vit.hasNext():
            kv = vit.next()
            if id2name.get(kv._1()) == "shuffle bytes written":
                m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", kv._2())
                if m:
                    total += int(float(m.group(1)) * _UNIT[m.group(2)])
    return total


def main() -> None:
    from pyspark.sql import SparkSession

    from jsonld_rs_spark.pipeline.components import (
        _canonicalize_subjects_joinwise,
        canonicalize_subjects,
    )

    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # skew-split evidence needs the sort-merge shape a 100 TB components
    # table forces (no broadcast), thresholds scaled to sandbox bytes.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    profiles = [
        ("narrow literals (~10 B)", n_triples, 0),
        ("fat literals (+400 B: the real-corpus shape)", n_triples // 2, 400),
    ]
    rows = []
    for label, n, lit_bytes in profiles:
        triples, comp = synth(spark, n, lit_bytes)
        triples = triples.localCheckpoint()
        comp = comp.localCheckpoint()

        def timed(fn):
            # watermark BEFORE the run: shuffle bytes are then summed over
            # exactly the executions this fn (and its digest) created.
            # Drain the listener bus FIRST (ADVICE r7): queued
            # SQLExecutionStart/End events from the preceding
            # localCheckpoint()/synth actions would otherwise leave the
            # watermark stale and attribute their shuffle bytes to fn.
            _drain_listener_bus(spark)
            mark = latest_exec_id(spark)
            t0 = time.monotonic()
            out = fn(triples, comp)
            cnt, d, dd = digest(out)
            wall = time.monotonic() - t0
            return wall, cnt, d, dd, shuffle_bytes_since(spark, mark)

        wall_melt, n_rows, d_melt, dd_melt, sb_melt = timed(canonicalize_subjects)
        plan = dd_melt._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=false" not in plan.splitlines()[0], "non-executed plan"
        skew_joins = plan.count("skew=true")
        wall_join, n_join, d_join, _, sb_join = timed(_canonicalize_subjects_joinwise)
        assert (n_rows, d_melt) == (n_join, d_join), (
            f"melt != joinwise on hub graph [{label}]"
        )
        # contrast: skew handling off -> same plan, the hub stalls one task
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        wall_noskew, _, _, _, _ = timed(canonicalize_subjects)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        rows.append(
            (label, n, n_rows, skew_joins, wall_melt, wall_noskew, wall_join,
             sb_melt, sb_join)
        )

    def mb(b):
        return f"{b / 1024**2:,.0f} MB"

    table = "\n".join(
        f"| {label} | {n:,} | {skew} | {wm:.1f} s | {wn:.1f} s | {wj:.1f} s "
        f"| {mb(sm)} | {mb(sj)} |"
        for label, n, _, skew, wm, wn, wj, sm, sj in rows
    )
    section = f"""{MARKER_BEGIN}
## canonicalize_subjects under hub skew (measured by tools/skew_probe.py)

Input: synthetic triples over {N_NODES:,} nodes; ONE component holds
{int(HUB_SHARE * 100)}% of all nodes and three of its member ids carry
{int(HOT_SUBJ_SHARE * 100)}% of all subj occurrences (plus 10% of graph names);
broadcast DISABLED so the keys-x-components join runs sort-merge — the shape a
100 TB components table forces. AQE skew thresholds scaled to sandbox bytes
(4 MB/factor 2 vs the 256 MB/factor 5 production defaults) to demonstrate the
mechanism at this volume. Melt output is digest-identical to joinwise on both
profiles (order-independent multiset digest over all 8 columns).

| profile | triples | AQE skew=true joins | melt wall | melt wall (skewJoin off) | joinwise wall | melt shuffle bytes | joinwise shuffle bytes |
|---|---|---|---|---|---|---|---|
{table}

Reading:

* **Skew**: the hub key does NOT stall one task — the executed adaptive plan
  marks the melted key join skew=true and splits its oversized partitions.
* **Bytes (the 100x metric)**: shuffle bytes are what a real cluster pays in
  network; local walls hide that cost (local[8] shuffles through page
  cache). On the fat-literal profile — the real-corpus shape, where text
  payloads dominate row bytes — the melt moves fewer bytes through
  exchanges because literal payloads cross exactly one exchange (the
  row-id join) instead of two full-width join shuffles; the margin grows
  with literal size. On narrow rows the ordering INVERTS: the melt's
  row-id machinery (16 incompressible hash bytes crossing three
  exchanges) costs more than the literal crossing it saves.
* **Honest cost**: the joinwise twin is wall-faster at local[8] on both
  profiles — the melt pays md5(to_json) twice over the corpus plus a
  SortAggregate (max(string) has no mutable agg buffer, so the pivot
  sorts). The melt stays the default because corpus bytes, not sandbox
  walls, are the scale risk for the KB-scale-literal corpora this engine
  targets; the joinwise twin remains available and equivalence-tested.
{MARKER_END}
"""
    with open("PLANS.md") as f:
        plans = f.read()
    if MARKER_BEGIN in plans:
        plans = re.sub(
            re.escape(MARKER_BEGIN) + ".*?" + re.escape(MARKER_END),
            section.rstrip("\n"),
            plans,
            flags=re.S,
        )
    else:
        plans = plans.rstrip("\n") + "\n\n" + section
    with open("PLANS.md", "w") as f:
        f.write(plans)
    for label, n, n_out, skew, wm, wn, wj, sm, sj in rows:
        print(
            f"[{label}] n={n:,} out={n_out:,} skew_joins={skew} "
            f"melt={wm:.1f}s noskew={wn:.1f}s joinwise={wj:.1f}s "
            f"shuffle melt={mb(sm)} joinwise={mb(sj)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
