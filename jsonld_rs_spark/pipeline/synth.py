"""Deterministic synthesis of the Common-Crawl-style ``web_pages`` table.

The pipeline's authoritative input shape is
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint). The sandbox has no crawl data, so pages are
synthesized deterministically (seed = doc_id) from the driver's read-only
``documents`` table, embedding 0..3 ``application/ld+json`` blocks that
exercise every expansion branch surveyed in SURVEY.md §2.1 rows 11-13:
plain schema.org objects, ``@graph``/named graphs, ``@list``, language and
index container maps, ``@reverse``, relative ``@id`` (resolved against the
page url), blank nodes, remote-context chains, and malformed JSON (skipped +
counted). ~1 in 7 urls also gets an older duplicate crawl so the
latest-crawl-per-url window dedup has work to do.

Everything here is a pure function of the input row — the same page is
produced on any executor, any partition layout, any cluster size.
"""

from __future__ import annotations

import html as _html
import json
from datetime import datetime, timedelta, timezone
from typing import Any, Dict, Iterator, List, Tuple

CRAWL_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Surface forms that double as entity-linking candidates (FIXTURES.md §5);
# "data" is the deliberate hub key (appears in a large share of documents).
ENTITY_WORDS = [
    "data", "spark", "customer", "query", "window", "stream",
    "vector", "table", "filter", "merge",
]


def page_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example/{doc_id}"


def _entity_iri(word: str) -> str:
    return f"http://kg.example/e/{word}"


def _alt_entity_iri(word: str) -> str:
    return f"http://alt.example/entity/{word}"


def _block_for(doc_id: int, kind: int, words: List[str], lang: str) -> Tuple[str, bool]:
    """One JSON-LD block body for the page; returns (json_text, malformed)."""
    w = (words + ["pad"] * 8)[:8]
    if kind == 0:
        doc: Dict[str, Any] = {
            "@context": "https://ctx.example/v1",
            "id": f"article/{doc_id}",  # relative @id → resolved against url
            "type": "Article",
            "headline": " ".join(w[:4]),
            "wordCount": len(words),
            "rating": round(1.0 + (doc_id % 40) / 8.0, 3),
            "author": {"type": "Person", "name": w[0].title() + " " + w[1].title()},
        }
    elif kind == 1:
        doc = {
            "@context": "https://ctx.example/v1",
            "id": f"dataset/{doc_id}",
            "type": "Dataset",
            "name": " ".join(w[:2]),
            "@graph": [
                {
                    "id": f"part/{doc_id}/1",
                    "type": "CreativeWork",
                    "name": w[2],
                    "mentions": _entity_iri(w[3] if w[3] in ENTITY_WORDS else "data"),
                },
                {"id": f"part/{doc_id}/2", "type": "CreativeWork", "name": w[4]},
            ],
        }
    elif kind == 2:
        doc = {
            "@context": "https://ctx.example/v1",
            "id": f"howto/{doc_id}",
            "type": "HowTo",
            "steps": [w[0], w[1], w[2]],
            "label": {lang: " ".join(w[:3]), "en": " ".join(w[3:5])},
        }
    elif kind == 3:
        ent = w[0] if w[0] in ENTITY_WORDS else ENTITY_WORDS[doc_id % len(ENTITY_WORDS)]
        # cross-entity sameAs links stay within the word's half of the
        # dictionary → the co-reference graph has 2 disjoint components
        idx = ENTITY_WORDS.index(ent)
        half = 5 * (idx >= 5)
        nxt = ENTITY_WORDS[(idx + 1) % 5 + half]
        doc = {
            "@context": "https://ctx.example/v1",
            "id": _entity_iri(ent),
            "type": "Thing",
            "sameAs": [_alt_entity_iri(ent), _entity_iri(nxt) if doc_id % 11 == 0 else _alt_entity_iri(ent) + "#aka"],
            "reviewedBy": {"id": f"review/{doc_id}", "type": "Review"},
            "author": {"name": w[5].title()},  # blank node
        }
    elif kind == 4:
        good = json.dumps(
            {
                "@context": "https://ctx.example/v1",
                "id": f"broken/{doc_id}",
                "type": "Article",
                "headline": " ".join(w),
            }
        )
        return good[: max(10, int(len(good) * 0.6))], True  # malformed: truncated
    else:  # kind == 5
        doc = {
            "@context": ["https://ctx.example/chained", {"score": "http://ex.example/score"}],
            "id": f"report/{doc_id}",
            "type": "Report",
            "score": {"@value": f"{(doc_id % 100) / 10.0}", "@type": "http://www.w3.org/2001/XMLSchema#decimal"},
            "extra": {"@value": "indexed", "@index": f"i{doc_id % 3}"},
            "http://ex.example/revision": doc_id % 5,
        }
    return json.dumps(doc, sort_keys=True), False


def blocks_for_doc(doc_id: int, text: str, lang: str) -> List[Tuple[str, bool]]:
    words = text.split()
    n_blocks = doc_id % 4  # 0..3 blocks per page
    return [_block_for(doc_id, (doc_id + i) % 6, words, lang) for i in range(n_blocks)]


def render_html(doc_id: int, text: str, lang: str, blocks: List[Tuple[str, bool]]) -> bytes:
    scripts = "\n".join(
        f'<script type="application/ld+json">{body}</script>' for body, _ in blocks
    )
    page = (
        f'<!DOCTYPE html><html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>Doc {doc_id}</title>\n{scripts}\n</head>"
        f'<body><div id="doc-text">{_html.escape(text)}</div></body></html>'
    )
    return page.encode("utf-8")


def synthesize_rows(doc_id: int, text: str, lang: str, source: str) -> Iterator[Dict[str, Any]]:
    """All crawl rows for one document (1 fresh + sometimes 1 stale)."""
    url = page_url(source, doc_id)
    blocks = blocks_for_doc(doc_id, text, lang)
    # modulo keeps the timestamp inside datetime range for replicated ids
    ts = CRAWL_EPOCH + timedelta(seconds=(int(doc_id) % 100_000_000) * 97)
    yield {
        "url": url,
        "warc_ts": ts,
        "html": render_html(doc_id, text, lang, blocks),
        "text": text,
        "lang": lang,
    }
    if doc_id % 7 == 0:
        # stale crawl: fewer blocks, older timestamp — must lose the window dedup
        stale_blocks = blocks[:1]
        yield {
            "url": url,
            "warc_ts": ts - timedelta(days=1),
            "html": render_html(doc_id, text + " [stale]", lang, stale_blocks),
            "text": text + " [stale]",
            "lang": lang,
        }


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def synthesize_pages(spark, sf_dir: str, replicate: int = 1):
    """documents.parquet → web_pages DataFrame.

    Only the four needed columns are read (column pruning reaches the
    parquet scan). ``replicate=k`` unions k deterministic copies with
    offset doc_ids (distinct urls/pages) — used by the scaling bench to
    give every core meaningful work.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    if replicate > 1:
        # offset must exceed any real doc_id or copies collide into
        # byte-identical pages; 10^9 dwarfs the sandbox id space and
        # synthesize_rows derives warc_ts from doc_id modulo 10^8 so the
        # timestamp arithmetic can't overflow for any replica
        copies = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            for i in range(replicate)
        ]
        base = copies[0]
        for c in copies[1:]:
            base = base.unionByName(c)
        docs = base
    return synthesize_pages_from(docs)


def synthesize_pages_from(docs):
    """documents DF → web_pages DF (vectorized, partition-local mapInPandas).

    The sandbox input is a single parquet file (1 scan partition); a real
    crawl table has thousands of files. Python-heavy stages must run at
    cluster parallelism, so spread the scan explicitly.
    """
    import pandas as pd

    from ..util import spread

    docs = spread(docs)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                row
                for doc_id, text, lang, source in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
                )
                for row in synthesize_rows(int(doc_id), text, lang, source)
            ]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


def latest_pages(pages_df):
    """Latest-crawl-per-url dedup.

    Deliberately NOT a window over the full rows: that would shuffle every
    html blob. Instead the winning (url, warc_ts) keys are computed with a
    partial-aggregating groupBy over two tiny columns and joined back. No
    broadcast hint: Catalyst/AQE broadcasts the key side while it fits
    (sandbox scale → zero html shuffle) and falls back to a sort-merge join
    at crawl scale where the key side is billions of urls — a forced
    broadcast would OOM the driver there. The plain window formulation is
    kept as ``window_latest_event_per_user`` in the oracle suite.
    """
    from pyspark.sql import functions as F

    # tie-break on an html hash so two crawls at the same max timestamp
    # yield exactly one winner. Only byte-identical rows (same url, ts, AND
    # html) can still pass twice; a dropDuplicates here would shuffle the
    # html to fix only that pathological case, so it's left to
    # dedup_triples downstream instead.
    keyed = pages_df.withColumn("__h", F.xxhash64("html"))
    latest_keys = keyed.groupBy("url").agg(
        F.max(F.struct("warc_ts", "__h")).alias("__m")
    ).select("url", F.col("__m.warc_ts").alias("warc_ts"), F.col("__m.__h").alias("__h"))
    return keyed.join(latest_keys, ["url", "warc_ts", "__h"]).drop("__h")
