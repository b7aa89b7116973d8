"""Structured Streaming operators.

The reference is batch-only (SURVEY §2.7 D12); its incremental anti-join
resume (D8) covers the capability.  These operators are the streaming
extension a continuously-crawled corpus needs:

* :func:`streaming_pages_source` — file-source stream over a pages/
  events-shaped parquet directory (new crawl snapshots appear as files;
  ``availableNow`` triggers give exactly-once incremental batches).
* :func:`windowed_event_counts` — watermarked tumbling-window aggregation
  (late data beyond the watermark is dropped, state is bounded).
* :func:`streaming_mentions` — the D1 detector applied to a stream: pure
  narrow transformation, so it runs per micro-batch with no state.
* :func:`sessionize` — custom stateful operator via
  ``applyInPandasWithState``: groups events per user into sessions closed
  by a gap timeout (the canonical "operator Spark lacks" example).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.mentions import detect_mentions_native

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events_source(spark: SparkSession, dir_path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(dir_path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with a watermark bounding state (late rows
    older than the watermark are dropped — the streaming analog of
    rel_events_hourly)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; duplicates
    arriving within the watermark horizon are dropped, and state older
    than the watermark is evicted (bounded state — the streaming analog of
    dedup.exact_duplicates; for content dedup pass a precomputed
    ``md5(text)`` column as the key)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


_FP_COLLISION_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("first_url", T.StringType()),
    ]
)

_FP_STATE_SCHEMA = T.StructType([T.StructField("first_url", T.StringType())])


def _fp_collision_fn(key, pdf_iter, state: GroupState):
    """Per-fingerprint state: the first document that produced it.  Every
    later document carrying the same fingerprint emits a collision row
    (url, first_url) — evidence of shared content."""
    (fp,) = key
    if state.exists:
        (first_url,) = state.get
    else:
        first_url = None
    out_urls: list[str] = []
    for pdf in pdf_iter:
        for url in pdf.sort_values("url")["url"]:
            if first_url is None:
                first_url = url
            elif url != first_url:
                out_urls.append(url)
    state.update((first_url,))
    if out_urls:
        yield pd.DataFrame(
            {"fp": [fp] * len(out_urls), "url": out_urls, "first_url": [first_url] * len(out_urls)}
        )


def streaming_fp_collisions(
    docs_stream: DataFrame,
    key: str = "url",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Streaming near-dup evidence for a continuously-crawled corpus:
    winnow each incoming document (vectorized Arrow kernel — works per
    micro-batch, stateless) and keep ONE state row per fingerprint (its
    first document) via ``applyInPandasWithState``; later documents
    sharing the fingerprint emit (fp, url, first_url) collision rows.
    Downstream, `collisions.groupBy(url, first_url).count()` scores pair
    similarity incrementally — no batch re-scan of the corpus as it grows.

    State sizing: one small row per DISTINCT fingerprint — the winnowed
    density is ~2/(w+1) of the k-gram universe, and dedup wants long
    memory, so no timeout is set; on a real cluster the state store is
    RocksDB-backed and sharded by fp (the natural balanced key).  The
    within-batch arrival order is made deterministic by sorting on url.
    """
    from ..functions.hashing import winnow_fp_udf

    fp_udf = winnow_fp_udf(k, w)
    t = F.lower(F.col(text_col))
    fps = (
        docs_stream.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
        .select(F.col(key).alias("url"), F.explode(fp_udf(t)).alias("fp"))
    )
    return fps.groupBy("fp").applyInPandasWithState(
        _fp_collision_fn,
        outputStructType=_FP_COLLISION_SCHEMA,
        stateStructType=_FP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_mentions(pages_stream: DataFrame) -> DataFrame:
    """D1 over a stream — stateless narrow op, identical semantics to the
    batch detector (same Column expressions)."""
    docs = pages_stream.select(
        "url", F.coalesce(F.col("text"), F.lit(None).cast("string")).alias("extracted_text")
    )
    return detect_mentions_native(docs)


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _sessionize_fn(key, pdf_iter, state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed last_event + gap: close the open session
        start_us, last_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return
    closed = []
    if state.exists:
        start_us, last_us, n, sv = state.get
    else:
        start_us = last_us = None
        n, sv = 0, 0.0
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and us - last_us > _GAP_US:
                closed.append((start_us, last_us, n, sv))
                start_us, n, sv = us, 0, 0.0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            sv += float(value)
    state.update((start_us, last_us, n, sv))
    # event-time timeout: fires when the WATERMARK (not the wall clock)
    # passes last_event + gap — deterministic, and terminates cleanly under
    # trigger(availableNow) (a processing-time timeout would keep the query
    # scheduling batches forever waiting for wall-clock time to pass)
    state.setTimeoutTimestamp(last_us // 1000 + _GAP_US // 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization with applyInPandasWithState (event-time
    timeout closes idle sessions once the watermark passes the gap)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain all currently-available input into an in-memory sink and
    return the result table (deterministic incremental batch — the test
    and demo harness).  Watermarked aggregations only emit *finalized*
    windows in append mode; a one-shot drain should use
    output_mode='complete' to observe all windows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def streaming_docs_source(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a documents-shaped parquet directory (new
    crawl shards appear as files)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(dir_path)
    )


def streaming_corpus_stats(docs: DataFrame) -> DataFrame:
    """Streaming twin of ``textstats.corpus_stats``: running per
    (source, lang) composition totals over a continuously-crawled corpus
    — the live curation dashboard.  The batch operator is a pure-Column
    projection + one aggregation, so it applies to a streaming DataFrame
    UNCHANGED; state is one row per (source, lang) — bounded by the
    domain × language universe, not the corpus — and every metric is
    map-side-combinable, so each micro-batch folds partial sums into
    state.  Drain with output_mode='complete' (global aggregation, no
    watermark); batch/stream equivalence is pytest-pinned."""
    from ..operators.textstats import corpus_stats

    return corpus_stats(docs)


_ENT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mention_count", T.LongType()),
        T.StructField("sum_rel", T.LongType()),
        T.StructField("max_rel", T.LongType()),
        T.StructField("min_rel", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

STREAM_ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("concept_type", T.StringType()),
        T.StructField("mention_count", T.LongType()),
        T.StructField("sum_relevance_pct", T.LongType()),
        T.StructField("max_relevance_pct", T.LongType()),
        T.StructField("min_relevance_pct", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def _entities_fn(key, pdf_iter, state: GroupState):
    name, ctype = key
    if state.exists:
        mc, sr, xr, nr, ver = state.get
    else:
        mc, sr, xr, nr, ver = 0, 0, None, None, 0
    urls: set = set()
    for pdf in pdf_iter:
        for url, rel in zip(pdf["url"], pdf["relevance_pct"]):
            urls.add(url)
            r = int(rel)
            sr += r
            xr = r if xr is None else max(xr, r)
            nr = r if nr is None else min(nr, r)
    mc += len(urls)
    ver += 1
    state.update((mc, sr, xr, nr, ver))
    yield pd.DataFrame(
        {
            "name": [name],
            "concept_type": [ctype],
            "mention_count": [mc],
            "sum_relevance_pct": [sr],
            "max_relevance_pct": [xr],
            "min_relevance_pct": [nr],
            "version": [ver],
        }
    )


def streaming_entities(mentions_stream: DataFrame) -> DataFrame:
    """Stream-maintained A7 entities aggregate: the incremental
    materialization twin of ``entities.build_entities`` — the entities
    table stays current as crawl shards land, instead of being rebuilt
    from the full mentions table per run.

    State is one row per (name, concept_type) — vocabulary-sized, like
    the batch aggregate's reducer state — and ``mention_count`` stays an
    EXACT distinct-url count under the crawl-shard contract the file
    source provides: each url arrives exactly once (resume anti-join /
    checkpointed file offsets guarantee this), so batch-local distinct
    urls sum to the global distinct count — the same
    disjoint-partition argument as the batch operator's salt-by-url
    two-phase aggregation (entities.py).  A url re-delivered across
    micro-batches WOULD double-count; that is the documented contract,
    not a silent approximation.

    Each micro-batch emits the updated aggregate row tagged with a
    monotonically increasing per-key ``version``; take the max-version
    row per key (:func:`latest_entities`) for the current table.  The
    batch-equivalence property (== build_entities on the drained corpus,
    modulo entity_id) is pytest-pinned."""
    return (
        mentions_stream.select("url", "name", "concept_type", "relevance_pct")
        .groupBy("name", "concept_type")
        .applyInPandasWithState(
            _entities_fn,
            outputStructType=STREAM_ENTITIES_SCHEMA,
            stateStructType=_ENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_entities(emitted: DataFrame) -> DataFrame:
    """Batch helper over a drained :func:`streaming_entities` sink: keep
    the max-version row per (name, concept_type) and add the
    deterministic entity_id, yielding exactly the build_entities
    schema."""
    best = emitted.groupBy("name", "concept_type").agg(
        F.max(
            F.struct(
                F.col("version").alias("v"),
                F.col("mention_count").alias("mc"),
                F.col("sum_relevance_pct").alias("sr"),
                F.col("max_relevance_pct").alias("xr"),
                F.col("min_relevance_pct").alias("nr"),
            )
        ).alias("b")
    )
    return best.select(
        F.xxhash64("name").alias("entity_id"),
        "name",
        "concept_type",
        F.col("b.mc").alias("mention_count"),
        F.col("b.sr").alias("sum_relevance_pct"),
        F.col("b.xr").cast("int").alias("max_relevance_pct"),
        F.col("b.nr").cast("int").alias("min_relevance_pct"),
    )


def drain_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available input into a parquet sink with a
    durable checkpoint — the production shape for incremental crawl
    processing: re-invoking after new input files land processes ONLY the
    delta (the file-source offsets live in the checkpoint), and the file
    sink's commit log makes the appends exactly-once across
    crash/restart.  The batch pipeline's resume (StageStore manifests +
    anti-join) and this checkpoint are the same idea at two granularities
    — stage-level vs source-offset-level."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Stream-maintained crawl frontier (incremental discovered_urls twin)
# ---------------------------------------------------------------------------

STREAM_FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("from_anchors", T.LongType()),
        T.StructField("from_sitemaps", T.LongType()),
        T.StructField("from_feeds", T.LongType()),
        T.StructField("crawled", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

_FRONTIER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("na", T.LongType()),
        T.StructField("ns", T.LongType()),
        T.StructField("nf", T.LongType()),
        T.StructField("cr", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def _frontier_fn(key, pdf_iter, state: GroupState):
    (url,) = key
    if state.exists:
        na, ns, nf, cr, ver = state.get
    else:
        na, ns, nf, cr, ver = 0, 0, 0, 0, 0
    for pdf in pdf_iter:
        for src in pdf["src"]:
            if src == "anchor":
                na += 1
            elif src == "sitemap":
                ns += 1
            elif src == "feed":
                nf += 1
            else:  # capture
                cr = 1
    ver += 1
    state.update((na, ns, nf, cr, ver))
    yield pd.DataFrame(
        {
            "url": [url],
            "from_anchors": [na],
            "from_sitemaps": [ns],
            "from_feeds": [nf],
            "crawled": [cr],
            "version": [ver],
        }
    )


def streaming_frontier(
    pages_stream: DataFrame, url_col: str = "url", body_col: str = "html"
) -> DataFrame:
    """Stream-maintained crawl frontier: the incremental twin of
    ``sitemaps.discovered_urls`` — the fetch list stays current as
    crawl shards land, instead of being recomputed over the whole
    corpus per run (the same incremental-materialization move as
    :func:`streaming_entities`).

    The extraction half is the SAME stateless Column pipeline the batch
    operator runs (anchors / sitemap locs / feed items / the page's own
    normalized url as a 'capture' event — generate + projection, no
    aggregation), so stream and batch can't drift; only the final
    merge is replaced by per-url state (counts + crawled flag, one row
    per discovered url — frontier-sized, exactly the batch groupBy's
    reducer state).  Counts stay exact under the crawl-shard contract
    (each capture lands in exactly one micro-batch — checkpointed file
    offsets); a page re-delivered across micro-batches WOULD
    double-count its references, the same documented contract as
    streaming_entities.

    Emits update rows tagged with a per-url ``version``; take the
    max-version row per url (:func:`latest_frontier`) for the current
    frontier."""
    from ..operators.links import extract_links
    from ..operators.sitemaps import (
        feed_items,
        sitemap_index_entries,
        sitemap_url_entries,
    )
    from ..operators.urls import normalize_url

    from .. import semantics as S

    body = F.col(body_col).cast("string")
    is_sitemapish = (
        body.rlike(S.SITEMAP_URLSET_KIND_RE)
        | body.rlike(S.SITEMAP_INDEX_KIND_RE)
        | body.rlike(S.RSS_KIND_RE)
        | body.rlike(S.ATOM_KIND_RE)
    )
    anchors = (
        extract_links(
            pages_stream.where(~is_sitemapish), url_col=url_col, html_col=body_col
        )
        .select(F.col("dst_url").alias("url"), F.lit("anchor").alias("src"))
    )
    locs = sitemap_url_entries(pages_stream, url_col=url_col, body_col=body_col).select(
        F.col("loc").alias("url"), F.lit("sitemap").alias("src")
    )
    children = sitemap_index_entries(
        pages_stream, url_col=url_col, body_col=body_col
    ).select(F.col("child_url").alias("url"), F.lit("sitemap").alias("src"))
    items = feed_items(pages_stream, url_col=url_col, body_col=body_col).select(
        F.col("item_url").alias("url"), F.lit("feed").alias("src")
    )
    captures = pages_stream.select(
        normalize_url(F.col(url_col)).alias("url"), F.lit("capture").alias("src")
    )
    events = (
        anchors.unionByName(locs)
        .unionByName(children)
        .unionByName(items)
        .unionByName(captures)
    )
    return events.groupBy("url").applyInPandasWithState(
        _frontier_fn,
        outputStructType=STREAM_FRONTIER_SCHEMA,
        stateStructType=_FRONTIER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_frontier(emitted: DataFrame) -> DataFrame:
    """Batch helper over a drained :func:`streaming_frontier` sink:
    max-version row per url, capture-only rows (zero references)
    dropped — exactly the batch ``discovered_urls`` schema."""
    best = emitted.groupBy("url").agg(
        F.max(
            F.struct(
                F.col("version").alias("v"),
                F.col("from_anchors").alias("na"),
                F.col("from_sitemaps").alias("ns"),
                F.col("from_feeds").alias("nf"),
                F.col("crawled").alias("cr"),
            )
        ).alias("b")
    )
    return best.select(
        "url",
        F.col("b.na").alias("from_anchors"),
        F.col("b.ns").alias("from_sitemaps"),
        F.col("b.nf").alias("from_feeds"),
        F.col("b.cr").alias("crawled"),
    ).where(
        (F.col("from_anchors") + F.col("from_sitemaps") + F.col("from_feeds")) > 0
    )
