"""Sequence packing — the concat-and-chunk assembly step between a
curated corpus and a pretraining run: stream the documents in a
deterministic shuffled order, concatenate their tokens, and cut the
stream into fixed ``ctx_len`` windows.  Each document learns which
context window(s) it lands in (``pack_id``) and where it starts inside
the first one (``pack_offset``); documents longer than the window
straddle packs, exactly like GPT-style pretraining batching.

The reference has no training-data tier (its pipeline ends at KG
tables); this belongs to the brief's first-class corpus-assembly set
next to mixture sampling (sketches.mixture_sample).

Determinism: the stream order is (affine key hash, key) within a shard,
and the shard is an independent affine hash mod ``n_shards`` — same
corpus → same packs, across runs, engines, and cluster sizes (unlike
any order inherited from file layout).  Token counts are the portable
whitespace count (textstats.token_counts.ws_tokens).

Scale shape: ONE exchange on the shard id (balanced by the hash,
n_shards sized to the cluster) + a per-shard sort feeding a running-sum
window — linear, no global sort, no driver collect.  The running sum is
the only sequential dependency and it is confined to a shard, which is
the same trade a real packing job makes (each shard becomes one output
stream of context windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sketches import _key_hash
from .textstats import token_counts

#: independent affine permutations: shard assignment and stream order
PACK_SHARD_SALT = 4
PACK_ORDER_SALT = 5


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> DataFrame:
    """→ (key_col, shard, n_tokens, pack_id, pack_offset) for every row
    with a non-NULL key (NULL text → 0 tokens: the row keeps its slot in
    the stream but consumes no window space).

    ``pack_id`` is the window index within the shard where the document
    STARTS (floor(start/ctx_len)); ``pack_offset`` its token offset in
    that window.  A consumer materializes window w of a shard from the
    rows with pack_id <= w and pack_id + spans > w — for contiguous
    windows it just replays the shard stream in (order, key) order.
    """
    if ctx_len < 1:
        raise ValueError("ctx_len must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    tok = token_counts(F.col(text_col))["ws_tokens"]
    shard_h = _key_hash(docs, key_col, PACK_SHARD_SALT)
    order_h = _key_hash(docs, key_col, PACK_ORDER_SALT)
    base = docs.where(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.pmod(shard_h, F.lit(n_shards)).cast("long").alias("shard"),
        order_h.alias("_ord"),
        tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_ord", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("_start")
    return base.select(
        key_col,
        "shard",
        "n_tokens",
        start,
    ).select(
        key_col,
        "shard",
        "n_tokens",
        F.expr(f"_start div {ctx_len}").alias("pack_id"),
        F.pmod(F.col("_start"), F.lit(ctx_len)).cast("long").alias("pack_offset"),
    )


def pack_windows(
    docs: DataFrame,
    ctx_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> DataFrame:
    """Materialize the actual training windows: → (shard, pack_id,
    n_tokens, window_text), one row per context window, ``window_text``
    the space-joined tokens of the concat stream slice [pack_id·ctx,
    (pack_id+1)·ctx).  Documents straddling a boundary contribute their
    token slices to every window they span — byte-for-byte the stream
    :func:`pack_sequences` indexes (pytest: windows re-concatenate to the
    per-shard stream; every window but each shard's last holds exactly
    ``ctx_len`` tokens).

    Tokenization matches token_counts.ws_tokens (lowercase, whitespace
    split, empties dropped) so n_tokens agrees with pack_sequences.

    Scale shape: the span explode emits one row per (doc, window) —
    ⌈n_tokens/ctx⌉ ≈ 1-2 rows per doc — and the only wide shuffle is the
    final groupBy on (shard, pack_id), which moves each token exactly
    once (inherent: window assembly IS a re-bucketing of the stream).
    Slice order inside a window is restored by sorting the collected
    (order_hash, key) struct list — deterministic, never
    partition-order-dependent."""
    packed = pack_sequences(
        docs, ctx_len=ctx_len, key_col=key_col,
        text_col=text_col, n_shards=n_shards,
    )
    order_h = _key_hash(docs, key_col, PACK_ORDER_SALT)
    toks = docs.where(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        order_h.alias("_ord"),
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda x: x != "",
        ).alias("_toks"),
    )
    j = packed.join(toks, key_col).select(
        key_col,
        "shard",
        "_ord",
        "_toks",
        "n_tokens",
        (F.col("pack_id") * ctx_len + F.col("pack_offset")).alias("_start"),
    )
    # one row per window the doc touches; empty docs touch none
    spans = j.where(F.col("n_tokens") > 0).select(
        "shard",
        "_ord",
        F.col(key_col),
        "_toks",
        "_start",
        "n_tokens",
        F.explode(
            F.sequence(
                F.expr(f"_start div {ctx_len}"),
                F.expr(f"(_start + n_tokens - 1) div {ctx_len}"),
            )
        ).alias("pack_id"),
    )
    # the doc's token slice landing in this window (1-based F.slice)
    lo = F.greatest(F.lit(0), F.col("pack_id") * ctx_len - F.col("_start"))
    hi = F.least(
        F.col("n_tokens"), (F.col("pack_id") + 1) * ctx_len - F.col("_start")
    )
    pieces = spans.select(
        "shard",
        "pack_id",
        F.struct(
            F.col("_ord"), F.col(key_col).alias("_k"),
            F.slice(F.col("_toks"), lo + 1, hi - lo).alias("_piece"),
        ).alias("_p"),
    )
    return (
        pieces.groupBy("shard", "pack_id")
        .agg(F.array_sort(F.collect_list("_p")).alias("_ps"))
        .select(
            "shard",
            "pack_id",
            F.flatten(F.transform(F.col("_ps"), lambda p: p["_piece"])).alias("_w"),
        )
        .select(
            "shard",
            "pack_id",
            F.size("_w").cast("long").alias("n_tokens"),
            F.array_join("_w", " ").alias("window_text"),
        )
    )
