"""Round-2 hardening: LSH hot-bucket caps under skew, repointed-mention
dedup, canonicalization precision/recall fixture (scorer choice is
measured, not assumed), embedding near-dup parity, and sessionize
property-tested against a single-process pandas oracle with duplicate +
out-of-order events across micro-batch boundaries."""

from __future__ import annotations

import pytest

import datetime as dt
import math
import os
import random
from collections import defaultdict

from pyspark.sql import Row
from pyspark.sql import functions as F

from agenticknowledgegraphconstructionsystem_spark import semantics as S
from agenticknowledgegraphconstructionsystem_spark.operators.dedup import (
    dropped_band_buckets,
    minhash_banded_signatures,
    minhash_near_duplicates,
)
from agenticknowledgegraphconstructionsystem_spark.operators.linking import (
    canonicalize,
    dedup_repointed_mentions,
    similarity_edges,
    tfidf_cosine_edges,
)
from agenticknowledgegraphconstructionsystem_spark.operators.similarity import (
    embedding_near_duplicates,
)

# ---------------------------------------------------------------------------
# LSH hot-bucket cap (the one quadratic residue at 100× scale)
# ---------------------------------------------------------------------------

_DUP_TEXT = "identical content repeated across many documents for shingle tests"
_NEAR_A = "a genuinely unique pair of documents that are almost the same text body"
_NEAR_B = "a genuinely unique pair of documents that are almost the same text today"


def _skew_docs(spark, n_hot=60):
    rows = [Row(doc_id=i, text=_DUP_TEXT) for i in range(n_hot)]
    rows += [Row(doc_id=1000, text=_NEAR_A), Row(doc_id=1001, text=_NEAR_B)]
    return spark.createDataFrame(rows)


def test_bucket_cap_prevents_quadratic_blowup(spark):
    docs = _skew_docs(spark)
    # uncapped: the 60 identical docs alone are C(60,2) = 1770 pairs
    full = minhash_near_duplicates(docs, n=3, threshold=0.5, max_bucket=None)
    n_full = full.count()
    assert n_full >= 1770
    # capped at 50: every band bucket of the hot signature (60 members) is
    # dropped — the quadratic pair space never materializes — while the
    # unique near-dup pair still surfaces through its own buckets
    capped = minhash_near_duplicates(docs, n=3, threshold=0.5, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (1000, 1001) in got
    assert all(a >= 1000 for a, _ in got), got  # no hot-bucket pairs


def test_dropped_buckets_are_auditable(spark):
    docs = _skew_docs(spark)
    _, banded = minhash_banded_signatures(docs, n=3)
    dropped = dropped_band_buckets(banded, max_bucket=50).collect()
    # all 16 bands of the identical-doc signature are over the cap
    assert len(dropped) == 16
    assert all(r["n_members"] == 60 for r in dropped)


@pytest.mark.slow  # round-6 fast-gate rebalance: family keeps a fast representative
def test_linking_candidate_pairs_capped(spark):
    """A degenerate name-LSH bucket (40 members) must not emit its 780
    pairs; pairs from healthy buckets survive."""
    from agenticknowledgegraphconstructionsystem_spark.operators.linking import (
        candidate_pairs,
    )

    rows = [Row(name=f"hot{i:02d}", band_id=0, band_hash=7) for i in range(40)]
    rows += [
        Row(name="alias a", band_id=1, band_hash=99),
        Row(name="alias b", band_id=1, band_hash=99),
    ]
    sigs = spark.createDataFrame(rows)
    got = {(r["name_a"], r["name_b"]) for r in candidate_pairs(sigs, max_bucket=10).collect()}
    assert got == {("alias a", "alias b")}
    full = candidate_pairs(sigs, max_bucket=10_000).count()
    assert full == 40 * 39 // 2 + 1


# ---------------------------------------------------------------------------
# portable hash family — tri-engine property test (Python / Spark / DuckDB)
# ---------------------------------------------------------------------------


def test_poly_hash_tri_engine_property(spark):
    """The foundation of every LSH oracle: semantics.poly_hash must agree
    bit-for-bit across Python, the Spark Column fold, and DuckDB's
    list_reduce for arbitrary non-empty Unicode strings (Spark ascii() and
    DuckDB ord() both return the codepoint)."""
    import duckdb

    from agenticknowledgegraphconstructionsystem_spark.functions.hashing import (
        poly_hash_col,
    )

    rng = random.Random(97)
    pools = [
        "abcdefghij KLMNOP 0123456789",
        "!@#$%^&*()_+-=[]{};:'\",.<>/?\\|`~",
        "àáâäèéêëìíîïñòóôöùúûüçß",
        "日本語中文한국어кириллица",
        " \t",  # internal whitespace (never leading-only: strings non-empty)
    ]
    cases = []
    for i in range(200):
        pool = pools[i % len(pools)] + pools[(i * 7) % len(pools)]
        n = rng.randrange(1, 60)
        s = "".join(rng.choice(pool) for _ in range(n))
        if s:
            cases.append(s)
    cases = sorted(set(cases))

    py = {s: S.poly_hash(s) for s in cases}
    df = spark.createDataFrame([Row(s=s) for s in cases])
    got_spark = {
        r["s"]: r["h"] for r in df.select("s", poly_hash_col(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    q = (
        f"SELECT list_reduce(list_prepend(CAST({S.POLY_SEED0} AS BIGINT), "
        f"list_transform(string_split(?, ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {S.POLY_BASE} + c) % {S.POLY_P})"
    )
    for s in cases:
        dd = con.execute(q, [s]).fetchone()[0]
        assert py[s] == got_spark[s] == dd, (repr(s), py[s], got_spark[s], dd)


# ---------------------------------------------------------------------------
# repointed-mention dedup (advisor finding: double-count after merge)
# ---------------------------------------------------------------------------


def test_dedup_repointed_mentions_collapses_and_keeps_best(spark):
    m = spark.createDataFrame(
        [
            # two surface forms of one doc merged to the same canonical name
            Row(url="u1", name="batch", concept_type="concept", relevance_pct=60, pos=40, context="lo"),
            Row(url="u1", name="batch", concept_type="concept", relevance_pct=80, pos=12, context="hi"),
            # tie on relevance -> earliest pos wins
            Row(url="u2", name="spark", concept_type="method", relevance_pct=70, pos=9, context="late"),
            Row(url="u2", name="spark", concept_type="method", relevance_pct=70, pos=3, context="early"),
            Row(url="u3", name="vector", concept_type="architecture", relevance_pct=50, pos=1, context="x"),
        ]
    )
    out = {(r["url"], r["name"]): r for r in dedup_repointed_mentions(m).collect()}
    assert len(out) == 3
    assert out[("u1", "batch")]["relevance_pct"] == 80
    assert out[("u1", "batch")]["context"] == "hi"
    assert out[("u2", "spark")]["pos"] == 3
    assert out[("u2", "spark")]["context"] == "early"


def test_pipeline_entities_not_double_counted_after_merge(spark):
    """sum_relevance_pct must count each (url, canonical name) once even
    when two surface forms in one doc merge."""
    from agenticknowledgegraphconstructionsystem_spark.operators.entities import build_entities
    from agenticknowledgegraphconstructionsystem_spark.operators.linking import repoint_mentions

    m = spark.createDataFrame(
        [
            Row(url="u1", name="row batch", concept_type="concept", relevance_pct=60, pos=5, context="a"),
            Row(url="u1", name="batch", concept_type="concept", relevance_pct=80, pos=1, context="b"),
        ]
    )
    mapping = spark.createDataFrame(
        [Row(name="row batch", canonical_name="batch"), Row(name="batch", canonical_name="batch")]
    )
    merged = dedup_repointed_mentions(repoint_mentions(m, mapping))
    e = build_entities(merged).collect()
    assert len(e) == 1
    assert e[0]["mention_count"] == 1
    assert e[0]["sum_relevance_pct"] == 80  # best row only, not 140


# ---------------------------------------------------------------------------
# canonicalization precision/recall fixture (threshold regression guard)
# ---------------------------------------------------------------------------

#: alias pairs that char-3gram Jaccard >= 0.5 is expected to merge
MERGEABLE_ALIASES = {
    ("spark", "sparks"),
    ("table scan", "table-scan"),
    ("hash join", "hash-join"),
    ("hash join", "hashjoin"),
    ("sort merge", "sortmerge"),
    ("sort merge join", "sort-merge join"),
}
#: short abbreviations beyond shingle overlap — documented misses at j>=0.5
KNOWN_MISSES = {("spark", "sprk"), ("table scan", "tbl scan")}
#: decoy pairs that must NOT merge
DECOYS = [
    ("hash join", "merge join"),
    ("big table", "small table"),
    ("fast query", "slow query"),
    ("spark", "stream"),
]


def _fixture_entities(spark):
    names = sorted(
        {n for pair in MERGEABLE_ALIASES | KNOWN_MISSES for n in pair}
        | {n for pair in DECOYS for n in pair}
    )
    canon = {a for a, _ in MERGEABLE_ALIASES | KNOWN_MISSES} | {
        n for pair in DECOYS for n in pair
    }
    return spark.createDataFrame(
        [Row(name=n, mention_count=10 if n in canon else 2) for n in names]
    )


def test_canonicalize_alias_precision_recall(spark):
    ents = _fixture_entities(spark)
    mapping = {r["name"]: r["canonical_name"] for r in canonicalize(ents, threshold=0.5).collect()}
    merged = lambda a, b: mapping[a] == mapping[b]  # noqa: E731
    # recall on the mergeable alias set
    hits = sum(1 for a, b in MERGEABLE_ALIASES if merged(a, b))
    assert hits == len(MERGEABLE_ALIASES), mapping
    # precision: no decoy pair merges
    for a, b in DECOYS:
        assert not merged(a, b), (a, b, mapping)
    # canonical member election: the higher-mention_count form wins
    assert mapping["sparks"] == "spark"
    assert mapping["hashjoin"] == "hash join"
    # documented limitation pinned (so a silent behavior change is caught):
    # pure abbreviations fall below char-3gram overlap at j=0.5
    for a, b in KNOWN_MISSES:
        assert not merged(a, b), (a, b)


def test_jaccard_remains_measured_default_scorer(spark):
    """Scorer choice is measured, not assumed: on the alias fixture the
    exact-Jaccard scorer must dominate TF-IDF cosine at the default 0.5
    threshold (tp here: 6 vs 3 when measured on the full gazetteer ∪
    aliases).  If TF-IDF ever wins this comparison, flip the pipeline
    default — this test is the tripwire."""
    ents = _fixture_entities(spark)
    true_pairs = {tuple(sorted(p)) for p in MERGEABLE_ALIASES | KNOWN_MISSES}
    decoys = {tuple(sorted(p)) for p in DECOYS}

    def score(edges_df):
        got = {tuple(sorted((r["name_a"], r["name_b"]))) for r in edges_df.collect()}
        return len(got & true_pairs) - len(got & decoys)

    j = score(similarity_edges(ents, threshold=0.5))
    t = score(tfidf_cosine_edges(ents, threshold=0.5))
    assert j >= t, (j, t)


def test_similarity_edges_exact_matches_lsh(spark):
    """blocking='exact' and blocking='lsh' agree on the fixture (LSH recall
    loss at 16 minhashes is ~(1-j)^16 — nothing here sits near enough the
    threshold to flip)."""
    ents = _fixture_entities(spark)
    exact = {(r["name_a"], r["name_b"]) for r in similarity_edges(ents, blocking="exact").collect()}
    lsh = {(r["name_a"], r["name_b"]) for r in similarity_edges(ents, blocking="lsh").collect()}
    assert exact == lsh


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantees (Schleimer et al. SIGMOD'03): identical docs →
    identical fingerprint sets; a PREFIX-shifted copy retains every
    fingerprint of the original (shift tolerance the md5 fingerprint lacks
    — any shared substring >= k+w-1 chars shares a fingerprint); disjoint
    content shares none; density ≈ 2/(w+1) bounds the set size."""
    from agenticknowledgegraphconstructionsystem_spark.operators.textstats import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="PREFIX the quick brown fox jumps over the lazy dog"),
            Row(doc_id=3, text="completely different content entirely here"),
            Row(doc_id=4, text="ab"),  # shorter than k -> single gram
        ]
    )
    by: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=8, w=4).collect():
        by.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by[0] == by[1]
    assert by[0] <= by[2]  # shifted copy keeps all originals' fingerprints
    assert not (by[0] & by[3])
    assert len(by[4]) == 1
    n_grams = len("the quick brown fox jumps over the lazy dog") - 7
    assert len(by[0]) <= n_grams  # winnowing selects a subset of grams
    # engine parity: the vectorized int64 kernel == the Column/oracle
    # reference semantics, row for row
    col = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(docs, k=8, w=4, engine="column").collect()
    }
    arrow = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(docs, k=8, w=4, engine="arrow").collect()
    }
    assert col == arrow


# ---------------------------------------------------------------------------
# embedding near-dup parity vs brute force
# ---------------------------------------------------------------------------


def test_embedding_near_duplicates_parity(spark):
    rng = random.Random(5)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(6)]
    vecs = {}
    for i in range(48):
        b = base[i % 6]
        vecs[i] = [x + rng.gauss(0, 0.02) for x in b]  # tight clusters

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    truth = {
        (i, j)
        for i in vecs
        for j in vecs
        if i < j and cos(vecs[i], vecs[j]) >= 0.99
    }
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs.items()])
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_duplicates(df, threshold=0.99, dim=8).collect()
    }
    # precision is exact by construction (threshold applied on exact cosine)
    assert set(got) <= truth
    for pair, c in got.items():
        assert abs(c - cos(vecs[pair[0]], vecs[pair[1]])) < 1e-9
    # recall: tight clusters share RHP signs; demand >= 80%
    assert len(got) >= 0.8 * len(truth), (len(got), len(truth))


@pytest.mark.slow
def test_pipeline_dedup_docs_stage(spark, tmp_path):
    """Corpus-hygiene stage: exact dups collapse to the min-url keeper,
    null-text rows all survive, and the stage is committed/resumable."""
    from agenticknowledgegraphconstructionsystem_spark.plans.pipeline import Pipeline

    pages = spark.createDataFrame(
        [
            Row(url="u1", warc_ts=None, html=None, text="same body here", lang="en"),
            Row(url="u2", warc_ts=None, html=None, text="same body here", lang="en"),
            Row(url="u3", warc_ts=None, html=None, text="unique body", lang="en"),
            Row(url="u4", warc_ts=None, html=None, text=None, lang="en"),
            Row(url="u5", warc_ts=None, html=None, text=None, lang="en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    p = Pipeline(spark, str(tmp_path / "kg_dedup"), dedup_docs=True, link=False)
    out = p.run(pages)
    urls = {r["url"] for r in out["docs"].select("url").collect()}
    assert urls == {"u1", "u3", "u4", "u5"}  # u2 deduped, nulls kept
    assert p.store.is_committed("dedup")


def test_resize_and_audio_plumbing(spark):
    from agenticknowledgegraphconstructionsystem_spark.operators.multimodal import (
        decode_audio,
        resize_images,
    )

    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", mime="image/png", payload=b"img-bytes" * 100, meta="{}"),
            Row(media_id=2, kind="audio", mime="audio/wav", payload=b"pcm" * 3200, meta="{}"),
            Row(media_id=3, kind="image", mime="image/png", payload=None, meta="{}"),
        ]
    )
    resized = {r["media_id"]: r for r in resize_images(media, width=8, height=4).collect()}
    assert set(resized) == {1, 3}  # image rows only
    assert len(resized[1]["payload"]) == 8 * 4  # bounded by target dims
    assert resized[3]["payload"] is None
    # deterministic: same input -> same pseudo-thumbnail
    again = {r["media_id"]: r for r in resize_images(media, width=8, height=4).collect()}
    assert again[1]["payload"] == resized[1]["payload"]

    audio = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert set(audio) == {2}
    assert audio[2]["duration_ms"] == (3 * 3200) // 16
    assert len(audio[2]["mfcc"]) == 13

    import pytest

    with pytest.raises(Exception, match="NotImplementedError|real image resize"):
        resize_images(media, fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|real audio decode"):
        decode_audio(media, fake=False).collect()


def test_ivf_ann_recall(spark):
    from agenticknowledgegraphconstructionsystem_spark.operators.similarity import (
        ivf_ann_topk,
    )

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(5)]
    vecs = {}
    for i in range(60):
        b = base[i % 5]
        vecs[i] = [x + rng.gauss(0, 0.05) for x in b]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    def brute_topk(q, k=3):
        scored = sorted(
            ((-cos(vecs[q], v), n) for n, v in vecs.items() if n != q)
        )
        return [n for _, n in scored[:k]]

    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs.items()])
    got = {}
    for r in ivf_ann_topk(df, df.where("vec_id < 3"), k=3, n_centroids=8, n_probe=3).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in (0, 1, 2):
        assert len(got.get(q, set()) & set(brute_topk(q))) >= 2, (q, got.get(q))


# ---------------------------------------------------------------------------
# sessionize property test vs a single-process pandas-free oracle
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000
_WM_US = 2 * 3600 * 1_000_000


def _oracle_sessions(rows, final_max_ts):
    """Single-process replay of the sessionize semantics: per user, walk
    events in timestamp order, close a session when the gap exceeds 30 min;
    the final open session is emitted only if the terminal watermark
    (max ts - 2h) passed its event-time deadline (last + gap)."""
    final_wm_us = int(final_max_ts.timestamp() * 1_000_000) - _WM_US
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    out = set()
    for u, evs in by_user.items():
        evs = sorted(evs, key=lambda r: r.ts)
        start = last = None
        n, sv = 0, 0.0
        sessions = []
        for r in evs:
            us = int(r.ts.timestamp() * 1_000_000)
            if last is not None and us - last > _GAP_US:
                sessions.append((start, last, n, sv, True))
                start, n, sv = us, 0, 0.0
            if start is None:
                start = us
            last = us
            n += 1
            sv += float(r.value)
        # event-time timeout: watermark must pass deadline strictly
        if last is not None:
            closed_by_timeout = final_wm_us > (last // 1000 + _GAP_US // 1000) * 1000
            sessions.append((start, last, n, sv, closed_by_timeout))
        for s, e, n_, sv_, emitted in sessions:
            if emitted:
                out.add((u, s, e, n_, sv_))
    return out


def _collect_sessions(df):
    return {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
            r["sum_value"],
        )
        for r in df.collect()
    }


def _session_rows(seed=11, n_users=3, n_events=30):
    """Deterministic scrambled event set: per-user increasing timestamps
    with occasional > gap jumps, integer-valued floats (exact sums), plus
    exact duplicate rows; returned in shuffled (out-of-order) sequence."""
    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import EVENTS_SCHEMA  # noqa: F401

    rng = random.Random(seed)
    base = dt.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in range(n_users):
        t = base + dt.timedelta(minutes=rng.randrange(0, 10))
        for _ in range(n_events):
            step = rng.choice([1, 3, 7, 20, 45, 90])  # minutes; 45/90 close sessions
            t = t + dt.timedelta(minutes=step)
            rows.append(
                Row(
                    event_id=eid,
                    ts=t,
                    user_id=u,
                    event_type="a",
                    value=float(rng.randrange(1, 50)),
                    props="{}",
                )
            )
            eid += 1
    dups = [rows[i] for i in rng.sample(range(len(rows)), 5)]
    # duplicates share ts+value with their originals: order-insensitive
    all_rows = rows + dups
    rng.shuffle(all_rows)
    return all_rows


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import (
        EVENTS_SCHEMA,
        run_available_now,
        streaming_dedup,
    )

    base = dt.datetime(2025, 2, 1)
    rows = []
    for i in range(20):
        r = Row(
            event_id=i % 8,  # ids repeat -> duplicates
            ts=base + dt.timedelta(minutes=i),
            user_id=i % 3,
            event_type="a",
            value=float(i),
            props="{}",
        )
        rows.append(r)
    path = str(tmp_path / "dedup_ev")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    out = run_available_now(streaming_dedup(stream), "dedup_stream").collect()
    ids = [r["event_id"] for r in out]
    assert sorted(ids) == sorted(set(range(8)))
    # first occurrence wins (min ts per key)
    by_id = {r["event_id"]: r for r in out}
    for i in range(8):
        assert by_id[i]["value"] == float(i)


@pytest.mark.slow  # round-6 fast-gate rebalance: family keeps a fast representative
def test_streaming_fp_collisions(spark, tmp_path):
    """Stateful streaming near-dup: fingerprint state persists across
    micro-batches — a later near-copy collides against the batch-1
    original; unrelated docs emit nothing."""
    import glob
    import shutil

    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import (
        run_available_now,
        streaming_fp_collisions,
    )

    schema = "url string, text string"
    b0 = [
        Row(url="a1", text="the quick brown fox jumps over the lazy dog tonight"),
        Row(url="a2", text="the quick brown fox jumps over the lazy dog tonight"),  # in-batch dup
        Row(url="b1", text="completely unrelated material discussing shuffle internals"),
    ]
    b1 = [
        Row(url="c1", text="PREFIX the quick brown fox jumps over the lazy dog tonight"),  # cross-batch near-copy
        Row(url="d1", text="yet another disjoint body covering watermark semantics"),
    ]
    d = tmp_path / "fp_stream"
    os.makedirs(d, exist_ok=True)
    now = dt.datetime.now().timestamp()
    for i, batch in enumerate([b0, b1]):
        tmp = str(tmp_path / f"fp_stage{i}")
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        dst = str(d / f"batch{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (now + 10 * i, now + 10 * i))
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    rows = run_available_now(streaming_fp_collisions(stream), "fp_coll").collect()
    pairs = {(r["url"], r["first_url"]) for r in rows}
    assert ("a2", "a1") in pairs  # in-batch duplicate vs first-by-url
    assert ("c1", "a1") in pairs  # cross-batch near-copy hits persisted state
    assert all(u not in ("b1", "d1") for u, _ in pairs)  # disjoint docs silent
    # collision volume for the near-copy ~= the shared fingerprint count
    n_c1 = sum(1 for u, _ in ((r["url"], r["first_url"]) for r in rows) if u == "c1")
    assert n_c1 >= 5


def test_sessionize_matches_oracle_single_batch(spark, tmp_path):
    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import (
        EVENTS_SCHEMA,
        run_available_now,
        sessionize,
    )

    rows = _session_rows()
    path = str(tmp_path / "sess_prop")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    got = _collect_sessions(run_available_now(sessionize(stream), "sess_prop1"))
    exp = _oracle_sessions(rows, max(r.ts for r in rows))
    assert got == exp and len(got) > 0


def test_sessionize_matches_oracle_across_micro_batches(spark, tmp_path):
    """Events split time-ordered across two micro-batches
    (maxFilesPerTrigger=1, mtime-ordered files): closed sessions from batch
    1, state carried into batch 2, terminal timeouts — all must equal the
    single-process oracle."""
    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import (
        run_available_now,
        sessionize,
    )
    from agenticknowledgegraphconstructionsystem_spark.streaming.ops import EVENTS_SCHEMA

    import glob
    import shutil

    rows = _session_rows(seed=23)
    cut = sorted(r.ts for r in rows)[len(rows) // 2]
    early = [r for r in rows if r.ts <= cut]
    late = [r for r in rows if r.ts > cut]
    d = tmp_path / "sess_mb"
    os.makedirs(d, exist_ok=True)
    now = dt.datetime.now().timestamp()
    for i, batch in enumerate([early, late]):
        tmp = str(tmp_path / f"sess_stage{i}")
        spark.createDataFrame(batch, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        dst = str(d / f"batch{i}.parquet")
        shutil.copy(part, dst)
        # order the file-source queue deterministically via modification time
        os.utime(dst, (now + 10 * i, now + 10 * i))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = _collect_sessions(run_available_now(sessionize(stream), "sess_prop2"))
    exp = _oracle_sessions(rows, max(r.ts for r in rows))
    assert got == exp and len(got) > 0
