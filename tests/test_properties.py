"""Property-based tests (hypothesis) for the custom operators.

The oracle gate checks one fixture; these check the operator CONTRACTS
on adversarial inputs — ties, empty sides, boundary timestamps,
duplicate keys — against brute-force Python references.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# (user_id 0..3, seconds-offset 0..30) — small domains force ties and
# same-timestamp left/right collisions.
_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)),
    min_size=0,
    max_size=25,
)

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows, start_id=0):
    data = [
        (start_id + i, u, _BASE + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp"
    )


@given(left=_events, right=_events)
@_SET
def test_asof_join_property(spark, left, right):
    from gh_archive_clickhouse_spark.operators.asof import asof_join

    ldf, rdf = _mk(spark, left), _mk(spark, right, start_id=1000)
    got = {
        r.event_id: (r.asof_ts_us, r.n_right_so_far)
        for r in asof_join(ldf, rdf, key="user_id").collect()
    }
    assert set(got) == set(range(len(left)))
    for i, (u, s) in enumerate(left):
        lts = _BASE + dt.timedelta(seconds=s)
        prior = [rs for (ru, rs) in right if ru == u and
                 _BASE + dt.timedelta(seconds=rs) <= lts]
        want_ts = (
            int((_BASE + dt.timedelta(seconds=max(prior))).timestamp()) * 10**6
            if prior
            else None
        )
        assert got[i] == (want_ts, len(prior)), f"left row {i}"


@given(left=_events, right=_events, width=st.integers(1, 40))
@_SET
def test_range_join_count_property(spark, left, right, width):
    from gh_archive_clickhouse_spark.operators.asof import range_join_count

    ldf, rdf = _mk(spark, left), _mk(spark, right, start_id=1000)
    got = {
        r.event_id: r.n_in_range
        for r in range_join_count(
            ldf, rdf, key="user_id", width_seconds=width
        ).collect()
    }
    # one output row per distinct left event_id (ids are unique here)
    assert set(got) == set(range(len(left)))
    for i, (u, s) in enumerate(left):
        # contract: r.ts in [l.ts - width, l.ts), same key
        want = sum(
            1
            for (ru, rs) in right
            if ru == u and s - width <= rs < s
        )
        assert got[i] == want, f"left row {i} (width={width})"


@given(
    sigs=st.lists(st.integers(0, (1 << 60) - 1), min_size=0, max_size=12),
    max_h=st.integers(0, 3),
)
@_SET
def test_simhash_pairs_complete_and_sound(spark, sigs, max_h):
    """Pigeonhole completeness: EVERY pair within max_hamming <= 3 of
    4x15-bit bands must be returned; nothing above max_hamming is.
    Fingerprint 0 is the empty-doc sentinel and never pairs (the
    quadratic-skew exclusion mirrored in the qx13 oracle)."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_candidate_pairs(df, max_hamming=max_h).collect()
    }
    want = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if sigs[i] == 0 or sigs[j] == 0:
                continue  # sentinel: excluded from banding
            h = bin(sigs[i] ^ sigs[j]).count("1")
            if h <= max_h:
                want[(i, j)] = h
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 100)),
        min_size=0,
        max_size=25,
    )
)
@_SET
def test_latest_by_key_agg_equals_window_form(spark, rows):
    from gh_archive_clickhouse_spark.operators.dedup import (
        latest_by_key,
        latest_by_key_agg,
    )

    df = spark.createDataFrame(rows, "k long, o long, payload long")
    via_agg = latest_by_key_agg(
        df, keys=["k"], order_cols=["o", "payload"], payload_cols=["o", "payload"]
    )
    via_win = latest_by_key(
        df, ["k"], [F.col("o").desc(), F.col("payload").desc()]
    ).select("k", "o", "payload")
    a = sorted(tuple(r) for r in via_agg.collect())
    b = sorted(tuple(r) for r in via_win.collect())
    assert a == b


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2.0, 2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@_SET
def test_quantize_int8_contract(spark, vecs):
    """Quantized components stay in [-127, 127]; zero vectors quantize
    to all-zero; checksums match a python reference."""
    from gh_archive_clickhouse_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_int8(df).collect()}
    import math

    for i, v in enumerate(vecs):
        fv = [float(__import__("numpy").float32(x)) for x in v]
        scale = max(abs(x) for x in fv)
        if scale == 0:
            q = [0] * len(fv)
        else:
            q = [
                int(math.floor(abs(x) * 127.0 / scale + 0.5))
                * (1 if x >= 0 else -1)
                for x in fv
            ]
        r = got[i]
        assert r.dim == len(fv)
        assert r.q_l1 <= 127 * len(fv)
        assert r.q_sum == sum(q), (fv, q, r.q_sum)
        assert r.q_l1 == sum(abs(x) for x in q)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 3),
)
@_SET
def test_ngram_contamination_matches_python(spark, docs, n):
    """Contamination rate == brute-force distinct-n-gram overlap; docs
    shorter than n tokens produce no row."""
    from gh_archive_clickhouse_spark.operators.text_analysis import (
        ngram_contamination,
    )

    half = max(1, len(docs) // 2)
    corpus, bench = docs[:half], docs[half:]
    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in ngram_contamination(cdf, bdf, n=n).collect()
    }

    def grams(t):
        toks = [x for x in t.split(" ") if x]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    bg = set().union(*(grams(t) for t in bench)) if bench else set()
    want = {}
    for i, t in enumerate(corpus):
        g = grams(t)
        if g:
            want[i] = (len(g), len(g & bg))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 40),         # seconds offset
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=0,
        max_size=20,
    ),
    window=st.integers(5, 30),
)
@_SET
def test_funnel_levels_matches_bruteforce(spark, rows, window):
    """funnel_levels == the literal greedy definition: t1 = earliest
    'a'; t_{i+1} = earliest next-step event at/after t_i; level counts
    steps with t_i - t1 <= window. Ties, same-timestamp steps, and
    missing steps are all in the strategy's range."""
    from gh_archive_clickhouse_spark.operators.sessionize import (
        funnel_levels,
    )

    if not rows:
        return
    df = spark.createDataFrame(
        [
            (i, u, _BASE + dt.timedelta(seconds=s), t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {
        r.level: r.n_users
        for r in funnel_levels(df, ["a", "b", "c"], window).collect()
    }

    per_user: dict = {}
    for (u, s, t) in rows:
        per_user.setdefault(u, []).append((s, t))
    want: dict = {}
    for u, evs in per_user.items():
        t1 = min((s for s, t in evs if t == "a"), default=None)
        t2 = (
            min((s for s, t in evs if t == "b" and s >= t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((s for s, t in evs if t == "c" and s >= t2), default=None)
            if t2 is not None
            else None
        )
        level = 0
        if t1 is not None:
            level = 1
            if t2 is not None and t2 - t1 <= window:
                level = 2
                if t3 is not None and t3 - t1 <= window:
                    level = 3
        want[level] = want.get(level, 0) + 1
    assert got == want


# ---- round-4 operators: packing + containment ------------------------

_token_counts = st.lists(st.integers(0, 40), min_size=1, max_size=20)


@given(counts=_token_counts, budget=st.integers(1, 64))
@_SET
def test_pack_coordinates_equals_sequential_layout(spark, counts, budget):
    """The hierarchical prefix sum must equal the naive sequential
    layout for ANY token-count multiset and ANY budget — including
    zero-token docs and budgets smaller than single docs."""
    from gh_archive_clickhouse_spark.operators.packing import (
        pack_coordinates,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in pack_coordinates(
            docs,
            F.size(F.array_remove(F.split(F.col("text"), " "), "")),
            budget=budget,
            group_size=3,  # force multiple buckets
        ).collect()
    }
    running = 0
    for i, n in enumerate(counts):
        r = out[i]
        assert r.tokens_before == running
        assert r.seq_id == running // budget
        assert r.seq_offset == running % budget
        expect_cross = n > 0 and (running + n - 1) // budget > running // budget
        assert bool(r.crosses_boundary) == expect_cross
        running += n


_doc_texts = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=10),
    min_size=2,
    max_size=8,
)


@given(token_lists=_doc_texts)
@_SET
def test_containment_equals_bruteforce(spark, token_lists):
    """containment_pairs == brute-force set containment over word
    3-shingles for ANY tiny-vocab corpus (hot shingles, ties, empty
    and sub-3-token docs), with the df cap disabled."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        containment_pairs,
    )

    texts = [" ".join(f"t{v}" for v in toks) for toks in token_lists]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.shared, r.containment)
        for r in containment_pairs(
            docs, shingle_k=3, max_df=10_000, threshold=0.5
        ).collect()
    }

    def shingles(toks):
        return {
            " ".join(f"t{v}" for v in toks[i : i + 3])
            for i in range(len(toks) - 2)
        }

    expect = {}
    sets = [shingles(t) for t in token_lists]
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            if not sets[a] or not sets[b]:
                continue
            shared = len(sets[a] & sets[b])
            # r13: containment is the UNROUNDED quotient (dec_avg
            # class); Python and the JVM share IEEE division, so
            # equality here is exact.
            cont = shared / min(len(sets[a]), len(sets[b]))
            if shared and cont >= 0.5:
                expect[(a, b)] = (shared, cont)
    assert got == expect


# ---- PQ encode vs numpy brute force --------------------------------

_vecs = st.lists(
    st.lists(st.integers(-50, 50), min_size=16, max_size=16),
    min_size=4,
    max_size=12,
)


@given(rows=_vecs)
@_SET
def test_pq_encode_matches_numpy_bruteforce(spark, rows):
    """pq_encode == numpy argmin-L2 per subspace for ANY small float
    corpus (m=4 subspaces of 4 dims, codebook = first 2 vectors),
    including duplicate vectors and distance ties (lowest code wins)."""
    import numpy as np

    from gh_archive_clickhouse_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    k = 2
    if len(rows) < k:
        return
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: list(r.codes)
        for r in pq_encode(
            emb, m=4, dim=16, codebook=pq_codebook(emb, k=k)
        ).collect()
    }
    arr = np.array(rows, dtype=np.float64)
    cb = arr[:k]
    for i, v in enumerate(arr):
        expect = []
        for mm in range(4):
            sub = slice(mm * 4, mm * 4 + 4)
            d = ((cb[:, sub] - v[sub]) ** 2).sum(axis=1)
            # ties -> lowest code (np.argmin returns first minimum)
            expect.append(int(np.argmin(d)))
        assert got[i] == expect, (i, got[i], expect)


# ---- incremental MV under arbitrary batching -----------------------

_splits = st.lists(st.integers(0, 2), min_size=1, max_size=12)


@given(assignment=_splits)
@_SET
def test_incremental_mv_any_batching_equals_batch(spark, tmp_path_factory, assignment):
    """The MV fold == the one-shot batch rollup no matter how events
    are chopped into micro-batches (including empty batches)."""
    import datetime as dt2

    from gh_archive_clickhouse_spark.streaming.mv import (
        incremental_rollup_sink,
        rollup_view,
    )

    base = dt2.datetime(2024, 5, 1)
    events = [
        (i, base + dt2.timedelta(hours=7 * i), 1, "view", 1.0)
        for i in range(len(assignment))
    ]
    partials = str(tmp_path_factory.mktemp("mv") / "p")
    sink = incremental_rollup_sink(partials, keep_epochs=2)
    for epoch in range(3):
        batch = [e for e, a in zip(events, assignment) if a == epoch]
        df = spark.createDataFrame(
            batch or [],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        sink(df, epoch)
    got = {
        (r.day, r.event_type): (r.n_events, r.min_event_id, r.max_event_id)
        for r in rollup_view(spark, partials).collect()
    }
    expect: dict = {}
    for eid, ts, _u, et, _v in events:
        key = (ts.strftime("%Y%m%d"), et)
        n, mn, mx = expect.get(key, (0, eid, eid))
        expect[key] = (n + 1, min(mn, eid), max(mx, eid))
    assert got == expect


# ------------------------------------------ packing / emission / densify

_corpora = st.lists(
    st.integers(0, 40),  # token counts per doc, zero included
    min_size=1,
    max_size=20,
)


@given(n_toks=_corpora, budget=st.integers(1, 17))
@_SET
def test_pack_and_emit_tile_property(spark, n_toks, budget):
    """Arbitrary corpora x arbitrary budgets: pack_coordinates must
    reproduce the sequential layout exactly, and emit_packed_sequences
    must tile both every document and every sequence with gapless
    positive slices."""
    from gh_archive_clickhouse_spark.operators.packing import (
        emit_packed_sequences,
        pack_coordinates,
    )

    df = spark.createDataFrame(
        list(enumerate(n_toks)), "doc_id long, nt long"
    )
    coords = pack_coordinates(
        df, F.col("nt"), budget=budget, group_size=3
    ).localCheckpoint(eager=True)
    got = {r.doc_id: r for r in coords.collect()}
    run = 0
    for i, n in enumerate(n_toks):
        r = got[i]
        assert (r.tokens_before, r.n_tokens) == (run, n)
        assert r.seq_id == run // budget and r.seq_offset == run % budget
        run += n
    slices = emit_packed_sequences(coords, budget).collect()
    per_doc: dict = {}
    per_seq: dict = {}
    for r in slices:
        assert r.slice_len > 0 and r.seq_pos >= 0
        per_doc.setdefault(r.doc_id, []).append((r.slice_start, r.slice_len))
        per_seq.setdefault(r.seq_id, []).append((r.seq_pos, r.slice_len))
    assert set(per_doc) == {i for i, n in enumerate(n_toks) if n > 0}
    for i, parts in per_doc.items():
        parts.sort()
        pos = 0
        for start, ln in parts:
            assert start == pos
            pos += ln
        assert pos == n_toks[i]
    total = sum(n_toks)
    n_seq = -(-total // budget) if total else 0
    assert set(per_seq) == set(range(n_seq))
    for s, parts in per_seq.items():
        parts.sort()
        pos = 0
        for start, ln in parts:
            assert start == pos
            pos += ln
        assert pos == (budget if s < n_seq - 1 else total - (n_seq - 1) * budget)


@given(
    keys=st.lists(
        st.integers(-(2**40), 2**40), min_size=1, max_size=30, unique=True
    )
)
@_SET
def test_densify_rank_property(spark, keys):
    """Any distinct key set (negative, sparse, adjacent): dense ids
    are exactly the argsort positions 0..n-1."""
    from gh_archive_clickhouse_spark.operators.packing import (
        densify_order,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.dense_id for r in densify_order(df, "k").collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=20,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_equals_union_find(spark, edges):
    """Random multigraphs (duplicate edges, self-loops, both
    orientations of the same pair, disconnected singleton loops):
    cluster_rep equals the min node of each component computed by a
    brute-force Python union-find. Pins the propagate/pointer-jump
    rounds on shapes the fixture's near-dup graph never produces."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)],
        "doc_a long, doc_b long",
    )
    if not edges:
        df = df.limit(0)
    got = {
        r.doc_id: r.cluster_rep
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["en", "de"])),
        min_size=0,
        max_size=40,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mixture_resample_matches_python_rates(spark, tmp_path_factory, rows):
    """qx60 end-to-end on random source skews: the materialized
    mixture's per-(source, lang) aggregates equal a pure-Python
    recomputation of the rank-derived weights spec, the integer ppm
    rate table, and the salted-md5 keep rule — the whole chain
    (weights window, rate math, split_bucket, broadcast join, filter,
    witnesses) against an independent reference."""
    import hashlib

    import pandas as pd

    from gh_archive_clickhouse_spark.plans.ext_queries import (
        QX60_BUDGET_PPM,
        QX60_PPM,
        QX60_SALT,
        qx60_mixture_resample,
    )

    base = tmp_path_factory.mktemp("qx60_prop")
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(rows)), dtype="int64"),
            "source": pd.array([f"s{s}" for s, _ in rows]),
            "lang": pd.array([l for _, l in rows]),
            "text": pd.array(["t"] * len(rows)),
        }
    )
    docs.to_parquet(base / "documents.parquet")
    got = {
        (r.source, r.lang): (r.n_kept, r.min_id, r.max_id, r.sum_id, r.rate_ppm)
        for r in qx60_mixture_resample(spark, str(base)).collect()
    }

    n_total = len(rows)
    per_source: dict[str, int] = {}
    for s, _ in rows:
        per_source[f"s{s}"] = per_source.get(f"s{s}", 0) + 1
    srcs_sorted = sorted(per_source)
    k = len(srcs_sorted)
    d = k * (k + 1) // 2
    weight = {
        s: ((i + 1) * QX60_PPM) // d for i, s in enumerate(srcs_sorted)
    }
    rate = {
        s: min(
            QX60_PPM,
            ((QX60_BUDGET_PPM * weight[s]) // QX60_PPM) * n_total // n,
        )
        for s, n in per_source.items()
    }

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"{doc_id}{QX60_SALT}".encode()).hexdigest()
        return int(h[:8], 16) % QX60_PPM

    want: dict[tuple[str, str], list[int]] = {}
    for i, (s, l) in enumerate(rows):
        if bucket(i) < rate[f"s{s}"]:
            want.setdefault((f"s{s}", l), []).append(i)
    assert got == {
        k: (len(v), min(v), max(v), sum(v), rate[k[0]])
        for k, v in want.items()
    }


_LSH_CORPUS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs every day",
    "pack my box with five dozen liquor jugs every day",
    "pack my box with five dozen liquor jugs every night",
    "sphinx of black quartz judge my vow at once",
    "how vexingly quick daft zebras jump over fences",
    "bright vixens jump while dozy fowl quack loudly here",
]


@given(assignment=st.lists(st.integers(0, 2), min_size=8, max_size=8))
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_lsh_any_batching_equals_batch(
    spark, tmp_path_factory, assignment
):
    """The incremental LSH pair log == the batch operator's pair set
    no matter how the corpus is chopped into micro-batches (including
    empty batches and all-in-one) — the qs4 two-batch equivalence
    generalized to arbitrary arrival orders. Each doc still arrives
    exactly once; a pair must be discovered when its LATER member
    arrives, whichever batch that is."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from gh_archive_clickhouse_spark.streaming.dedup_stream import (
        PAIRS_SCHEMA,
        incremental_lsh_sink,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_LSH_CORPUS)],
        "doc_id long, text string",
    )
    want = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }

    base = tmp_path_factory.mktemp("inc_lsh")
    sink = incremental_lsh_sink(str(base / "sigs"), str(base / "pairs"))
    for epoch in range(3):
        batch = [
            (i, t)
            for i, (t, a) in enumerate(zip(_LSH_CORPUS, assignment))
            if a == epoch
        ]
        sink(
            spark.createDataFrame(batch or [], "doc_id long, text string"),
            epoch,
        )
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.read.schema(PAIRS_SCHEMA)
        .parquet(str(base / "pairs"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    assert got == want and want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=0,
        max_size=30,
    ),
    buckets=st.sampled_from([1, 3, 16]),
)
@_SET
def test_salted_totals_equals_naive_groupby(spark, rows, buckets):
    """Salting only changes the physical shuffle shape: per-key count
    and sum equal the naive groupBy for ANY salt_buckets, including
    the degenerate single bucket — hot-key rows (key domain of 3 over
    up to 30 rows) split across salts must re-aggregate exactly
    (decimal partials, order-independent)."""
    from gh_archive_clickhouse_spark.operators.skew import salted_totals

    df = spark.createDataFrame(
        [(k, v / 100.0) for k, v in rows], "k long, v double"
    )
    got = {
        r.k: (r.n, r.sum_value)
        for r in salted_totals(
            df, key="k", value_col="v", salt_buckets=buckets
        ).collect()
    }
    want: dict = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)  # integer cents: exact
    assert got == {k: (n, s / 100.0) for k, (n, s) in want.items()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=0,
        max_size=12,
    ),
    scores=st.lists(st.integers(0, 2), min_size=8, max_size=8),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_survivors_by_matches_python_argmax(spark, edges, scores):
    """Quality-aware cut on random cluster graphs with a tiny score
    domain (ties everywhere): survivors == corpus minus, per
    component, every member except the (score, -id)-argmax; never-
    paired docs always survive. The min-id cut is cross-checked on
    the same graph."""
    from gh_archive_clickhouse_spark.operators.dedup import (
        dedup_survivors,
        dedup_survivors_by,
    )

    corpus = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.limit(0)

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)

    drop_by = set()
    drop_min = set()
    for members in comps.values():
        keep = max(members, key=lambda i: (scores[i], -i))
        drop_by.update(m for m in members if m != keep)
        drop_min.update(m for m in members if m != min(members))

    got_by = {
        r.doc_id
        for r in dedup_survivors_by(corpus, pairs, "score").collect()
    }
    assert got_by == set(range(8)) - drop_by
    got_min = {
        r.doc_id for r in dedup_survivors(corpus, pairs).collect()
    }
    assert got_min == set(range(8)) - drop_min


@given(
    sizes=st.lists(
        st.tuples(
            st.integers(0, 60),  # |a| - |shared|
            st.integers(0, 60),  # |b| - |shared|
            st.integers(0, 40),  # |shared|
        ),
        min_size=1,
        max_size=12,
    )
)
@_SET
def test_shingle_jaccard_equals_python_division(spark, sizes):
    """r15 contract of the shared LSH verification formula: for ANY
    pair of shingle sets, shingle_jaccard emits EXACTLY Python's IEEE
    division of the intersection/union integers (and 0.0 on an empty
    union) — the bit-determinism claim that justified dropping the
    6-dp round, checked on randomized cardinalities rather than just
    the engineered boundary fixtures in test_knife_edge.py."""
    from gh_archive_clickhouse_spark.operators.dedup import shingle_jaccard

    rows = []
    for i, (na, nb, ns) in enumerate(sizes):
        shared = [f"s{i}_{j}" for j in range(ns)]
        a = shared + [f"a{i}_{j}" for j in range(na)]
        b = shared + [f"b{i}_{j}" for j in range(nb)]
        rows.append((i, a, b))
    df = spark.createDataFrame(
        rows, "pair_id long, sha_ array<string>, shb_ array<string>"
    )
    got = {
        r.pair_id: r.j
        for r in df.select(
            "pair_id", shingle_jaccard().alias("j")
        ).collect()
    }
    for i, (na, nb, ns) in enumerate(sizes):
        union = na + nb + ns
        want = ns / union if union > 0 else 0.0
        assert got[i] == want, (i, na, nb, ns)  # bit-exact


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=200,
    ),
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=200,
    ),
    st.integers(min_value=1, max_value=99),
    st.integers(min_value=1, max_value=99),
)
def test_replica_relabeling_is_a_similarity_isometry(ta, tb, u, v):
    """Property form of the r15 replica-instrument contract
    (scripts/make_sf_replica._relabel_table): for ANY two ASCII texts
    and ANY two universes, relabeling (1) preserves length, (2) is
    invertible (injective), (3) preserves char-4-gram and
    word-shingle Jaccard EXACTLY within a universe, and (4) shares no
    non-space character — hence no token and no gram containing one —
    across distinct universes. These four facts are what make
    replica-based dedup scaling measurements measure the engine, not
    the instrument."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "make_sf_replica",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "make_sf_replica.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    tab_u, tab_v = mod._relabel_table(u), mod._relabel_table(v)
    ra, rb = ta.translate(tab_u), tb.translate(tab_u)
    assert len(ra) == len(ta)
    inv = {w: c for c, w in tab_u.items()}
    assert ra.translate(inv) == ta  # injective round-trip

    def grams(t, k=4):
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    def shingles(t, k=3):
        w = t.split()
        return {tuple(w[i : i + k]) for i in range(len(w) - k + 1)}

    def jac(a, b):
        return len(a & b) / len(a | b) if (a | b) else 0.0

    assert jac(grams(ra), grams(rb)) == jac(grams(ta), grams(tb))
    assert jac(shingles(ra), shingles(rb)) == jac(
        shingles(ta), shingles(tb)
    )
    if u != v:
        rav = ta.translate(tab_v)
        shared = {c for c in ra if c != " "} & {c for c in rav if c != " "}
        assert not shared
