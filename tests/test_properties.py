"""Property-based tests (Hypothesis) — beyond the reference's example-based
suite: chunk plans must partition the key space for ANY stats; changelog
materialization must equal a reference dict-replay for ANY event log."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_cdc_log_connectors_spark.operators.changelog import apply_changelog
from flink_cdc_log_connectors_spark.sources.chunking import (
    split_even,
    split_from_boundaries,
)


@given(
    min_key=st.integers(-(10**6), 10**6),
    span=st.integers(0, 10**6),
    row_count=st.integers(1, 10**6),
    chunk_size=st.integers(1, 10_000),
)
@settings(max_examples=200, deadline=None)
def test_even_split_partitions_key_space(min_key, span, row_count, chunk_size):
    max_key = min_key + span
    ranges = split_even(min_key, max_key, row_count, chunk_size)
    if ranges is None:  # uneven gate rejected — fine
        return
    assert ranges[0].start is None and ranges[-1].end is None
    # contiguous, ordered, non-empty interior ranges
    for a, b in zip(ranges, ranges[1:]):
        assert a.end == b.start
        if a.start is not None and a.end is not None:
            assert a.start < a.end
    # probe keys across and beyond the domain: exactly one range matches
    probes = {min_key, max_key, min_key - 1, max_key + 1}
    if span:
        probes |= {min_key + span // 2, min_key + 1, max_key - 1}
    for key in probes:
        hits = sum(
            1
            for r in ranges
            if (r.start is None or key >= r.start) and (r.end is None or key < r.end)
        )
        assert hits == 1


@given(boundaries=st.lists(st.integers(-1000, 1000), max_size=20))
@settings(max_examples=100, deadline=None)
def test_boundary_split_partitions_key_space(boundaries):
    ranges = split_from_boundaries(boundaries)
    for key in set(boundaries) | {-2000, 0, 2000}:
        hits = sum(
            1
            for r in ranges
            if (r.start is None or key >= r.start) and (r.end is None or key < r.end)
        )
        assert hits == 1


@st.composite
def changelogs(draw):
    n = draw(st.integers(1, 60))
    events = []
    for offset in range(n):
        key = draw(st.integers(0, 7))
        op = draw(st.sampled_from(["c", "u", "d", "r"]))
        val = draw(st.integers(0, 100))
        events.append((key, val, op, offset))
    return events


@given(log=changelogs())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_changelog_equals_dict_replay(spark, log):
    # reference semantics: replay in offset order into a dict
    expected: dict[int, int] = {}
    for key, val, op, _off in log:
        if op == "d":
            expected.pop(key, None)
        else:
            expected[key] = val
    df = spark.createDataFrame(log, "k int, v int, op string, off long")
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(df, keys=["k"], order_by=["off"]).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        max_size=25,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edge_list):
    """Distributed min-label propagation equals a driver-side union-find
    on random sparse graphs."""
    from flink_cdc_log_connectors_spark.operators.graph import (
        connected_components,
    )

    edges = [(a, b) for a, b in edge_list if a != b]
    node_ids = sorted({n for e in edges for n in e} | set(range(5)))
    # reference: union-find with min-id representative
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    expected = {n: find(n) for n in node_ids}

    nodes_df = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "d1 long, d2 long"
    ).filter("d1 != d2")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == expected


@given(
    start=st.integers(-(10**9), 10**9),
    step=st.integers(1, 10**6),
    n=st.integers(3, 400),
    group_size=st.integers(1, 50),
    unbounded_first=st.booleans(),
    unbounded_last=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_chunk_meta_encode_decode_roundtrip(
    start, step, n, group_size, unbounded_first, unbounded_last
):
    """chunkMetaGroupSize compaction: encode→decode is the identity for
    ANY uniform plan (incl. unbounded first/last chunks), and the compact
    form only appears past the threshold."""
    from flink_cdc_log_connectors_spark.sources.chunking import ChunkRange
    from flink_cdc_log_connectors_spark.sources.sqlite_dialect import (
        decode_chunks,
        encode_chunks,
    )

    bounds = [start + i * step for i in range(n + 1)]
    chunks = [ChunkRange(a, b) for a, b in zip(bounds[:-1], bounds[1:])]
    if unbounded_first:
        chunks[0] = ChunkRange(None, chunks[0].end)
    if unbounded_last:
        chunks[-1] = ChunkRange(chunks[-1].start, None)
    enc = encode_chunks(chunks, group_size)
    assert decode_chunks(enc) == [[c.start, c.end] for c in chunks]
    if n > group_size:
        assert isinstance(enc, dict), "uniform plan past threshold must compact"


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),                      # user
            st.integers(0, 100),                    # ts
            st.sampled_from(["signup", "view", "click", "purchase", "noise"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_matches_naive_replay(spark, events):
    """The single-window funnel equals the obvious per-user scan: walk
    events in (ts, event_id) order, advancing a stage pointer on strict
    ts increase past the previous stage's earliest qualifying time."""
    from flink_cdc_log_connectors_spark.operators.temporal import (
        FUNNEL_STAGES,
        funnel_stages,
    )

    rows = [
        (u, float(t), e, i) for i, (u, t, e) in enumerate(events)
    ]

    # naive reference: earliest qualifying time per stage, sequential
    def naive(user_rows):
        reach = [None] * len(FUNNEL_STAGES)
        for _u, t, e, _i in sorted(user_rows, key=lambda r: (r[1], r[3])):
            for si, stage in enumerate(FUNNEL_STAGES):
                if e != stage:
                    continue
                if si == 0:
                    if reach[0] is None or t < reach[0]:
                        reach[0] = t
                elif reach[si - 1] is not None and t > reach[si - 1]:
                    if reach[si] is None or t < reach[si]:
                        reach[si] = t
        return reach

    df = spark.createDataFrame(
        rows, "user_id int, ts double, et string, event_id long"
    )
    out = funnel_stages(
        df, key="user_id", ts_col="ts", type_col="et",
        order_tie=["event_id"],
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    for r in out:
        expected = naive(by_user[r["user_id"]])
        got = [r[f"t_{s}"] for s in FUNNEL_STAGES]
        assert got == expected, (r["user_id"], got, expected)
        n = 0
        for v in expected:
            if v is None:
                break
            n += 1
        assert r["stage_reached"] == n


@given(
    docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_substring_span_matches_naive(spark, docs):
    """Span coverage equals the obvious Python computation: positional
    n-grams, cross-doc duplication flags, longest consecutive run."""
    from flink_cdc_log_connectors_spark.operators.dedup import (
        substring_span_coverage,
    )

    n = 2
    texts = [" ".join(f"w{t}" for t in toks) for toks in docs]

    def grams(toks):
        return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    owner: dict[tuple, set[int]] = {}
    for i, toks in enumerate(docs):
        for g in grams(toks):
            owner.setdefault(g, set()).add(i)
    expected = {}
    for i, toks in enumerate(docs):
        gs = grams(toks)
        if not gs:
            continue
        flags = [len(owner[g]) >= 2 for g in gs]
        run = best = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        expected[i] = (len(gs), sum(flags), best)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_pos"], r["n_dup"], r["max_run"])
        for r in substring_span_coverage(df, n=n).collect()
    }
    assert got == expected


@given(
    edge_list=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=40
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_count_matches_brute_force(spark, edge_list):
    """Degree-ordered wedge counting equals brute-force triangle
    enumeration on random small graphs (dups/reversed/self-loops
    included in the input)."""
    from itertools import combinations

    from flink_cdc_log_connectors_spark.operators.graph import triangle_count

    edges = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected_t = sum(
        1
        for u, v, w in combinations(nodes, 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    expected_w = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)

    edges_df = spark.createDataFrame(
        list(edge_list) or [(0, 0)], "d1 long, d2 long"
    )
    row = triangle_count(edges_df).first()
    assert row["n_triangles"] == expected_t
    assert row["n_wedges"] == expected_w
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(nodes)


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), max_size=6
    ),
    size=st.integers(1, 8),
    stride=st.integers(1, 8),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_windows_cover_every_token(spark, texts, size, stride):
    """Every chunking (any size/stride) yields windows whose starts are
    exact stride multiples, whose lengths match the remaining tokens,
    and which jointly COVER every token when stride <= size."""
    from flink_cdc_log_connectors_spark.operators.curation import chunk_windows

    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], "doc_id long, text string"
    )
    rows = chunk_windows(docs, size=size, stride=stride).collect()
    toks = {i: [t for t in txt.lower().split() if t] for i, txt in enumerate(texts)}
    for r in rows:
        n = len(toks[r["doc_id"]])
        assert r["start"] == r["chunk_id"] * stride < n
        assert r["n_tokens"] == min(size, n - r["start"])
    if stride <= size:
        for i, tl in toks.items():
            covered = set()
            for r in rows:
                if r["doc_id"] == i:
                    covered |= set(
                        range(r["start"], r["start"] + r["n_tokens"])
                    )
            assert covered == set(range(len(tl)))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # key (tiny space → guaranteed heat)
            st.integers(-10**6, 10**6),  # integer-cent value (exact)
        ),
        min_size=1,
        max_size=200,
    ),
    num_salts=st.integers(1, 8),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_agg_equals_naive_any_distribution(spark, rows, num_salts):
    """Two-phase salted aggregation equals the flat GROUP BY for ANY key
    distribution and salt count (count/sum/min/max on exact decimals)."""
    from decimal import Decimal

    from flink_cdc_log_connectors_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, Decimal(v) / 100) for k, v in rows],
        "k int, v decimal(18,2)",
    )
    naive = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("v", "count"),
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            num_salts=num_salts,
        ).collect()
    }
    assert salted == naive
