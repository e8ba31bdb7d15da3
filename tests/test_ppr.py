"""Personalized-pagerank gates — the reference's personalized tests
(tests/algos/pagerank_test.go:179-239: walksPerNode=1000, topK=200,
L1 tolerance 0.01 against analytic fixture scores), plus the dangling
special case (pagerank.go:138-141) and determinism/many-source parity.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark import datagen, ppr, rank, walks_gen

TOL = 0.01
WPN = 1000
TOPK = 200

# fixtures with a non-trivial source-0 distribution
NAMES = [
    "triangle", "triangle_plus_one", "acyclic1", "acyclic2",
    "acyclic3", "acyclic4", "cyclic_long50",
]


def _setup(spark, fx, wpn=WPN, seed=42):
    edges = (
        spark.createDataFrame(fx.edge_list(), "src long, dst long")
        if fx.edge_list()
        else spark.createDataFrame([], "src long, dst long")
    )
    starts = spark.createDataFrame([(i,) for i in sorted(fx.follows)], "node_id long")
    walks = walks_gen.generate_walks(
        spark, edges, starts, walks_per_node=wpn, seed=seed, strategy="broadcast"
    ).localCheckpoint()
    return edges, starts, walks


def _expected_df(spark, expected):
    return spark.createDataFrame(
        [(int(k), float(v)) for k, v in expected.items()], "node_id long, rank double"
    )


@pytest.mark.parametrize("name", NAMES)
def test_personalized_matches_analytic(spark, name):
    fx = datagen.FIXTURES[name]
    edges, _, walks = _setup(spark, fx)
    scores = ppr.personalized_pagerank(spark, edges, walks, 0, top_k=TOPK, seed=42)
    d = rank.l1_distance(scores, _expected_df(spark, fx.expected_personalized0))
    assert d <= TOL, f"{name}: L1={d}"


def test_personalized_dangling_source(spark):
    fx = datagen.FIXTURES["dandlings"]
    edges, _, walks = _setup(spark, fx, wpn=10)
    scores = ppr.personalized_pagerank(spark, edges, walks, 0).collect()
    assert [(r.node_id, r.rank) for r in scores] == [(0, 1.0)]


def test_personalized_deterministic(spark):
    fx = datagen.FIXTURES["acyclic1"]
    edges, _, walks = _setup(spark, fx, wpn=200)
    a = ppr.personalized_pagerank(spark, edges, walks, 0, top_k=50, seed=9).collect()
    b = ppr.personalized_pagerank(spark, edges, walks, 0, top_k=50, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_many_source_visits_index_equality(spark):
    """A maintained visits index must give the same many-source
    result as the derived explode (the reference's walksVisiting W5
    lookup vs a store scan)."""
    fx = datagen.FIXTURES["acyclic1"]
    edges, starts, walks = _setup(spark, fx, wpn=200)
    idx = walks_gen.visits_of(walks)
    a = ppr.personalized_pagerank_many(
        spark, edges, walks, starts, top_k=30, seed=6
    )
    b = ppr.personalized_pagerank_many(
        spark, edges, walks, starts, top_k=30, seed=6, visits=idx
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_many_source_sample_capped_pre_shuffle(spark):
    """The stitch input is capped at `limit` walks PER SOURCE before
    the group shuffle (W5's even sampling, reference
    store.go:243-288): a hot source visited by ~every walk must not
    receive the whole store at its stitch task, and the maintained
    visits index must select the identical sample."""
    # star: every spoke points at node 0 -> node 0 is visited by all
    follows = {i: [0] for i in range(1, 30)}
    follows[0] = [1]
    edges = spark.createDataFrame(
        [(s, d) for s, ds in follows.items() for d in ds], "src long, dst long"
    )
    starts = spark.createDataFrame(
        [(i,) for i in sorted(follows)], "node_id long"
    )
    walks = walks_gen.generate_walks(
        spark, edges, starts, walks_per_node=40, seed=7, strategy="broadcast"
    ).localCheckpoint()
    n_visiting_hot = walks.filter(
        F.array_contains("path", 0)
    ).count()
    limit = 9
    assert n_visiting_hot > limit  # the cap is actually exercised
    sample = ppr.per_source_walk_sample(edges, walks, starts, limit, seed=7)
    per_src = sample.groupBy("source_id").count().collect()
    assert max(int(r["count"]) for r in per_src) <= limit
    assert {int(r["source_id"]) for r in per_src} == set(follows)
    # the maintained index path picks the same deterministic sample
    idx_sample = ppr.per_source_walk_sample(
        edges, walks, starts, limit, seed=7,
        visits=walks_gen.visits_of(walks),
    )
    assert sorted(
        (r.source_id, r.walk_id) for r in sample.collect()
    ) == sorted((r.source_id, r.walk_id) for r in idx_sample.collect())


def test_per_source_sample_threshold_is_exact(spark):
    """The bounded top-k machinery (map-side partial WindowGroupLimit
    for hot sources) must be INVISIBLE in the output: per source, the
    sample is exactly the `limit` smallest (xxhash64(seed, walk_id),
    walk_id) pairs over ALL walks visiting the source's neighborhood —
    verified against an independent python selection over the full
    store."""
    follows = {i: [0] for i in range(1, 30)}
    follows[0] = [1]
    edges = spark.createDataFrame(
        [(s, d) for s, ds in follows.items() for d in ds], "src long, dst long"
    )
    starts = spark.createDataFrame(
        [(i,) for i in sorted(follows)], "node_id long"
    )
    walks = walks_gen.generate_walks(
        spark, edges, starts, walks_per_node=40, seed=7, strategy="broadcast"
    ).localCheckpoint()
    limit, seed = 9, 13
    # oracle: python selection over the full store, with the hash
    # values taken from Spark's own xxhash64 (no reimplementation)
    rows = walks.select(
        "walk_id", "path", F.xxhash64(F.lit(seed), "walk_id").alias("h")
    ).collect()
    expected = {}
    for src, fl in follows.items():
        members = set(fl) | {src}
        visiting = [
            (r["h"], r["walk_id"]) for r in rows if members & set(r["path"])
        ]
        expected[src] = sorted(visiting)[:limit]
    got = ppr.per_source_walk_sample(
        edges, walks, starts, limit, seed=seed
    ).collect()
    got_by_src: dict[int, list] = {}
    hash_of = {r["walk_id"]: r["h"] for r in rows}
    for r in got:
        got_by_src.setdefault(int(r["source_id"]), []).append(
            (hash_of[r["walk_id"]], r["walk_id"])
        )
    assert set(got_by_src) == set(expected)
    for src in expected:
        assert sorted(got_by_src[src]) == expected[src], src


def test_neighborhood_csr_is_bounded(spark, monkeypatch):
    """The stitcher's adjacency is the BFS closure of the sampled
    neighborhood (FollowCache contract, pkg/pagerank/cache.go:11-62)
    — never the full edge table: edges of a disconnected component
    must not be collected, and the result must equal the full-CSR
    run exactly (the closure is complete for the reachable part)."""
    follows = {0: [1], 1: [2], 2: [0]}
    for i in range(10, 20):
        follows[i] = [10 + ((i - 9) % 10)]  # disconnected 10-cycle
    edges = spark.createDataFrame(
        [(s, d) for s, ds in follows.items() for d in ds], "src long, dst long"
    )
    starts = spark.createDataFrame([(i,) for i in (0, 1, 2)], "node_id long")
    walks = walks_gen.generate_walks(
        spark, edges, starts, walks_per_node=200, seed=5, strategy="broadcast"
    ).localCheckpoint()

    captured = {}
    orig = ppr.collect_csr

    def spy(df):
        csr = orig(df)
        captured["n_edges"] = len(csr.targets)
        return csr

    monkeypatch.setattr(ppr, "collect_csr", spy)
    bounded = ppr.personalized_pagerank(spark, edges, walks, 0, top_k=20, seed=5)
    got = sorted(map(tuple, bounded.collect()))
    # only the 3 triangle edges were collected; the 10-cycle stayed out
    assert captured["n_edges"] == 3
    monkeypatch.undo()
    full = ppr.personalized_pagerank(
        spark, edges, walks, 0, top_k=20, seed=5,
        csr=walks_gen.collect_csr(edges),
    )
    assert got == sorted(map(tuple, full.collect()))


def test_neighborhood_csr_frees_bfs_checkpoints(spark):
    """The BFS closure truncates lineage per hop with eager
    localCheckpoints; a multi-hop closure must free them before
    returning (the CSR is plain numpy — nothing references the
    frames), otherwise every PPR call leaves hop-count many
    closure-sized blocks in the BlockManager until driver GC."""
    # 8-hop chain from root 0 forces >= 8 BFS rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    roots = spark.createDataFrame([(0,)], "node_id long")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    csr = ppr._neighborhood_csr(edges, roots)
    assert len(csr.targets) == 8  # closure complete
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before


def test_neighborhood_budget_still_normalizes(spark):
    """Past the node budget a live walk dangles and resets — the
    distribution must still be a distribution (documented divergence,
    fires only beyond the budget)."""
    fx = datagen.FIXTURES["acyclic1"]
    edges, _, walks = _setup(spark, fx, wpn=100)
    scores = ppr.personalized_pagerank(
        spark, edges, walks, 0, top_k=20, seed=3, max_nodes=1
    )
    total = scores.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_many_source_close_to_single(spark):
    """The cogrouped fan-out must produce the same distributions the
    single-source path does (same stitcher, same rng keying), up to
    the per-source walk-cache sampling order."""
    fx = datagen.FIXTURES["acyclic2"]
    edges, starts, walks = _setup(spark, fx, wpn=500)
    many = ppr.personalized_pagerank_many(
        spark, edges, walks, starts, top_k=50, seed=42
    )
    rows = many.collect()
    srcs = {r.source_id for r in rows}
    assert srcs == set(fx.follows)
    # each source's distribution sums to ~1
    sums = (
        many.groupBy("source_id").agg(F.sum("rank").alias("s")).collect()
    )
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9
    # spot-check source 0 against the single-source result within MC tol
    single = ppr.personalized_pagerank(spark, edges, walks, 0, top_k=50, seed=42)
    m0 = spark.createDataFrame(
        [(r.node_id, r.rank) for r in rows if r.source_id == 0],
        "node_id long, rank double",
    )
    assert rank.l1_distance(single, m0) <= 0.05


def test_per_source_sample_is_group_limited_pre_shuffle(spark):
    """Plan gate for the hot-source bound: the per-source top-`limit`
    selection plans as WindowGroupLimit with a PARTIAL pass BELOW the
    source_id exchange — each map task forwards at most `limit` rows
    per source, so a celebrity source's hit set never funnels through
    one task's sort. No count/pre-filter pass exists anymore: the
    members-join/distinct hits pass appears exactly once."""
    edges = spark.createDataFrame([(1, 0), (2, 0)], "src long, dst long")
    starts = spark.createDataFrame([(1,), (2,)], "node_id long")
    walks = spark.createDataFrame(
        [(i, i % 3, [i % 3, 0]) for i in range(30)],
        "walk_id long, start_id long, path array<long>",
    )
    out = ppr.per_source_walk_sample(edges, walks, starts, limit=3, seed=7)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p and "Partial" in p
    assert p.count("partial_count") == 0  # no n_hits sizing pass


def test_many_source_includes_walkless_sources(spark):
    """A source whose whole neighborhood no stored walk visits must
    still appear in the many-source output, matching the
    single-source path's live stitch (and the degenerate
    {source: 1.0} for a dangling source) — previously such sources
    formed no applyInPandas group and silently vanished."""
    follows = {0: [1], 1: [2], 2: [], 5: [6], 6: []}
    edges = spark.createDataFrame(
        [(s, d) for s, ds in follows.items() for d in ds],
        "src long, dst long",
    )
    # walks only from node 0: nothing ever visits 5, 6 or 7
    starts0 = spark.createDataFrame([(0,)], "node_id long")
    walks = walks_gen.generate_walks(
        spark, edges, starts0, walks_per_node=200, seed=3,
        strategy="broadcast",
    ).localCheckpoint()
    sources = spark.createDataFrame([(0,), (5,), (7,)], "node_id long")

    rows = ppr.personalized_pagerank_many(
        spark, edges, walks, sources, top_k=20, seed=3
    ).collect()
    assert {r.source_id for r in rows} == {0, 5, 7}
    # unknown/dangling source: self-distribution
    assert [
        (r.node_id, r.rank) for r in rows if r.source_id == 7
    ] == [(7, 1.0)]
    # walk-less source with edges: identical to the single-source
    # live stitch (same stitcher, same rng keying, empty cache)
    single5 = ppr.personalized_pagerank(
        spark, edges, walks, 5, top_k=20, seed=3
    )
    m5 = sorted((r.node_id, r.rank) for r in rows if r.source_id == 5)
    assert m5 == sorted(map(tuple, single5.collect()))
