"""Graph-layer gates, ported from the semantics of the reference's
mock database tests (pkg/database/mock/database_test.go)."""

import pandas as pd
from crawler_spark import datagen, graph


def test_mint_ids_dense_deterministic(spark):
    urls = spark.createDataFrame(
        pd.DataFrame({"url": ["https://c.test/", "https://a.test/", "https://b.test/"]})
    )
    nodes = graph.mint_node_ids(None, urls, added_ts=datagen.EPOCH0)
    got = {r["url"]: r["node_id"] for r in nodes.collect()}
    assert got == {"https://a.test/": 0, "https://b.test/": 1, "https://c.test/": 2}
    # minting more continues from max_id, skipping known urls
    more = spark.createDataFrame(
        pd.DataFrame({"url": ["https://b.test/", "https://d.test/"]})
    )
    new = graph.mint_node_ids(nodes, more, added_ts=datagen.EPOCH0)
    assert [(r["url"], r["node_id"]) for r in new.collect()] == [("https://d.test/", 3)]


def test_mint_continues_past_id_zero(spark):
    """Regression: a store whose highest node_id is 0 (single seed) is
    falsy; `max(...) or -1` re-minted id 0 onto the first discovered
    url, silently aliasing two urls under one id."""
    seed = spark.createDataFrame(pd.DataFrame({"url": ["https://seed.test/"]}))
    nodes = graph.mint_node_ids(None, seed, added_ts=datagen.EPOCH0)
    assert [r["node_id"] for r in nodes.collect()] == [0]
    new = graph.mint_node_ids(
        nodes,
        spark.createDataFrame(pd.DataFrame({"url": ["https://found.test/"]})),
        added_ts=datagen.EPOCH0,
    )
    assert [(r["url"], r["node_id"]) for r in new.collect()] == [
        ("https://found.test/", 1)
    ]


def test_delta_partition_matches_reference_semantics(spark):
    # reference sliceutils.Partition: removed=old-new, common=old∩new, added=new-old
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "node_id": [0, 1],
                "old_follows": [[1, 2, 3], None],
                "new_follows": [[3, 4], [7]],
            }
        )
    )
    got = {r["node_id"]: r for r in graph.delta_partition(df).collect()}
    assert got[0]["removed"] == [1, 2]
    assert got[0]["common"] == [3]
    assert got[0]["added"] == [4]
    assert got[1]["removed"] == []
    assert got[1]["added"] == [7]


def test_apply_deltas_roundtrip(spark):
    fx = datagen.FIXTURES["acyclic1"]
    edges = spark.createDataFrame(fx.edge_list(), schema="src long, dst long")
    deltas = spark.createDataFrame(
        [(0, [1], [4])], schema="node_id long, removed array<long>, added array<long>"
    )
    after = graph.apply_deltas(edges, deltas)
    got = sorted((r["src"], r["dst"]) for r in after.collect())
    assert (0, 1) not in got and (0, 4) in got
    inv = spark.createDataFrame(
        [(0, [4], [1])], schema="node_id long, removed array<long>, added array<long>"
    )
    back = graph.apply_deltas(after, inv)
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == sorted(fx.edge_list())


def test_degree_counts(spark):
    fx = datagen.FIXTURES["acyclic3"]  # 0->{1,2}, 3->{1,2}
    edges = spark.createDataFrame(fx.edge_list(), schema="src long, dst long")
    fc = {r["node_id"]: r["follow_count"] for r in graph.follow_counts(edges).collect()}
    assert fc == {0: 2, 3: 2}
    rc = {r["node_id"]: r["follower_count"] for r in graph.follower_counts(edges).collect()}
    assert rc == {1: 2, 2: 2}


def test_adjacency_lists_sorted(spark):
    edges = spark.createDataFrame([(0, 5), (0, 2), (0, 9)], schema="src long, dst long")
    row = graph.adjacency_lists(edges).first()
    assert row["follows"] == [2, 5, 9]


def test_resolve_ids_null_for_unknown(spark):
    nodes = graph.nodes_from_urls(spark, ["https://a.test/"], added_ts=datagen.EPOCH0)
    q = spark.createDataFrame(
        pd.DataFrame({"url": ["https://a.test/", "https://zz.test/"]})
    )
    got = {r["url"]: r["node_id"] for r in graph.resolve_ids(q, nodes).collect()}
    assert got["https://a.test/"] == 0 and got["https://zz.test/"] is None


def test_nodes_from_empty_seed_list(spark):
    """bootstrap with no seeds must yield an empty nodes frame, not a
    schema-inference crash from createDataFrame([])."""
    df = graph.nodes_from_urls(spark, [])
    assert df.count() == 0
    assert "node_id" in df.columns and "url" in df.columns


def test_mint_default_added_ts_is_stable_across_actions(spark):
    """The default added_ts must be a DRIVER-side timestamp: the
    minted frame is acted on more than once (count, union, commit,
    resume replay), and F.current_timestamp() stamps a different
    value per query execution — added_ts feeds the arbiter's
    promotion-wait cutoff, so a replay could flip a decision."""
    df = graph.nodes_from_urls(spark, ["https://a.test/", "https://b.test/"])
    a = sorted((r.url, r.added_ts) for r in df.collect())
    b = sorted((r.url, r.added_ts) for r in df.collect())
    assert a == b
