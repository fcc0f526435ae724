"""Distributed connected components (operators/components.py):
structural shapes where single-hop fails, union-find parity, and the
component-level dedup upgrade."""

from pyspark.sql import functions as F

from datax_spark.operators.components import (
    component_dedup,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _comp_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    """A 60-node path 0-1-2-...-59: single-hop min-neighbor maps node k
    to k-1; true components map EVERYONE to 0. O(log n) rounds means the
    star algorithm must close this chain in far fewer than 60 rounds."""
    chain = _edges(spark, [(i, i + 1) for i in range(59)])
    got = _comp_map(connected_components(chain))
    assert got == {i: 0 for i in range(60)}


def test_disjoint_shapes(spark):
    """Star + triangle-cycle + isolated pair + reversed/duplicated edges."""
    e = [(10, 11), (10, 12), (10, 13),        # star rooted at 10
         (20, 21), (21, 22), (22, 20),        # cycle
         (31, 30),                            # reversed order pair
         (30, 31), (31, 30),                  # duplicates
         (40, 41), (41, 40)]
    got = _comp_map(connected_components(_edges(spark, e)))
    assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 22: 20,
                   30: 30, 31: 30, 40: 40, 41: 40}


def test_matches_union_find_on_minhash_pairs(spark):
    """End-to-end parity: engine components over the engine's minhash
    pair graph == pure-python union-find over pyref's independent pair
    computation (both pair sets are themselves oracle-verified equal)."""
    from datax_spark.operators.dedup import minhash_lsh_pairs
    from datax_spark.oracle import pyref

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                              num_hashes=32, bands=8, jaccard_threshold=0.5)
    got = sorted(map(tuple, connected_components(pairs).collect()))
    assert got == pyref.components_rows(sf, threshold=0.5)


def test_component_dedup_beats_single_hop(spark):
    """The dedup upgrade, on the shape where single-hop provably differs:
    V-graph (0-2, 1-2). Node 1 never appears as the larger id of any
    pair, so the single-hop collapse KEEPS it even though it is in 0's
    component; component_dedup drops it."""
    docs = spark.range(6).select(F.col("id").alias("doc_id"),
                                 F.lit("t").alias("text"))
    v = _edges(spark, [(0, 2), (1, 2), (3, 4)])
    kept = sorted(r["doc_id"] for r in component_dedup(docs, v, "doc_id").collect())
    assert kept == [0, 3, 5]  # component minima + untouched singleton 5

    # single-hop (minhash_lsh_dedup's rep construction) keeps 1 as well
    rep = (v.select(F.col("id_b").alias("id"), F.col("id_a").alias("rep"))
           .groupBy("id").agg(F.min("rep").alias("rep")))
    single_hop_losers = {r["id"] for r in rep.collect()}
    assert 1 not in single_hop_losers and single_hop_losers == {2, 4}


def test_random_graphs_match_union_find(spark):
    """Property check on deterministic pseudo-random graphs of varied
    density: star-algorithm components == union-find, across shapes no
    hand-written case covers (forests, dense blobs, many singleton-free
    islands)."""
    import random

    for seed, n_nodes, n_edges in ((1, 40, 20), (2, 60, 90), (3, 25, 5), (4, 80, 40)):
        rng = random.Random(seed)
        pairs = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
        pairs = [(a, b) for a, b in pairs if a != b]
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {a for a, _ in pairs} | {b for _, b in pairs}
        expect = sorted((n, find(n)) for n in nodes)
        got = sorted(map(tuple, connected_components(_edges(spark, pairs)).collect()))
        assert got == expect, f"seed {seed}"


def test_pathological_giant_star_and_hub(spark):
    """A single 120k-member star component (hub-degree = component size,
    past the old collect_set design's documented ~1e5 ceiling): the
    min-agg/join formulation converges without any per-node neighborhood
    buffer, every member lands in component 0, and the root is its own
    member. Also checks a long chain fused to the hub (forces the
    large/small-star alternation to actually propagate)."""
    n = 120_000
    hub_edges = spark.range(1, n).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
    # chain n..n+49 hanging off member 1: 1-n, n-(n+1), ...
    chain = [(1, n)] + [(n + i, n + i + 1) for i in range(49)]
    chain_edges = spark.createDataFrame(chain, "id_a long, id_b long")
    comp = connected_components(hub_edges.unionByName(chain_edges))
    rows = comp.collect()
    assert len(rows) == n + 50
    assert {r["component"] for r in rows} == {0}


def test_per_round_dedup_matches_per_step(spark):
    """r6: the round loop skips large-star's distinct (the star algebra
    is multiset-insensitive; the round's second step restores set
    semantics). Pin: running both star steps with per-step distinct
    yields the same round-1 edge set as the shipped per-round form, on
    a graph with chains, a hub, and parallel-ish edges."""
    from datax_spark.operators.components import _canonical_edges, _star_step

    edges = [(1, 2), (2, 3), (3, 4), (9, 4), (5, 6)] + [(0, i) for i in
             range(10, 40)] + [(2, 1), (4, 3)]  # reversed dups too
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    e = _canonical_edges(df, "id_a", "id_b")
    per_step = _star_step(_star_step(e, large=True, dedup=True), large=False)
    per_round = _star_step(_star_step(e, large=True, dedup=False), large=False)
    assert sorted(map(tuple, per_step.collect())) == \
        sorted(map(tuple, per_round.collect()))
