"""Distributed connected components — the transitive closure the
near-dup collapse needs.

``minhash_lsh_dedup`` keeps a single-hop min-neighbor representative
(the common web-dedup approximation, and its docstring says so): in a
chain A-B-C, B maps to A but C maps to B — C survives even though it is
transitively a duplicate of A. True deduplication groups by CONNECTED
COMPONENT of the near-dup graph. This module computes components with
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014), the
standard O(log n)-round method that a plain min-label propagation
(O(diameter) rounds) cannot match on long chains:

- **large-star**: every node u points its LARGER neighbors at the
  minimum of its neighborhood (min(N(u) ∪ {u})).
- **small-star**: every node u points its smaller-or-equal neighbors
  and itself at that minimum.

Each step is one constant-buffer min aggregate per node joined back
onto the edge rows (hub-safe: no node's neighborhood is ever collected
into one buffer — see ``_star_step``); rounds until the edge multiset
is stable (checksum compare: count + bit_xor of xxhash64(src,dst) —
exact, order-free). At fixpoint the edges form stars rooted at each
component's minimum id; star roots of any degree are plain row sets, so
there is no per-component member ceiling.

Spark-specific care for ITERATIVE dataframes (where naive loops die at
scale): each round's edge set is ``localCheckpoint``ed — without it the
lineage doubles per round and Catalyst analysis goes quadratic (the
classic iterative-algorithm failure on 20+ rounds at 10^9 edges).

DataX has no graph surface at all (readers/writers only); engine-added
for the LLM-data-pipeline dedup story. The driver oracle replays the
same pair set through an independent pure-python union-find
(oracle/pyref.py::components_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list → canonical (src>dst is fine; self-loops and
    duplicates dropped). Output columns: u, v."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    return e.filter(F.col("u") != F.col("v")).distinct()


def _star_step(e: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """One large-star (large=True) or small-star round.

    Works on the undirected neighborhood view (both directions) of the
    current edge set; emits the new directed edge list u→min.

    Hub-safe formulation: m(u) = min(N(u) ∪ {u}) is a plain ``min``
    aggregate (constant-size buffer) joined back onto the edge rows —
    never ``collect_set``, which would materialize a high-degree hub's
    ENTIRE neighborhood in one aggregation buffer (at 10^9 edges a web
    boilerplate hub, or the final star's own root whose degree is its
    whole component, is an executor OOM). Edge rows stream through the
    join one at a time, so per-task memory is independent of degree;
    this is what lets components grow past any fixed member ceiling.
    """
    both = e.select("u", "v").unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = both.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    joined = both.join(mins, "u").withColumn("m", m)
    if large:
        # u's strictly-larger neighbors each attach to m
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("n"), "m")
    else:
        # u's smaller-or-equal neighbors AND u itself attach to m
        out = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("n"), "m"
        ).unionAll(mins.select(F.col("u").alias("n"), m.alias("m")))
    out = out.filter(F.col("n") != F.col("m")).select(
        F.col("n").alias("u"), F.col("m").alias("v"))
    # ``dedup=False`` skips this step's distinct exchange; the star
    # algebra is multiset-insensitive (min aggregates ignore edge
    # multiplicity), so a round may dedupe ONCE after its second step —
    # set semantics are restored at every round boundary before the
    # signature/fixpoint check. Interleaved A/B (sf0.1 minhash pairs,
    # local[32], 3 reps): 4.3/4.3/3.7 s with per-step distinct vs
    # 3.4/3.8/3.5 s with per-round, identical components.
    return out.distinct() if dedup else out


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component =
    the minimum node id in its connected component. Nodes absent from the
    edge list are their own components — join the caller's node universe
    with ``F.coalesce(component, id)`` for the full assignment (see
    ``component_dedup``)."""
    e = _canonical_edges(edges, src, dst)
    # NOTE (r6, measured): do NOT persist/checkpoint the input edge plan
    # here. Round 1 references it from several branches, but Spark's
    # shuffle-file reuse already serves the repeated reads from the
    # first execution's map outputs — an interleaved A/B (minhash-pair
    # input, sf0.1, local[32], 3 reps) measured persist+count at
    # 5.6-6.2 s vs 4.5-5.4 s for the plain plan, i.e. the extra
    # materialization job costs more than the "recomputation" it saves.
    spark = edges.sparkSession
    prev_sig = None
    for round_idx in range(max_rounds):
        e = _star_step(e, large=True, dedup=False)
        e = _star_step(e, large=False)  # dedups for the round
        # cut lineage: iterative plans go quadratic without this
        e = e.localCheckpoint(eager=True)
        # order-insensitive multiset signature; bit_xor (not sum) because
        # ANSI mode makes summing 64-bit hashes throw on overflow
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(last signature {prev_sig}) — raise max_rounds")
    # fixpoint edges are u→root stars; roots themselves have no outgoing
    # edge, so add them back as their own component members
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct() \
             .withColumn("component", F.col("id"))
    return members.unionByName(roots).distinct()


def component_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one row (the component-minimum id) per near-dup COMPONENT —
    the transitive-closure upgrade of ``minhash_lsh_dedup``: in a chain
    A-B-C only A survives (single-hop would also keep C)."""
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("id") != F.col("component")).select("id")
    return df.join(losers, df[id_col] == losers["id"], "left_anti")
