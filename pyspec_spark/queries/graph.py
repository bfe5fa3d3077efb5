"""Link-graph signals (round 5b) — fixed-iteration PageRank over a
bipartite interaction graph, fully declarative and oracle-replayable.

Reference loci (SURVEY.md §0 policy): none in `stuwilkins/pyspec` —
north-star surface.  Crawl-curation pipelines use link-graph authority
(PageRank/harmonic centrality over the host graph) as a document
quality prior; the TPC-H stand-in graph is the part <-> supplier
bipartite graph from `lineitem` (an edge per distinct pair), which has
the right shape: two node classes, skewed degrees, ~|lineitem| edges.

Algorithm: Brin & Page 1998, damping d = 0.85, K = 2 unrolled
iterations.  The unroll complements the engine's other iterative
postures — connected components (bounded driver loop + checkpoints,
operators/dedup.py) and PCA power iteration (in-plan matvec,
operators/pca.py): PageRank-for-K-iterations is pure relational
algebra, so the whole computation stays in ONE Catalyst plan — no
driver loop, no action, zero jobs at build (the registry gate applies).

Determinism (§5.3): all rank state is INTEGER nano-units (1e9).
Each edge contribution is FLOOR(pr_nano / deg) — exact integer-valued
doubles (< 2^53), so the per-node SUM is order-independent; the damped
update re-snaps via FLOOR.  Both engines compute bit-identical ranks
at every iteration, so the oracle matches exactly, not approximately.

Scale notes (100 TB posture):
- each iteration is one shuffle join (edges x ranks on src, both sides
  keyed) + one keyed aggregation; K iterations = 2K corpus-sized
  shuffles, known up front.  Degree skew (hot suppliers) is AQE skew-join
  territory, same answer as the gridder's hot-voxel posture.
- the edge list materializes ONCE (cache() on the degree-joined edge
  table; every iteration and the node/N derivations share it).  A
  production run at 100 TB persists edges to storage instead
  (write_bucketed by src) so every iteration's join is shuffle-free on
  the edge side — VERIFIED in test_graph_html.py: the bucketed layout
  drops exactly the edge-side exchange with identical ranks (bucket
  count must equal the join's required partition count, or the planner
  ignores the layout and shuffles both sides).
- no driver-side state at all: N and the teleport term are 1-row
  broadcast aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table

_PR_D = 0.85
_PR_ITERS = 2
_PR_TOPK = 20


def _pr_iteration(edges_deg: DataFrame, pr: DataFrame, n: DataFrame):
    """One PageRank step: pr'(v) = floor(0.15e9/N) +
    floor(0.85 * sum_{u->v} floor(pr(u)/deg(u))), all integer nano."""
    # r13 (second pass): join condition + rank arithmetic as parsed SQL
    # (1:1 transliteration; column names are disjoint across the sides)
    msgs = edges_deg.join(pr, F.expr("src = node")).selectExpr(
        "dst AS node", "floor(pr / deg) AS contrib"
    )
    return (
        msgs.groupBy("node")
        .agg(F.expr("SUM(contrib)").alias("s"))
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "node",
            f"(floor(0.15e9 / n) + floor({_PR_D}D * s)) AS pr",
        )
    )


_PAGERANK_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS c,
                  's:' || CAST(l_suppkey AS VARCHAR) AS k
  FROM lineitem
),
edges AS (
  SELECT c AS src, k AS dst FROM e0
  UNION ALL
  SELECT k AS src, c AS dst FROM e0
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (SELECT node, FLOOR(1e9 / n.n) AS pr FROM nodes, n),
m1 AS (
  SELECT e.dst AS node, SUM(FLOOR(p.pr / d.deg)) AS s
  FROM edges e
  JOIN pr0 p ON p.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT node, FLOOR(0.15e9 / n.n) + FLOOR({_PR_D} * s) AS pr FROM m1, n
),
m2 AS (
  SELECT e.dst AS node, SUM(FLOOR(p.pr / d.deg)) AS s
  FROM edges e
  JOIN pr1 p ON p.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT node, FLOOR(0.15e9 / n.n) + FLOOR({_PR_D} * s) AS pr FROM m2, n
)
SELECT node, pr / 1e9 AS pagerank
FROM pr2
ORDER BY pr DESC, node
LIMIT {_PR_TOPK}
"""


@query("q_pagerank", oracle=_PAGERANK_ORACLE)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.3/§2.4): the graph runs on INTEGER node ids
    # (part -> 2p, supplier -> 2s+1 — a bijection, so the graph is
    # isomorphic and every per-node quantity identical); the "p:<id>"/
    # "s:<id>" strings are reconstructed only for the final top-K
    # projection.  The as-built plan scanned lineitem 4x because the
    # string-pair distinct was re-planned under each union branch (2x
    # for edges, 2x for deg); caching the distinct pair table and
    # deriving both edge directions with one map-side explode leaves
    # ONE scan + one integer distinct, and every shuffle afterwards
    # carries 3 longs instead of 2 strings.  Measured cold re-exec at
    # sf0.1: 5.36 -> 1.4 s, identical output (oracle hash-green).
    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    li = table(spark, sf_dir, "lineitem")
    # Tracked persists (r14, VERDICT r13 item 5 — formerly bare
    # .cache()s that lived for the session; release_persisted drains).
    pairs = track_persist(
        spark,
        f"q_pagerank#pairs#{next(PERSIST_SEQ)}",
        li.selectExpr(
            "CAST(l_partkey AS BIGINT) AS p",
            "CAST(l_suppkey AS BIGINT) AS s",
        ).distinct(),
    )
    edges = pairs.selectExpr(
        "explode(array(named_struct('src', p * 2, 'dst', s * 2 + 1),"
        " named_struct('src', s * 2 + 1, 'dst', p * 2))) AS e"
    ).select("e.src", "e.dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # the one edge materialization every reference shares (the in-plan
    # equivalent of the "materialize edges once" posture the module
    # docstring prescribes for production).  persist() is lazy: zero
    # jobs at build (gate).
    edges_deg = track_persist(
        spark,
        f"q_pagerank#edges_deg#{next(PERSIST_SEQ)}",
        edges.join(deg, "src").select("src", "dst", "deg"),
    )
    nodes = edges_deg.selectExpr("src AS node").distinct()
    n = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n)).selectExpr(
        "node", "floor(1e9 / n) AS pr"
    )
    for _ in range(_PR_ITERS):
        # guide §3.1 — pick the broadcast side deliberately: left to
        # its estimates the planner broadcast the EDGE cache (5.5x the
        # rank table's rows) into every iteration join; the rank table
        # is |nodes|-sized and strictly smaller.  At 100 TB neither
        # side broadcasts — that posture is the bucketed-by-src edge
        # layout (write_bucketed), measured in test_graph_html.py.
        pr = _pr_iteration(edges_deg, F.broadcast(pr), n)
    return (
        pr.selectExpr(
            "concat(CASE WHEN node % 2 = 0 THEN 'p:' ELSE 's:' END,"
            " CAST(shiftright(node, 1) AS STRING)) AS node",
            "(pr / 1e9) AS pagerank",
        )
        .orderBy(F.desc("pagerank"), "node")
        .limit(_PR_TOPK)
    )


# ---------------------------------------------------------------------------
# L18b — triangle counting (r7): the third classic distributed graph
# kernel after CC and PageRank — per-node triangle membership over the
# near-dup graph (a doc in many triangles sits in a DENSE duplication
# clique, the "template farm" signature that pairwise thresholds
# under-report).  Algorithm: the id-oriented two-join — edges are
# stored (a < b), wedges join e1.b = e2.a (giving i < j < k exactly
# once), and a final join back to the edge set closes each wedge; per
# node, count memberships across all three corners.
#
# Determinism: pure integer joins on the oracle-shared q_jaccard pair
# basis (spliced CTE — the edge set cannot drift).
#
# 100 TB posture: the i<j<k orientation counts each triangle once with
# two equi-joins and NO all-pairs step; the known skew axis is a
# high-degree hub (its wedge count is deg² / 2) — the production
# mitigation is degree-ordered orientation, IMPLEMENTED as
# oriented_edges(orient="degree") below (r8): same chain join, wedge
# fan-out bounded by graph degeneracy instead of raw degree,
# per-node counts equality-property-tested against id order, and the
# planted-hub wedge bound asserted directly.  Id order keeps the
# oracle exactly replayable, so the declared query stays on it.
# ---------------------------------------------------------------------------
def _triangles_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    return f"""
WITH pairs AS ({ORACLES["q_jaccard_neardup"]}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
tri AS (
  SELECT e1.a AS i, e1.b AS j, e2.b AS k
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
m AS (
  SELECT i AS node FROM tri
  UNION ALL SELECT j FROM tri
  UNION ALL SELECT k FROM tri
)
SELECT node AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM m
GROUP BY node
ORDER BY doc_id
"""


def oriented_edges(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Acyclic orientation of an undirected, deduplicated (a < b) edge
    list -> directed (src, dst).

    orient="id": src=a, dst=b — the node id is the total order; exactly
    replayable in the SQL oracle, used by the declared query.

    orient="degree" (r8, the documented skew mitigation made real):
    every edge points from the lower- to the higher-(degree, id)
    endpoint.  Wedge centers then fan out only toward HIGHER-degree
    nodes, so a node's out-degree — and with it the wedge count it
    generates, out-deg choose 2 — is bounded by the graph's degeneracy
    / O(sqrt(m)) instead of its raw degree: the hub that generates
    deg^2/2 wedges under id order generates none as a center.  One
    extra degree aggregation + broadcast-join per build; triangle
    counts are identical (equality property-tested)."""
    # r13 (second pass): projections as parsed SQL (1:1 transliteration
    # of the former Column chain)
    if orient == "id":
        return edges.selectExpr("a AS src", "b AS dst")
    if orient != "degree":
        raise ValueError(f"orient must be 'id' or 'degree', got {orient!r}")
    deg = (
        edges.selectExpr("a AS node")
        .unionAll(edges.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    er = (
        edges.join(deg.selectExpr("node AS a", "deg AS dega"), "a")
        .join(deg.selectExpr("node AS b", "deg AS degb"), "b")
    )
    a_first = "(dega < degb) OR (dega = degb AND a < b)"
    return er.selectExpr(
        f"CASE WHEN {a_first} THEN a ELSE b END AS src",
        f"CASE WHEN {a_first} THEN b ELSE a END AS dst",
    )


def oriented_wedges(edges: DataFrame, orient: str = "id") -> DataFrame:
    """(i, j, k) wedges i->j->k of the chosen orientation — the
    intermediate whose size IS the algorithm's cost, exposed so the
    skew tests can assert the degree orientation's bound directly."""
    d = oriented_edges(edges, orient)
    e1, e2 = d.alias("e1"), d.alias("e2")
    return e1.join(e2, F.expr("e1.dst = e2.src")).selectExpr(
        "e1.src AS i", "e1.dst AS j", "e2.dst AS k"
    )


def triangle_memberships(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Each triangle exactly once as (i, j, k), i->j->k->closing i->k:
    any total-order orientation is a DAG, so transitivity guarantees
    the closing edge (if present) is directed i->k — the same chain
    join closes both orientations."""
    d = oriented_edges(edges, orient)
    wedges = oriented_wedges(edges, orient)
    e3 = d.alias("e3")
    return wedges.join(
        e3, F.expr("i = e3.src AND k = e3.dst")
    ).select("i", "j", "k")


@query("q_triangles", oracle=_triangles_oracle())
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.queries.llm import jaccard_pairs

    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    # persist the edge list once (the pagerank precedent): without it,
    # every self-join alias re-runs the whole shingle/jaccard pipeline —
    # the as-built plan showed 72 parquet scans, vs 1 pipeline + 3
    # in-memory reads here.  Tracked (r14): release_persisted drains.
    e = track_persist(
        spark,
        f"q_triangles#edges#{next(PERSIST_SEQ)}",
        jaccard_pairs(spark, sf_dir).selectExpr("doc_a AS a", "doc_b AS b"),
    )
    tri = triangle_memberships(e, orient="id")
    m = (
        tri.selectExpr("i AS node")
        .unionAll(tri.selectExpr("j AS node"))
        .unionAll(tri.selectExpr("k AS node"))
    )
    return (
        m.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .selectExpr("node AS doc_id", "n_triangles")
        .orderBy("doc_id")
    )
