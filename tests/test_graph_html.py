"""Round-5b: HTML extraction round-trip/edge cases and PageRank
goldens (independent numpy fixed-point replication + mass accounting).
Cross-engine value equality of q_html_extract / q_pagerank is covered
by the declared-queries oracle sweep; these pin the semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspec_spark.operators.text import html_to_text
from pyspec_spark.queries.curation import _HTML_POST, _HTML_PRE, _HTML_SEP
from pyspec_spark.queries.graph import _PR_D, _PR_ITERS, _pr_iteration
from tests.conftest import SF_SMALL

_CHROME_PRE = "Doc "
_CHROME_POST = " \"cite' © 2026 <corp>"


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).collect()[0].t


def test_html_roundtrip_on_corpus_sample(spark):
    """extract(wrap(text)) == 'Doc ' + text + footer for real corpus
    rows — the property that makes the in-plan synthesized-HTML oracle
    meaningful."""
    from pyspec_spark.tables import table

    rows = (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    for r in rows:
        html = _HTML_PRE + r.text.replace(" ", _HTML_SEP) + _HTML_POST
        expected = " ".join((_CHROME_PRE + r.text + _CHROME_POST).split())
        assert _extract(spark, html) == expected


def test_html_double_encoded_entity_decodes_once(spark):
    """'&amp;lt;' is an escaped literal '&lt;' — decoding &amp; last
    must yield the 4-char string, not '<'."""
    assert _extract(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_html_script_with_raw_angle_bracket(spark):
    """Script bodies may contain raw '<'; the block strip must remove
    the whole element before the generic tag pass."""
    assert _extract(spark, "<script>if (a < b) x();</script>hi") == "hi"
    assert _extract(spark, "<style>p < q {}</style>ok") == "ok"


def test_html_extract_documented_limits(spark):
    """The regex stripper's documented trade-offs, pinned so they
    cannot drift silently (operators/text.py block comment):
    - plain text is a fixed point;
    - entity decoding REVEALS encoded markup, so extraction is
      single-pass by contract (a second pass strips the revealed tag —
      why the pipeline runs this stage exactly once);
    - a bare '< ... >' span is consumed by the generic tag regex even
      when it is comparison text, and a '>' inside a quoted attribute
      value terminates the tag early (a conformant HTML5 tokenizer
      needs a stateful parser — out of scope for the codegen path)."""
    plain = _extract(spark, "plain words only")
    assert plain == "plain words only"
    assert _extract(spark, plain) == plain
    once = _extract(spark, "a &lt;tag&gt; b")
    assert once == "a <tag> b"
    assert _extract(spark, once) == "a b"  # single-pass contract
    assert _extract(spark, "x < y and y > z") == "x z"
    assert _extract(spark, '<a title="a>b">link</a>') == 'b">link'


def test_html_extract_fuzz_never_crashes_and_strips_all_tags(spark):
    """Randomized tag soup: extraction always succeeds and the output
    contains no '<tag' remnants (every complete tag is consumed)."""
    import random

    rng = random.Random(42)
    words = ["alpha", "beta", "&amp;", "&lt;", "x<y", "z>w", "plain"]
    tags = ["<p>", "</p>", "<div class='c'>", "</div>", "<br/>",
            "<script>s<1</script>", "<style>p{}</style>"]
    rows = []
    for _ in range(60):
        parts = []
        for _ in range(rng.randint(1, 12)):
            parts.append(rng.choice(words + tags))
        rows.append((" ".join(parts),))
    df = spark.createDataFrame(rows, "html string")
    out = [
        r.t for r in df.select(html_to_text(F.col("html")).alias("t")).collect()
    ]
    assert len(out) == 60
    for t in out:
        # no complete tag survives the strip
        assert "<p>" not in t and "</p>" not in t and "<div" not in t
        assert "<script" not in t and "<style" not in t


def _numpy_pagerank_nano(edges, d, iters):
    """Independent replication of the integer nano-unit fixed point."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    pr = {v: math.floor(1e9 / n) for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += math.floor(pr[u] / deg[u])
        pr = {
            v: math.floor(0.15e9 / n) + math.floor(d * s[v]) for v in nodes
        }
    return pr


def test_pagerank_iteration_matches_independent_reference(spark):
    """Two _pr_iteration steps on a small fixed graph reproduce the
    numpy/pure-python fixed-point exactly (integer nano-units)."""
    raw = [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y")]
    edges = raw + [(t, s) for s, t in raw]
    e = spark.createDataFrame(edges, "src string, dst string")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = e.join(deg, "src").select("src", "dst", "deg")
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.floor(F.lit(1e9) / F.col("n")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        pr = _pr_iteration(edges_deg, pr, n)
    got = {r.node: r.pr for r in pr.collect()}
    want = _numpy_pagerank_nano(edges, _PR_D, _PR_ITERS)
    assert got == want


def test_pagerank_bucketed_edges_drop_edge_side_shuffle(spark, tmp_path):
    """SCALING.md's claimed next lever, verified: with the edge table
    at rest bucketed by src (sinks.write_bucketed), the per-iteration
    rank join no longer shuffles the edge side — the plan loses one
    exchange vs the unbucketed layout (only the rank side aligns)."""
    from pyspec_spark.plans import count_exchanges, physical_plan
    from pyspec_spark.sinks import write_bucketed

    raw = [(f"u{i}", f"v{i % 5}") for i in range(40)]
    edges = raw + [(t, s) for s, t in raw]
    e = spark.createDataFrame(edges, "src string, dst string").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = e.join(deg, "src").select("src", "dst", "deg")
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.floor(F.lit(1e9) / F.col("n")).alias("pr")
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # both layouts AT REST, so the only difference is the bucket
        # metadata — not the edge-derivation subtree
        plain_path = str(tmp_path / "pr_edges_plain")
        edges_deg.write.mode("overwrite").parquet(plain_path)
        plain_edges = spark.read.parquet(plain_path)
        # bucket count == spark.sql.shuffle.partitions (8 in tests):
        # one-sided bucket utilization requires the required hash
        # distribution to match the bucket partitioning exactly,
        # otherwise the planner shuffles both sides
        write_bucketed(
            edges_deg,
            "pr_edges_bucketed_t",
            ["src"],
            8,
            path=str(tmp_path / "pr_edges"),
        )
        bucketed = spark.table("pr_edges_bucketed_t")
        plain = physical_plan(_pr_iteration(plain_edges, pr, n))
        bplan = physical_plan(_pr_iteration(bucketed, pr, n))
        assert count_exchanges(bplan) == count_exchanges(plain) - 1
        # and the two layouts agree on the ranks themselves
        got = {
            r.node: r.pr for r in _pr_iteration(bucketed, pr, n).collect()
        }
        want = {
            r.node: r.pr for r in _pr_iteration(plain_edges, pr, n).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed_t")


def test_pagerank_mass_is_conserved_within_floor_loss(spark):
    """Total rank mass stays ~1: each node loses at most a few nano
    from the three FLOORs per iteration, never gains."""
    raw = [(f"u{i}", f"v{i % 7}") for i in range(50)]
    edges = raw + [(t, s) for s, t in raw]
    e = spark.createDataFrame(edges, "src string, dst string").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = e.join(deg, "src").select("src", "dst", "deg")
    nodes = e.select(F.col("src").alias("node")).distinct()
    n_val = nodes.count()
    n = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.floor(F.lit(1e9) / F.col("n")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        pr = _pr_iteration(edges_deg, pr, n)
    total = pr.agg(F.sum("pr")).collect()[0][0] / 1e9
    # floor losses: < (2*E + N+1) nano per iteration, far under 1e-3
    assert 0.999 <= total <= 1.0 + 1e-9
    assert n_val == 57  # 50 u-nodes + 7 v-nodes


def test_triangles_match_networkx_style_recount(spark):
    """Per-node triangle counts equal an adjacency-set recount of the
    same jaccard edge set, and the total incidences are 3x the triangle
    count."""
    from collections import defaultdict

    from pyspec_spark.queries.graph import q_triangles
    from pyspec_spark.queries.llm import jaccard_pairs

    sf = "/root/testdata/sf0.001"
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(spark, sf).select("doc_a", "doc_b").collect()
    ]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if b < c:  # a < b < c exactly once
                n_tri += 1
                for v in (a, b, c):
                    want[v] += 1
    rows = {r["doc_id"]: r["n_triangles"] for r in q_triangles.__wrapped__(spark, sf).collect()}
    assert rows == dict(want)
    assert sum(rows.values()) == 3 * n_tri
    assert n_tri >= 1
