"""L5g — the ANN recall-evaluation harness (q_ann_recall_eval):
plan gate + the semantics pins that make the eval trustworthy."""

from __future__ import annotations

from pyspec_spark.registry import QUERIES, load_all


def _df(spark, sf_dir):
    load_all()
    return QUERIES["q_ann_recall_eval"](spark, sf_dir)


def test_recall_eval_plan_no_funnel(spark, sf_dir):
    """Every ranking window is qid-partitioned (hash exchange) — no
    SinglePartition funnel, no unbroadcast cartesian product anywhere.
    BroadcastNestedLoopJoin(BuildRight, Cross) IS allowed: it is how
    crossJoin(broadcast(<bounded panel>)) compiles (the q_cosine_topk
    discipline) — the broadcast side is the |Q|-row query panel or the
    k-row centroid table, never the corpus."""
    p = _df(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p
    assert "CartesianProduct" not in p
    for ln in p.split("\n"):
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildRight, Cross" in ln


def test_recall_eval_semantics(spark, sf_dir):
    from pyspec_spark.queries.ml import _NQ_EVAL

    rows = {r.qid: r for r in _df(spark, sf_dir).collect()}
    assert set(rows) == set(range(_NQ_EVAL))
    for r in rows.values():
        # the query vector's own cell is its nearest centroid, so the
        # query itself is always a candidate -> top-1 (itself) always hits
        assert 1 <= r.n_match <= 10
        assert abs(r.recall - r.n_match / 10) < 1e-9
        assert r.n_cand >= r.n_match
