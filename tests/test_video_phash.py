"""L37b — video perceptual near-dup (r13): margin measurement, golden
reproduction from the live mux+demux+decode+hash chain, planted-pair
recovery through the declared query, the banding recall argument, and
the no-all-pairs plan gate."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"
_FR = (0, 2, 4, 6)


def _signatures(spark):
    from pyspec_spark.operators.multimodal import (
        make_video_phash_media,
        video_phash,
    )

    sig = video_phash(make_video_phash_media(spark, n_base=6), sample_every=2)
    return {
        (int(r["media_id"]), int(r["frame_idx"])): int(r["phash"])
        for r in sig.collect()
    }


def _dsum(sig, a, b):
    from pyspec_spark.operators.phash import hamming64

    return sum(hamming64(sig[(a, f)], sig[(b, f)]) for f in _FR)


def test_video_phash_margins_and_golden(spark):
    """Re-encode pairs total <= 14 bits over the 4 sampled frames,
    distinct clips >= 28 — tau=20 sits in the gap with margin both
    sides — and the committed golden parquet (the oracle input)
    reproduces exactly from the live chain."""
    sig = _signatures(spark)
    intra = [_dsum(sig, 2 * i, 2 * i + 1) for i in range(6)]
    inter = [
        _dsum(sig, 2 * a + ja, 2 * b + jb)
        for a in range(6)
        for b in range(a + 1, 6)
        for ja in (0, 1)
        for jb in (0, 1)
    ]
    assert max(intra) <= 14
    assert min(inter) >= 28

    want = pd.read_parquet("tests/fixtures/video_phash_golden.parquet")
    got = {
        (int(r.media_id), int(r.frame_idx)): int(r.phash)
        for r in want.itertuples()
    }
    assert got == sig

    # the banding guarantee's premise: every true pair has SOME frame
    # within 7 bits (total <= tau means avg <= tau/4 = 5 < 8)
    from pyspec_spark.operators.phash import hamming64

    for i in range(6):
        assert min(
            hamming64(sig[(2 * i, f)], sig[(2 * i + 1, f)]) for f in _FR
        ) <= 7


def test_q_video_phash_dedup_recovers_planted_pairs(spark):
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_video_phash_dedup"](spark, SF).collect()
    assert [(r["media_a"], r["media_b"]) for r in rows] == [
        (2 * i, 2 * i + 1) for i in range(6)
    ]
    assert all(r["ham_total"] <= 20 for r in rows)


def test_video_phash_plan_has_no_cartesian(spark):
    """Candidates come from the (frame_idx, band, value) equi-join —
    no all-pairs path may exist in the plan."""
    from pyspec_spark import registry
    from pyspec_spark.plans import physical_plan

    registry.load_all()
    df = registry.QUERIES["q_video_phash_dedup"].__wrapped__(spark, SF)
    p = physical_plan(df)
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_video_phash_samples_only_requested_frames(spark):
    """sample_every=4 over 8-frame clips hashes frames 0 and 4 only —
    the signature is bounded by the sampling rate, not the clip."""
    from pyspec_spark.operators.multimodal import (
        make_video_phash_media,
        video_phash,
    )

    sig = video_phash(
        make_video_phash_media(spark, n_base=2), sample_every=4
    )
    got = sorted(
        (int(r["media_id"]), int(r["frame_idx"])) for r in sig.collect()
    )
    assert got == [(m, f) for m in range(4) for f in (0, 4)]
