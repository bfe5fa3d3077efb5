"""Audio landmark fingerprinting (operators/audiofp.py): margin
measurement, noise-domination sanity, golden-fixture agreement, and
the q_audio_fp_dedup planted-pair recovery."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspec_spark.operators.audiofp import audio_landmarks
from pyspec_spark.operators.codecs import decode_wav, encode_wav
from pyspec_spark.operators.multimodal import degrade_audio, synth_melody

SF = "/root/testdata/sf0.001"


def _fp(samples):
    dec, _ = decode_wav(encode_wav(samples))
    return audio_landmarks(dec[:, 0])


def test_audiofp_margins():
    """True (clean, degraded) pairs share >=149 landmark hashes;
    distinct clips share <=29 — threshold 60 sits in the gap with
    >2x margin on both sides."""
    fps = []
    for i in range(8):
        clean = synth_melody(i)
        fps.append(_fp(clean))
        fps.append(_fp(degrade_audio(clean, seed=i)))
    intra = [len(fps[2 * i] & fps[2 * i + 1]) for i in range(8)]
    inter = [
        len(fps[i] & fps[j])
        for i in range(16)
        for j in range(i + 1, 16)
        if not (j == i + 1 and i % 2 == 0)
    ]
    assert min(intra) >= 149
    assert max(inter) <= 29


def test_degrade_is_noise_dominated():
    """The planted degradation genuinely destroys time-domain
    similarity (correlation of the sample vectors < 0.5) — the
    fingerprint match is doing real work, not matching near-identical
    bytes."""
    clean = synth_melody(0).astype(np.float64)
    deg = degrade_audio(synth_melody(0), seed=0).astype(np.float64)
    r = np.corrcoef(clean, deg)[0, 1]
    assert abs(r) < 0.5


def test_audiofp_identical_and_empty():
    clip = synth_melody(2)
    assert audio_landmarks(clip) == audio_landmarks(clip.copy())
    assert audio_landmarks(np.zeros(100, dtype=np.int16)) == set()


def test_audiofp_matches_committed_golden():
    """The committed golden parquet (the q_audio_fp_dedup oracle
    input) reproduces from the live encode+decode+fingerprint chain."""
    want = pd.read_parquet("tests/fixtures/audiofp_golden.parquet")
    rows = []
    for i in range(8):
        clean = synth_melody(i)
        for j, s in enumerate((clean, degrade_audio(clean, seed=i))):
            for h in sorted(_fp(s)):
                rows.append({"media_id": 2 * i + j, "lhash": h})
    pd.testing.assert_frame_equal(
        pd.DataFrame(rows),
        want.sort_values(["media_id", "lhash"]).reset_index(drop=True),
    )


def test_q_audio_fp_dedup_recovers_planted_pairs(spark):
    from pyspec_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_audio_fp_dedup"](spark, SF).collect()
    assert [(r["media_a"], r["media_b"]) for r in rows] == [
        (2 * i, 2 * i + 1) for i in range(8)
    ]
    assert all(r["n_shared"] >= 60 for r in rows)
