"""Audio landmark fingerprinting — constellation hashes for audio
near-dup detection, pure numpy (clean-room from the published
landmark/constellation construction: STFT → spectral peaks → anchored
peak pairs → packed (f1, f2, Δt) hashes).

Why this exists: the audio analog of operators/phash.py — two WAV
payloads of the SAME recording at a different level or with added
noise share no bytes, so byte/minhash dedup cannot see them.  Spectral
peaks survive level changes (magnitude order is scale-invariant) and
additive noise (a sine's FFT gain is N/2·A against the noise's √N·σ),
so landmark-hash overlap separates re-recordings from distinct content
with a wide margin: measured in tests/test_audiofp.py, a 0.4× level
drop plus σ=600 additive noise (noise-dominated in the time domain)
keeps ≥149 shared hashes per true pair while distinct clips share ≤29.

Scale shape mirrors the MinHash corpus path: each clip emits a bounded
set of int64 hashes, candidates come from hash equality (one groupBy
shuffle on the exploded hash table), and the pair score is the shared
count — never an all-pairs comparison over clips.
"""

from __future__ import annotations

import numpy as np

FP_WIN = 512          # STFT window (samples)
FP_HOP = 256          # STFT hop
FP_PER_FRAME = 2      # spectral peaks kept per frame
FP_FAN_DT = 6         # target zone: pair anchors with peaks 1..FAN_DT frames ahead
FP_FMIN = 2           # ignore DC / first bin


def _stft_mag(x: np.ndarray) -> np.ndarray:
    """Hann-windowed magnitude spectrogram, frames × (FP_WIN//2+1)."""
    w = np.hanning(FP_WIN)
    n = (len(x) - FP_WIN) // FP_HOP + 1
    if n <= 0:
        return np.zeros((0, FP_WIN // 2 + 1))
    frames = np.stack(
        [x[i * FP_HOP : i * FP_HOP + FP_WIN] * w for i in range(n)]
    )
    return np.abs(np.fft.rfft(frames, axis=1))


def _peaks(mag: np.ndarray) -> list[tuple[int, int]]:
    """Per-frame top-FP_PER_FRAME local maxima along the frequency
    axis, (frame, bin) pairs.  Ties break by lower bin — deterministic
    by construction (the margin tests keep real signals far from
    ties)."""
    out: list[tuple[int, int]] = []
    for t in range(mag.shape[0]):
        row = mag[t]
        loc = [
            f
            for f in range(FP_FMIN, len(row) - 1)
            if row[f] > row[f - 1] and row[f] >= row[f + 1]
        ]
        loc.sort(key=lambda f: (-row[f], f))
        out.extend((t, f) for f in sorted(loc[:FP_PER_FRAME]))
    return out


def audio_landmarks(samples: np.ndarray) -> set[int]:
    """Landmark hash set of a mono float/int sample vector: every peak
    anchors pairs with peaks 1..FP_FAN_DT frames ahead at a DIFFERENT
    bin (same-bin pairs carry no melody information and would collide
    across any two clips sharing one note), packed
    f1<<22 | f2<<12 | Δt — fits comfortably in int64."""
    x = np.asarray(samples, dtype=np.float64)
    pk = _peaks(_stft_mag(x))
    by_t: dict[int, list[int]] = {}
    for t, f in pk:
        by_t.setdefault(t, []).append(f)
    hashes: set[int] = set()
    for t1, f1 in pk:
        for dt in range(1, FP_FAN_DT + 1):
            for f2 in by_t.get(t1 + dt, []):
                if f2 != f1:
                    hashes.add((f1 << 22) | (f2 << 12) | dt)
    return hashes
