#!/usr/bin/env python
"""Throughput probe for the r9 FLAC decode path: media count xk (1 s
of 16 kHz audio each, the LPC+mid-side encode so decode exercises the
real-world tier), full decode + per-window feature aggregation (the
extract_audio_features shape) through mapInPandas on local[32]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    import numpy as np

    from pyspec_spark.operators.flac import encode_flac
    from pyspec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        synth_audio,
    )

    spark = get_spark("scale_probe_r9d")
    print("| k | media rows | samples | decode+features wall | Msamples/s |")
    print("|---|---|---|---|---|")
    for k in (8, 32, 128, 512):
        rows = []
        for i in range(k):
            mono = synth_audio(i % 8, n=16000)
            st = np.stack([mono, np.roll(mono, 7)], axis=1)
            payload = encode_flac(st, stereo_mode="mid_side",
                                  lpc=([2, -1], 3, 0))
            rows.append((i, "audio", "flac", None, None, 16000,
                         bytearray(payload)))
        media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32).cache()
        media.count()

        def run():
            extract_audio_features(media).groupBy().sum("rms").collect()

        t = _best_of(run, n=2)
        n_samp = k * 16000 * 2
        print(f"| {k} | {k} | {n_samp} | {t * 1000:.0f} ms |"
              f" {n_samp / t / 1e6:.2f} |", flush=True)
        media.unpersist()


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
