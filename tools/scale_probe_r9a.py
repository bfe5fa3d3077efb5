#!/usr/bin/env python
"""Throughput probe for the r8 hvc1 PCM (CABAC-framed) decode path: media count xk
(frames fixed at 4, 60x44 px), full demux+decode+feature aggregation
(the q_hevc_ipcm_frames shape) through mapInPandas on local[32].  Decode
is embarrassingly parallel across media rows — wall should stay near-
flat until rows ~ cores, then grow linearly."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from pyspec_spark.operators.mp4 import make_hevc_ipcm_mp4
    from pyspec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_hevc_ipcm_sample,
        ipcm_pattern,
    )
    from pyspec_spark.operators.mp4 import (
        extract_mp4_samples,
        parse_mp4_metadata,
    )

    spark = get_spark("scale_probe_r9a")
    w, h, frames = 60, 44, 4
    print("| k | media rows | frames | decode+agg wall | frames/s |")
    print("|---|---|---|---|---|")
    for k in (8, 32, 128, 512):
        rows = []
        for i in range(k):
            planes = [ipcm_pattern(i, f, w, h) for f in range(frames)]
            payload = make_hevc_ipcm_mp4(planes, w, h)
            rows.append((i, "video", "mp4", w, h, frames, bytearray(payload)))
        media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32).cache()
        media.count()

        def run():
            def dec(batches):
                for pdf in batches:
                    out = []
                    for _, r in pdf.iterrows():
                        payload = bytes(r["payload"])
                        meta = parse_mp4_metadata(payload)
                        v = next(t for t in meta["tracks"]
                                 if t["handler"] == "vide")
                        ww, hh = v["hevc"]["width"], v["hevc"]["height"]
                        _, samples = extract_mp4_samples(payload)
                        for fi, s in enumerate(samples):
                            y, cb, cr = decode_hevc_ipcm_sample(s, ww, hh)
                            out.append({
                                "media_id": int(r["media_id"]),
                                "frame_id": fi,
                                "y_sum": int(y.sum(dtype=np.int64)),
                            })
                    yield pd.DataFrame(
                        out, columns=["media_id", "frame_id", "y_sum"])

            media.mapInPandas(
                dec, "media_id BIGINT, frame_id INT, y_sum BIGINT"
            ).groupBy().sum("y_sum").collect()

        t = _best_of(run, n=2)
        n_frames = k * frames
        print(f"| {k} | {k} | {n_frames} | {t * 1000:.0f} ms |"
              f" {n_frames / t:.0f} |", flush=True)
        media.unpersist()


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
