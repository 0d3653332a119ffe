"""Data-bound two-point bench for the Motion-JPEG frame-decode family
(the BENCH/R5_SCALE.json pattern): video_frame_features over the
seeded MJPEG table at two sizes 10x apart. The media table is
materialized (localCheckpoint) BEFORE timing so the measured cost is
the decode stage itself — sample-table walk + per-frame JPEG decode +
feature projection — not fixture encoding.

Usage: python tools/bench_video_frames.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coap_rfc_knowledge_graph_spark.operators.multimodal import (
    synthetic_mjpeg_media,
    video_frame_features,
)
from coap_rfc_knowledge_graph_spark.session import build_session, warm_python_workers


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "VIDEO_FRAMES.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    spark = build_session(app_name="kg-bench-video-frames", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    out: dict = {"cpus": cpus}
    for label, n_videos in (("small", 1000), ("big", 10000)):
        media = synthetic_mjpeg_media(
            spark, n_videos, frames_per_video=12, partitions=cpus
        ).localCheckpoint(eager=True)
        times = []
        rows = 0
        for _ in range(repeat):
            t0 = time.monotonic()
            rows = video_frame_features(media, every_ms=1, dim=32).count()
            times.append(round(time.monotonic() - t0, 3))
        out[f"video_frames_{label}"] = {
            "n_videos": n_videos,
            "decoded_frames": rows,
            "min": min(times),
            "med": sorted(times)[len(times) // 2],
            "max": max(times),
        }
        media.unpersist()
    small, big = out["video_frames_small"], out["video_frames_big"]
    out["ratio_at_10x"] = round(big["min"] / small["min"], 3)
    out["frames_per_sec_big"] = round(big["decoded_frames"] / big["min"], 1)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
