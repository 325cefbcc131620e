"""Structured Streaming throughput smoke: measured rows/s through the
§2.9 streaming operators, the streaming counterpart of scale_smoke.py.

Protocol: replicate the sf0.1 events table into a temp landing
directory as SPLITS parquet files (a file-source micro-batch stream;
``maxFilesPerTrigger`` forces multiple micro-batches the way a real
landing zone trickles files), run each operator to completion with
Trigger.AvailableNow into a memory sink, and report wall time,
micro-batch count, and input rows/s from the query's own progress
metrics.

The numbers are single-node local[*] throughput — the point is a
measured baseline (and regression signal) for state-heavy operators:
windowed aggs should sustain near-batch scan rates; stream-stream
joins and applyInPandasWithState pay state-store + (for the latter)
Arrow-transfer costs, visible here.

Usage: python tools/stream_smoke.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ucl_data_pipeline_spark import get_spark
from ucl_data_pipeline_spark.sources.io import read_table
from ucl_data_pipeline_spark.streaming.windows import (
    dedup_within_watermark,
    interval_join_stream,
    read_events_stream,
    session_window_stream,
    sliding_window_stream,
    tumbling_window_stream,
    user_running_totals_stream,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPLITS = int(os.environ.get("STREAM_SPLITS", "16"))
FILES_PER_TRIGGER = int(os.environ.get("STREAM_FILES_PER_TRIGGER", "2"))


def _run(df, checkpoint_dir: str, output_mode: str = "append"):
    """Run to completion (AvailableNow), return (wall_s, progresses)."""
    name = f"smoke_{uuid.uuid4().hex[:12]}"
    t0 = time.time()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    return wall, list(q.recentProgress)


def main() -> None:
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="stream_smoke_")
    try:
        landing = os.path.join(tmp, "landing")
        events = read_table(spark, SRC, "events")
        n_input = events.count()
        events.repartition(SPLITS).write.mode("overwrite").parquet(landing)

        def stream():
            return read_events_stream(
                spark, landing, max_files_per_trigger=FILES_PER_TRIGGER
            )

        ops = {
            "tumbling_window_stream": (
                lambda: tumbling_window_stream(stream()), "update"),
            "sliding_window_stream": (
                lambda: sliding_window_stream(stream()), "update"),
            # session windows don't support update mode (merging state);
            # append emits sessions finalized by the watermark
            "session_window_stream": (
                lambda: session_window_stream(stream()), "append"),
            "dedup_within_watermark": (
                lambda: dedup_within_watermark(
                    stream(), ["user_id", "event_type", "value"]), "append"),
            "interval_join_stream": (
                lambda: interval_join_stream(stream(), stream()), "append"),
            "user_running_totals_stream": (
                lambda: user_running_totals_stream(stream()), "update"),
        }
        out: dict[str, dict] = {}
        for op_name, (build, mode) in ops.items():
            ckpt = os.path.join(tmp, f"ckpt_{op_name}")
            wall, progresses = _run(build(), ckpt, mode)
            # interval_join reads the landing dir twice (both sides)
            rows_in = sum(int(p["numInputRows"]) for p in progresses)
            out[op_name] = {
                "wall_sec": round(wall, 2),
                "micro_batches": len(progresses),
                "input_rows": rows_in,
                "rows_per_sec": round(rows_in / wall) if wall > 0 else None,
            }
        print(json.dumps(
            {"sf_dir": SRC, "events_rows": n_input, "splits": SPLITS,
             "files_per_trigger": FILES_PER_TRIGGER, "operators": out},
            indent=2,
        ))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
