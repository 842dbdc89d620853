"""Structured Streaming restart semantics: a file-source stream with a
checkpoint must process each input file EXACTLY ONCE across restarts --
the second run picks up only files that arrived after the first run's
offsets, and the sink never duplicates rows. This is the guarantee a
100 TB/day ingest leans on when the driver dies mid-day."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_file_stream_restart_is_exactly_once(spark, sf_small, tmp_path):
    src = pq.read_table(f"{sf_small}/events.parquet")
    n = src.num_rows
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    indir.mkdir()

    first = src.slice(0, n // 2)
    second = src.slice(n // 2)
    pq.write_table(first, str(indir / "batch1.parquet"))

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(str(indir)).schema)
            .parquet(str(indir))
            .select("event_id", "user_id", "value")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(outdir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = spark.read.parquet(str(outdir))
    assert got1.count() == n // 2

    # second file arrives; restart from the SAME checkpoint
    pq.write_table(second, str(indir / "batch2.parquet"))
    run()
    got2 = spark.read.parquet(str(outdir))
    assert got2.count() == n  # no reprocessing of batch1, no loss
    ids = got2.select("event_id").distinct().count()
    src_ids = len(set(src.column("event_id").to_pylist()))
    assert ids == src_ids

    # third restart with NO new input must be a no-op
    run()
    assert spark.read.parquet(str(outdir)).count() == n
