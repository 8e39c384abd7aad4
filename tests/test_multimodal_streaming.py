"""Multimodal binary-column plumbing + Structured Streaming operators."""

import pytest
from pyspark.sql import functions as F

from smartpy_arc_spark.multimodal.binary import (
    attach_payload,
    decode_image_meta,
    frame_sample,
)
from smartpy_arc_spark.streaming.stream import (
    read_events_stream,
    run_stream_to_memory,
    streaming_sessionize,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "abcdefgh" * 10), (2, "xy"), (3, None)]
    df = spark.createDataFrame(rows, "item_id long, text string")
    return attach_payload(df, "text")


def test_decode_stub_metadata(media):
    out = {r.item_id: r for r in decode_image_meta(media).collect()}
    assert out[1].n_bytes == 80
    assert out[1].width == 80 % 640 and out[1].height == (80 * 7) % 480
    assert out[1].format == "png"
    assert out[3].n_bytes is None  # null payload passes through


def test_decode_real_path_sniffs_containers(spark):
    """stub=False runs the real pure-Python decoders: JPEG/PNG/BMP magic
    bytes are sniffed, dimensions come from actual decodes, junk payloads
    degrade to null metadata instead of failing the batch."""
    import numpy as np

    from smartpy_arc_spark.multimodal.codecs import make_bmp, make_png
    from smartpy_arc_spark.multimodal.jpeg import make_jpeg

    img = np.full((10, 12, 3), (40, 90, 200), dtype=np.uint8)
    rows = [
        (1, bytearray(make_jpeg(img, quality=85))),
        (2, bytearray(make_png(img))),
        (3, bytearray(make_bmp(img))),
        (4, bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r.item_id: r for r in decode_image_meta(media, stub=False).collect()}
    for i, fmt in ((1, "jpeg"), (2, "png"), (3, "bmp")):
        assert out[i].format == fmt and (out[i].width, out[i].height) == (12, 10)
    assert out[4].format is None and out[4].width is None
    assert out[4].n_bytes == 19


def test_resize_real_path_decodes_and_reencodes(spark):
    """stub=False: JPEG in → decoded → nearest-neighbor resample →
    lossless PNG out with the requested dimensions."""
    import numpy as np

    from smartpy_arc_spark.multimodal.binary import resize_image
    from smartpy_arc_spark.multimodal.codecs import parse_png
    from smartpy_arc_spark.multimodal.jpeg import make_jpeg

    img = np.full((20, 30, 3), (10, 200, 60), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(make_jpeg(img, quality=100))), (2, bytearray(b"junk"))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in
           resize_image(media, width=8, height=6, stub=False).collect()}
    small = parse_png(bytes(out[1].payload))
    assert small.shape == (6, 8, 3)
    # constant-color q100 JPEG decodes exactly, so the resample is too
    assert len(np.unique(small.reshape(-1, 3), axis=0)) == 1
    assert out[2].payload is None


def test_jpeg_codec_roundtrip_psnr():
    """Real entropy-coded DCT roundtrip: gradients survive quality-90
    encode/decode above 30 dB PSNR (4:4:4) / 20 dB (4:2:0 chroma loss),
    and dimensions are exact for non-multiple-of-8 sizes."""
    import numpy as np

    from smartpy_arc_spark.multimodal.jpeg import make_jpeg, parse_jpeg

    y, x, c = np.meshgrid(np.arange(21), np.arange(35), np.arange(3),
                          indexing="ij")
    img = ((y * 7 + x * 3 + c * 40) % 256).astype(np.uint8)
    for subsample, floor_db in ((False, 30.0), (True, 20.0)):
        dec = parse_jpeg(make_jpeg(img, quality=90, subsample=subsample))
        assert dec.shape == img.shape
        mse = float(np.mean((dec.astype(float) - img.astype(float)) ** 2))
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr > floor_db, (subsample, psnr)


def test_jpeg_constant_color_quality100_closed_form():
    """Quality-100 constant-color blocks decode EXACTLY to the YCbCr
    integer roundtrip (the jpeg_decode oracle contract)."""
    import math

    import numpy as np

    from smartpy_arc_spark.multimodal.jpeg import make_jpeg, parse_jpeg

    def closed_form(r, g, b):
        cl = lambda v: min(255, max(0, math.floor(v + 0.5)))
        y = cl(0.299 * r + 0.587 * g + 0.114 * b)
        cb = cl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = cl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        return (cl(y + 1.402 * (cr - 128)),
                cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
                cl(y + 1.772 * (cb - 128)))

    for i, color in enumerate([(200, 30, 99), (0, 0, 0), (255, 255, 255),
                               (17, 250, 3), (128, 128, 128)]):
        img = np.full((16, 24, 3), color, dtype=np.uint8)
        dec = parse_jpeg(make_jpeg(img, quality=100, subsample=bool(i % 2)))
        uniq = np.unique(dec.reshape(-1, 3), axis=0)
        assert len(uniq) == 1 and tuple(uniq[0]) == closed_form(*color)


def test_frame_sample_shapes(media):
    frames = frame_sample(media, n_frames=4).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r.item_id, []).append(r)
    assert len(by_item[1]) == 4
    assert sorted(r.frame_idx for r in by_item[1]) == [0, 1, 2, 3]
    assert b"".join(bytes(r.frame) for r in sorted(by_item[1], key=lambda r: r.frame_idx))
    assert 3 not in by_item  # null payload skipped


def test_streaming_window_counts_matches_batch(spark, sf_dir):
    from smartpy_arc_spark import scan

    stream = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(windowed_event_counts(stream))
    batch = (
        scan(spark, sf_dir, "events", nanos_ts_cols=["ts"])
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    got = {(r.window_start, r.event_type): (r.n_events, r.total_value)
           for r in result.collect()}
    want = {(r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in batch.collect()}
    assert got == want


def test_streaming_first_seen_stateful(spark, sf_dir):
    from smartpy_arc_spark import scan
    from smartpy_arc_spark.streaming.stream import streaming_first_seen

    stream = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(
        streaming_first_seen(stream), output_mode="append"
    )
    ev = scan(spark, sf_dir, "events", nanos_ts_cols=["ts"])
    batch_first = {
        r.user_id: r.first_ts
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("first_ts")).collect()
    }
    got = {r.user_id: r.first_ts for r in result.collect()}
    assert got == batch_first  # one row per key, at the key's first event time


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    from smartpy_arc_spark import scan
    from smartpy_arc_spark.operators.sessionize import sessionize

    stream = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(streaming_sessionize(stream))
    ev = scan(spark, sf_dir, "events", nanos_ts_cols=["ts"])
    batch = (
        sessionize(ev, tiebreak_col="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r.user_id, r.session_start): r.n_events for r in result.collect()}
    want = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert got == want


def test_extract_features_stub(media):
    from smartpy_arc_spark.multimodal.binary import extract_features

    out = {r.item_id: r.features
           for r in extract_features(media, dim=4).collect()}
    # deterministic arithmetic fake; null payload → null vector
    for item_id, vec in out.items():
        if vec is not None:
            assert len(vec) == 4
            assert all(0.0 <= x < 1.0 for x in vec)
    normed = extract_features(media, dim=4, normalize=True).collect()
    for r in normed:
        if r.features is not None:
            assert abs(sum(x * x for x in r.features) - 1.0) < 1e-5

    # real path: non-container payloads (plain text bytes) → null vectors
    real = {r.item_id: r.features
            for r in extract_features(media, stub=False).collect()}
    assert all(v is None for v in real.values())


def test_resize_image_stub(media):
    from smartpy_arc_spark.multimodal.binary import resize_image

    out = resize_image(media, width=8, height=4).collect()
    for r in out:
        assert (r.width, r.height) == (8, 4)
        if r.payload is not None:
            assert len(r.payload) == 32


def test_stream_upsert_to_parquet(spark, sf_dir, tmp_path):
    """foreachBatch MERGE: stream the events table into a parquet state
    store keyed by user_id (latest event per user wins via pre-dedup)."""
    from smartpy_arc_spark.streaming.stream import (
        read_events_stream,
        stream_upsert_to_parquet,
    )
    from pyspark.sql import functions as F

    target = str(tmp_path / "state.parquet")
    stream = read_events_stream(spark, sf_dir)
    # one row per user per batch: keep the max-event_id row via dedup on
    # sorted struct (deterministic)
    latest = (
        stream.withWatermark("ts", "1 day")
        .groupBy("user_id")
        .agg(F.max(F.struct("event_id", "event_type")).alias("_last"))
        .select(
            "user_id",
            F.col("_last.event_id").alias("event_id"),
            F.col("_last.event_type").alias("event_type"),
        )
    )
    stream_upsert_to_parquet(
        latest, target, "user_id", checkpoint=str(tmp_path / "ckpt")
    )

    import duckdb

    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(target).collect()
    }
    exp = {
        int(u): (int(e), t)
        for u, e, t in duckdb.sql(
            f"""SELECT user_id, max_by(event_id, event_id),
                       max_by(event_type, event_id)
                FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
        ).fetchall()
    }
    assert got == exp


def test_streaming_checkpoint_restart_exactly_once(spark, tmp_path):
    """File-source + checkpoint resume: a restarted query processes only
    files that arrived after the first run — no reprocessing, no loss."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.range(0, 100).withColumn("batch", F.lit(1)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema("id long, batch int")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(sink)
    assert first.count() == 100

    # new files land; a fresh query on the SAME checkpoint must process
    # exactly the delta
    spark.range(100, 150).withColumn("batch", F.lit(2)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 150                      # no duplicates, no loss
    assert out.select("id").distinct().count() == 150
    assert out.where("batch = 2").count() == 50


def test_streaming_interval_join_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: unmatched clicks surface with null
    right side once the watermark passes; matched ones carry the purchase.
    Outer state flushes on the SECOND drain (same checkpoint), when later
    data has advanced the watermark — the documented SS emission model."""
    import datetime as dt

    from pyspark.sql import functions as F

    from smartpy_arc_spark.streaming.stream import streaming_interval_join_outer

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(src)

    # the join looks BACK: u1's click at +30min matches the purchase at t0;
    # u2's click has no purchase in its lookback window
    write([
        (1, t0 + dt.timedelta(minutes=30), 1, "click"),
        (2, t0, 1, "purchase"),
        (3, t0 + dt.timedelta(minutes=30), 2, "click"),
    ])

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).parquet(src)
        q = (
            streaming_interval_join_outer(
                stream.withColumn("value", F.lit(0.0)),
                lookback="1 hour", watermark="1 hour",
            )
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain()
    # far-future events on BOTH sides: the global watermark is the MIN of
    # the per-stream watermarks, so each input must advance for outer state
    # to flush
    write([
        (98, t0 + dt.timedelta(hours=12), 9, "click"),
        (99, t0 + dt.timedelta(hours=12), 9, "purchase"),
    ])
    drain()
    got = {
        (r["left_id"], r["right_id"], r["matched"])
        for r in spark.read.parquet(sink).collect()
    }
    assert (1, 2, True) in got          # matched pair
    assert (3, None, False) in got      # unmatched click emitted as outer row


def test_eventgen_streaming_source_deterministic_and_replayable(spark, tmp_path):
    """Custom streaming Python data source: offset-tracked batches, stable
    rows, and checkpoint replay continuing from the committed offset."""
    import time

    from smartpy_arc_spark.sources.eventgen import _row, register_eventgen

    register_eventgen(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain(min_rows):
        q = (
            spark.readStream.format("eventgen")
            .option("rows_per_batch", 50)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= min_rows:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        return spark.read.parquet(sink)

    first = drain(100)
    n1 = first.count()
    assert n1 >= 100
    got = {r["event_id"]: (r["user_id"], r["event_type"], r["value"])
           for r in first.collect()}
    assert len(got) == n1                    # offsets never re-emit within a run
    for i in (0, 1, 49):                     # deterministic content
        exp = _row(i)
        assert got[i] == (exp[2], exp[3], exp[4])

    # restart from the same checkpoint: the second run appends strictly
    # NEW ids — committed offsets are never re-emitted into the sink
    second = drain(n1 + 50)
    ids = [r["event_id"] for r in second.collect()]
    assert len(ids) == len(set(ids))         # no duplicates across restart
    assert len(ids) > n1                     # and it kept producing


def test_streaming_state_bounded_by_watermark(spark, tmp_path):
    """100 TB evidence: windowed-aggregate state does not grow with stream
    length — the watermark evicts closed windows, so state rows stay at
    the (windows-in-flight) level instead of accumulating one per window
    ever seen."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write(day):
        rows = [
            (day * 1000 + i, t0 + dt.timedelta(days=day, minutes=10 * i), i % 5)
            for i in range(60)
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long"
        ).coalesce(1).write.mode("append").parquet(src)

    state_rows = []

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long"
        ).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        for p in q.recentProgress:
            for so in p.stateOperators:
                state_rows.append(so.numRowsTotal)

    # three successive days of data, each drained separately: every drain
    # sees ~10h of open windows, never the whole history
    for day in range(3):
        write(day)
        drain()

    assert state_rows, "no state metrics captured"
    # each day emits 10 hourly windows; bounded state stays ~that order,
    # and must NOT accumulate across days (30+ windows by day 3)
    assert max(state_rows[-2:]) <= 15, state_rows
    # the sink accumulated every closed window exactly once
    out = spark.read.parquet(sink)
    assert out.count() >= 20
    assert out.groupBy("window").count().where("count > 1").count() == 0
