"""Streaming extension tests: real Structured Streaming runs (parquet →
memory sink) must agree with the batch expression of the same window ops."""

import pytest
from pyspark.sql import functions as F

from compss_python_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from compss_python_spark.plans.registry import table

    return table(spark, sf_dir, "events").persist()


@pytest.fixture(scope="module")
def events_us_parquet(spark, events, tmp_path_factory):
    """events re-written with microsecond timestamps (streaming source can't
    read TIMESTAMP_NANOS either)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    events.write.mode("overwrite").parquet(path)
    return path


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, events, events_us_parquet):
    batch = W.tumbling_window_counts(events)
    schema = events.schema
    streamed = W.replay_as_stream(
        spark, events_us_parquet, schema, W.tumbling_window_counts, "t_tumble"
    )
    assert _canon(streamed) == _canon(batch)


def test_stream_session_equals_batch(spark, events, events_us_parquet):
    batch = W.session_window_stats(events)
    streamed = W.replay_as_stream(
        spark, events_us_parquet, events.schema, W.session_window_stats, "t_sess"
    )
    assert _canon(streamed) == _canon(batch)


def test_sliding_window_batch(events):
    out = W.sliding_window_counts(events)
    # every event lands in exactly window/slide = 2 windows
    total = out.agg(F.sum("n").alias("s")).first()["s"]
    assert total == 2 * events.count()


def test_streaming_dedup_drops_dupes(spark, events, events_us_parquet, tmp_path_factory):
    dup_path = str(tmp_path_factory.mktemp("stream") / "dup")
    events.limit(100).write.mode("overwrite").parquet(dup_path + "/a")
    events.limit(100).write.mode("overwrite").parquet(dup_path + "/b")
    stream = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(dup_path)
    out = W.streaming_dedup(stream, keys=("event_id",), watermark="100 days")
    q = out.writeStream.outputMode("append").format("memory").queryName("t_dedup").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_dedup").count()
    assert got == 100


def test_stream_stream_interval_join_equals_batch(spark, events, tmp_path_factory):
    """Two real streams joined on user_id within a 10-minute interval must
    produce exactly the batch interval-join pairs (append mode)."""
    base = tmp_path_factory.mktemp("stream")
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    vpath, cpath = str(base / "views"), str(base / "clicks")
    views.write.mode("overwrite").parquet(vpath)
    clicks.write.mode("overwrite").parquet(cpath)

    vs = spark.readStream.schema(views.schema).parquet(vpath)
    cs = spark.readStream.schema(clicks.schema).parquet(cpath)
    out = W.stream_stream_interval_join(vs, cs, within="10 minutes")
    q = out.writeStream.outputMode("append").format("memory").queryName("t_ssj").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = W.stream_stream_interval_join(views, clicks, within="10 minutes")
    assert _canon(spark.table("t_ssj")) == _canon(batch)
    assert spark.table("t_ssj").count() > 0


def test_stateful_running_totals_equals_batch(spark, events, events_us_parquet):
    """applyInPandasWithState per-key running totals: after replaying the
    whole table, the last emitted update per key must equal the batch agg."""
    from compss_python_spark.streaming.stateful import running_totals_stateful

    streamed = W.replay_as_stream(
        spark,
        events_us_parquet,
        events.schema,
        running_totals_stateful,
        "t_stateful",
        output_mode="update",
        max_files_per_trigger=4,  # force several micro-batches → state carries over
    )
    # update mode emits one row per key per micro-batch; the final state is
    # the row with the largest n per key.
    final = (
        streamed.groupBy("user_id")
        .agg(F.max(F.struct("n", "total")).alias("s"))
        .select("user_id", "s.n", "s.total")
    )
    batch = events.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    assert _canon(final) == _canon(batch)


def test_stream_static_enrich_equals_batch(spark, events, events_us_parquet):
    """Stream–static broadcast enrichment + tumbling agg == batch result."""
    from pyspark.sql import functions as F

    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("string").alias("segment"),
    )

    def build(src):
        enriched = W.stream_static_enrich(src, dim, "user_id")
        s = enriched.withWatermark("ts", "20 minutes") if enriched.isStreaming else enriched
        return s.groupBy(
            F.window("ts", "1 hour").alias("w"), "segment"
        ).agg(F.count("*").alias("n"))

    batch = {(r["w"]["start"], r["segment"]): r["n"] for r in build(events).collect()}
    streamed = W.replay_as_stream(
        spark, events_us_parquet, events.schema, build, "t_enrich"
    )
    got = {(r["w"]["start"], r["segment"]): r["n"] for r in streamed.collect()}
    assert got == batch


def test_stream_cms_equals_batch(spark, events, events_us_parquet):
    """A Count-Min sketch is one re-aggregable groupBy, so building it over
    a stream (complete mode) lands on exactly the batch sketch — the
    incremental-ingest story for the frequency sketch."""
    from compss_python_spark.functions.sketches import cms_build

    batch = cms_build(events, "user_id", width=64, depth=3)
    streamed = W.replay_as_stream(
        spark, events_us_parquet, events.schema,
        lambda df: cms_build(df, "user_id", width=64, depth=3),
        "t_cms", output_mode="complete",
    )
    assert _canon(streamed) == _canon(batch)


def test_streaming_curation_equals_batch(spark, sf_dir, tmp_path_factory):
    """End-to-end STREAMING corpus curation: a document stream runs the
    batch pipeline's expressions (quality score -> filter -> fingerprint
    dedup within watermark) and must keep exactly the batch survivors.
    Quality/fingerprint are shared narrow expressions, so stream==batch is
    the same-semantics guarantee the rest of the streaming module rides."""
    from compss_python_spark.llm import dedup, text
    from compss_python_spark.plans.registry import table
    from compss_python_spark.streaming import windows as W

    docs = (
        table(spark, sf_dir, "documents")
        .limit(300)
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    path = str(tmp_path_factory.mktemp("stream") / "docs")
    docs.write.mode("overwrite").parquet(path)

    def curate(df):
        scored = text.quality_score(df)
        kept = scored.filter(F.col("quality") >= 0.4)
        return text.fingerprint(kept).select("doc_id", "ts", "fp", "quality")

    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = W.streaming_dedup(curate(stream), keys=("fp",), watermark="100 days")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_cur").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.table("t_cur").collect()}
    # batch survivors: one doc per fingerprint among quality-kept docs
    batch = dedup.exact_dedup(curate(docs), "fp", "doc_id")
    expect = {r["doc_id"] for r in batch.collect()}
    # streaming keeps the FIRST arrival per fp (arrival order unspecified
    # within a micro-batch), batch keeps min-id: counts must match and the
    # kept fingerprints must be identical
    assert len(got) == len(expect) > 0
    fps = {r["fp"] for r in spark.table("t_cur").collect()}
    assert fps == {r["fp"] for r in batch.collect()}


def test_streaming_ewma_equals_sequential_reference(spark, events, tmp_path_factory):
    """True-recurrence streaming EWMA: replay time-range-ordered files
    (repartitionByRange on ts → part files in time order, 1 file per
    trigger → 3 micro-batches) and compare the final per-key state to a
    sequential pandas fold over the fully-sorted stream."""
    from compss_python_spark.streaming.stateful import streaming_ewma

    sub = events.filter("user_id < 40")
    path = str(tmp_path_factory.mktemp("stream") / "ewma_events")
    (
        sub.repartitionByRange(3, "ts")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    # FileStreamSource replays oldest-mtime-first; the three part files are
    # written by one job and can share an mtime, leaving tie order
    # unspecified.  Pin strictly increasing mtimes in part-name order
    # (repartitionByRange puts range i in part-0000i) so replay order IS
    # time order, deterministically.
    import glob as _glob, os as _os, time as _time

    base = _time.time() - 60
    for i, f in enumerate(sorted(_glob.glob(path + "/part-*"))):
        _os.utime(f, (base + i, base + i))
    streamed = W.replay_as_stream(
        spark, path, sub.schema, streaming_ewma, "t_sewma",
        output_mode="update", max_files_per_trigger=1,
    )
    final = (
        streamed.groupBy("user_id")
        .agg(F.max(F.struct("n_obs", "ewma")).alias("s"))
        .select("user_id", "s.n_obs", "s.ewma")
    )
    got = {r["user_id"]: (r["n_obs"], r["ewma"]) for r in final.collect()}

    pdf = sub.select("user_id", "ts", "event_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    want = {}
    for _, row in pdf.iterrows():
        u, x = row["user_id"], float(row["value"])
        if u not in want:
            want[u] = (1, x)
        else:
            n, e = want[u]
            want[u] = (n + 1, 0.3 * x + 0.7 * e)
    want = {u: (n, round(e, 6)) for u, (n, e) in want.items()}
    assert got == want


def test_foreach_batch_cdc_upsert_pipeline(spark, tmp_path):
    """Streaming micro-batches applied as CDC upserts via foreachBatch:
    the folded snapshot equals the batch latest-per-key answer regardless
    of batch boundaries (maxFilesPerTrigger=1 forces several batches).
    This is the canonical stream→table merge pattern: each micro-batch is
    a changelog slice, apply_changelog folds it into the running
    snapshot with last-writer-wins per key."""
    from compss_python_spark.operators.cdc import apply_changelog

    rows = [
        (1, "a", 10.0, 1), (2, "b", 20.0, 2), (1, "a2", 11.0, 3),
        (3, "c", 30.0, 4), (2, "b2", 21.0, 5), (3, None, 31.0, 6),
        (1, "a3", 12.0, 7), (4, "d", 40.0, 8),
    ]
    import glob
    import os
    import shutil
    import time

    # CDC contract: batches arrive in seq order (binlog semantics).  Write
    # one parquet file per 2-row slice with INCREASING mtimes — the file
    # source orders batches by modification time (same trick as the EWMA
    # replay fixture), so maxFilesPerTrigger=1 yields ordered batches.
    src = str(tmp_path / "changes")
    os.makedirs(src)
    for i in range(0, len(rows), 2):
        part = str(tmp_path / f"slice{i}")
        spark.createDataFrame(
            rows[i : i + 2], "k long, v string, amt double, seq long"
        ).coalesce(1).write.mode("overwrite").parquet(part)
        (f,) = glob.glob(part + "/part-*.parquet")
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copyfile(f, dst)
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))

    state = {"snap": spark.createDataFrame([], "k long, v string, amt double")}

    def fold(batch, batch_id):
        ch = batch.withColumn("op", F.lit("U"))
        snap = apply_changelog(state["snap"], ch, ["k"], "seq", "op")
        # materialize so the next batch folds against data, not lineage
        state["snap"] = spark.createDataFrame(
            snap.collect(), "k long, v string, amt double"
        )

    q = (
        spark.readStream.schema("k long, v string, amt double, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: (r["v"], r["amt"]) for r in state["snap"].collect()}
    # batch answer: max-seq row per key
    import collections

    best = {}
    for k, v, amt, seq in rows:
        if k not in best or seq > best[k][0]:
            best[k] = (seq, v, amt)
    want = {k: (v, amt) for k, (seq, v, amt) in best.items()}
    assert got == want
