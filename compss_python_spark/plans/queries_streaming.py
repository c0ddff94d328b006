"""Declared queries: Structured Streaming replays (SURVEY.md §2.10).

The reference is batch-only; streaming is the engine extension the events
table motivates.  Until round 9 the streaming module was proven only by
stream/batch-equivalence unit tests — these queries make it DRIVER-proven:
each one drives a REAL Structured Streaming run (parquet file source →
micro-batches → memory sink, synchronously via processAllAvailable) inside
the query function and returns the materialized result, which a plain-SQL
DuckDB oracle then checks like any batch query.  The replay splits the
source into 4 files consumed one per micro-batch (maxFilesPerTrigger=1), so
cross-batch state — window merge, session merge, dedup state, per-key
applyInPandasWithState — is genuinely exercised, not simulated on a single
batch.

Determinism contract (why these CAN be hash-oracled):
- complete-mode aggregations and final-state reductions are independent of
  how rows land in micro-batches;
- the dedup replay injects EXACT duplicate rows, so whichever copy survives
  is byte-identical;
- watermarks are set wider than the fixture's full time span, so no row is
  ever late-dropped (the bounded-state behavior under tight watermarks is
  covered by tests/test_streaming.py, where lateness is constructed);
- the one order-sensitive recurrence (true sequential EWMA) replays from a
  single file so arrival order is the sorted batch order.

At scale the same topologies run unbounded: the memory sink becomes a real
sink, the file source a log/queue source, and state lives in the
RocksDB-backed state store partitioned by the grouping key.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from compss_python_spark.plans.registry import query, table
from compss_python_spark.streaming import stateful as S
from compss_python_spark.streaming import windows as W

_WM = "36500 days"  # wider than the fixture's time span: nothing is late


def _scratch_root() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".tmp", "io",
    )


def _data_tag(sf_dir: str) -> str:
    """sf-dir basename + events-parquet fingerprint, so a regenerated
    fixture invalidates the replay source (same contract as the MinHash
    index scratch — a stale copy would fail the oracle for a fixture
    problem, not a code bug)."""
    import hashlib

    ev = os.path.join(sf_dir, "events.parquet")
    stats = []
    for p in sorted(
        [ev] + ([os.path.join(ev, f) for f in os.listdir(ev)] if os.path.isdir(ev) else [])
    ):
        try:
            st = os.stat(p)
            stats.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            pass
    fp = hashlib.md5(";".join(stats).encode()).hexdigest()[:10]
    return f"{os.path.basename(sf_dir.rstrip('/')) or 'sf'}_{fp}"


def _ensure_stream_src(spark, sf_dir, *, kind: str, n_files: int) -> tuple[str, object]:
    """Write the events table (µs timestamps — the streaming source can't
    read TIMESTAMP_NANOS) to a scratch dir in ``n_files`` files, once per
    fixture generation.  kind='dups' writes every row TWICE (exact copies,
    projected to the dedup columns) for the streaming-dedup replay.
    Returns (path, schema-to-stream-with)."""
    ev = table(spark, sf_dir, "events")
    if kind == "dups":
        ev = ev.select("event_id", "ts", "event_type")
        ev = ev.unionAll(ev)
    path = os.path.join(_scratch_root(), f"stream_src_{kind}_{n_files}_{_data_tag(sf_dir)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev.repartition(n_files).write.mode("overwrite").parquet(path)
    return path, ev.schema


def _replay(spark, src, schema, builder, name, *, output_mode, one_batch=False,
            sink="memory", sf_dir=None):
    """sink="parquet" (row-preserving append replays — dedup, interval
    join, finalized sessions): the stream lands in scratch parquet and is
    read back, because a memory sink is a driver collect and a 300 M-row
    deduped stream blew spark.driver.maxResultSize at sfgen1000.  Window
    aggregates (small outputs) keep the memory sink."""
    sink_dir = None
    if sink == "parquet":
        sink_dir = os.path.join(
            _scratch_root(), f"stream_sink_{name}_{_data_tag(sf_dir)}"
        )
    return W.replay_as_stream(
        spark, src, schema, builder, query_name=name,
        output_mode=output_mode,
        max_files_per_trigger=None if one_batch else 1,
        sink=sink, sink_dir=sink_dir,
    )


def _ensure_sentinel_src(spark, sf_dir, *, n_files: int, cols: tuple[str, ...],
                         sentinel_vals: dict, prefix: str):
    """Events (projected to ``cols``) in ``n_files`` data files PLUS one
    sentinel file holding a single row whose event time is
    max(ts) + watermark-delay + 2 days (other columns from
    ``sentinel_vals``).  File mtimes are staged so the file source (which
    orders new files by modification time) consumes the sentinel in the
    LAST micro-batch: its arrival advances the watermark past every real
    window/session's end, finalizing them all in the trailing no-data
    batch — the append-mode topology a production stream reaches
    continuously, reproduced exactly once on a bounded fixture.  The
    sentinel's own window never finalizes (the watermark stays a full
    delay behind it), so append output contains ONLY real groups."""
    import datetime
    import glob
    import shutil
    import time as _time

    ev = table(spark, sf_dir, "events").select(*cols)
    path = os.path.join(_scratch_root(), f"{prefix}_{n_files}_{_data_tag(sf_dir)}")
    marker = os.path.join(path, "_SENTINEL_DONE")
    if not os.path.exists(marker):
        ev.repartition(n_files).write.mode("overwrite").parquet(path)
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        # _WM is "36500 days"; +2 days of slack puts the post-sentinel
        # watermark at max_ts + 2 days > every window/session end.
        sent_ts = max_ts + datetime.timedelta(days=36500 + 2)
        row = tuple(sent_ts if c == "ts" else sentinel_vals[c] for c in cols)
        sent_dir = path + "_sentinel"
        spark.createDataFrame([row], schema=ev.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(sent_dir)
        sent_part = glob.glob(os.path.join(sent_dir, "part-*.parquet"))[0]
        dst = os.path.join(path, "zz-sentinel.parquet")
        shutil.copyfile(sent_part, dst)
        shutil.rmtree(sent_dir, ignore_errors=True)
        now = _time.time()
        for i, f in enumerate(sorted(glob.glob(os.path.join(path, "part-*.parquet")))):
            os.utime(f, (now - 3600 + i, now - 3600 + i))
        os.utime(dst, (now, now))
        with open(marker, "w", encoding="utf-8"):
            pass
    return path, ev.schema


def _ensure_stream_src_sentinel(spark, sf_dir, *, n_files: int):
    """Sentinel source for the session replays: (user_id, ts, event_id)
    with a user_id=-1 finalizer row (see ``_ensure_sentinel_src``)."""
    return _ensure_sentinel_src(
        spark, sf_dir, n_files=n_files, cols=("user_id", "ts", "event_id"),
        sentinel_vals={"user_id": -1, "event_id": -1}, prefix="stream_src_sent",
    )


@query(
    "stream_tumbling_replay",
    sql="""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS w_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_replay(spark, sf_dir):
    """5-minute tumbling count/sum through a REAL stream: 4 micro-batches,
    complete mode — per-window partials merge in the state store across
    batches, so the oracle checks cross-batch window-state merge, not just
    the window expression (the batch twin `tumbling_window_agg` covers
    that)."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=4)
    return _replay(
        spark, src, schema,
        lambda s: W.tumbling_window_counts(s, watermark=_WM),
        "q_stream_tumble", output_mode="complete",
    )


@query(
    "stream_sliding_replay",
    sql="""
    WITH x AS (
      SELECT event_type, FLOOR(EPOCH(ts) / 300) * 300 AS b FROM events),
    w AS (
      SELECT event_type, b AS ws FROM x
      UNION ALL
      SELECT event_type, b - 300 AS ws FROM x)
    SELECT CAST(TO_TIMESTAMP(ws) AS TIMESTAMP) AS w_start, event_type,
           COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def stream_sliding_replay(spark, sf_dir):
    """Sliding windows (10-min length, 5-min slide) through a real stream,
    4 micro-batches, complete mode: every event lands in exactly TWO
    overlapping windows whose epoch-aligned starts are b and b−300 for
    b = 5-min bucket of ts — which is also how the oracle expands them
    (UNION ALL of the two bucketings), with the same cross-batch
    window-state merge contract as the tumbling replay."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=4)
    return _replay(
        spark, src, schema,
        lambda s: W.sliding_window_counts(s, watermark=_WM),
        "q_stream_slide", output_mode="complete",
    )


@query(
    "stream_session_replay",
    sql="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    sess AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked)
    SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def stream_session_replay(spark, sf_dir):
    """Session windows (30-min gap) through a real stream, complete mode,
    SINGLE micro-batch — the stream/batch-equivalence contract the unit
    tests prove.  Replay is deliberately NOT multi-batch: measured on this
    fixture, complete-mode session merge across micro-batches WITHOUT a
    watermark silently dropped ~half the rows (Spark's session-state
    finalization is watermark-driven; complete mode + no watermark is an
    unsupported corner it does not reject), and a watermark wider than the
    data span never finalizes any session in append mode.  (Historical
    note: this was the one unproven streaming shape through round 9 —
    `stream_session_multibatch` now drives the real multi-batch topology,
    append mode + watermark + a sentinel batch that finalizes every
    session.)  Cross-batch state is otherwise driver-proven by the
    tumbling/dedup/running-totals replays, whose merge semantics are
    watermark-independent.  Streaming allows one stateful aggregation per
    query, so the per-user rollup runs as a batch agg over the
    materialized per-session rows."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=1)
    sessions = _replay(
        spark, src, schema,
        lambda s: W.session_window_stats(s, watermark=_WM),
        "q_stream_sess", output_mode="complete", one_batch=True,
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "stream_dedup_replay",
    sql="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM (SELECT DISTINCT event_id, ts, event_type FROM events)
    GROUP BY event_type
    """,
)
def stream_dedup_replay(spark, sf_dir):
    """Bounded-state streaming dedup over a duplicate-injected stream (every
    event twice, exact copies, arriving in different micro-batches):
    `dropDuplicatesWithinWatermark` keeps one row per event_id across
    batches.  Survivors are byte-identical to their duplicates, so the
    result is deterministic; the per-type rollup runs as a batch agg over
    the deduped append-mode output."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="dups", n_files=4)
    deduped = _replay(
        spark, src, schema,
        lambda s: W.streaming_dedup(s, keys=("event_id",), watermark=_WM),
        "q_stream_dedup", output_mode="append", sink="parquet", sf_dir=sf_dir,
    )
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("id_sum")
    )


@query(
    "stream_interval_join_replay",
    sql="""
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS event_id_r, r.ts AS ts_r
    FROM events l JOIN events r ON l.user_id = r.user_id
    WHERE l.event_type = 'view' AND r.event_type = 'click'
      AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
)
def stream_interval_join_replay(spark, sf_dir):
    """STREAM–STREAM inner interval join (view→click attribution within
    10 minutes) with BOTH sides real streams over the same replayed
    source, 4 micro-batches each, append mode — a view buffered in batch
    1 joins clicks arriving in batches 2–4, so cross-batch join state is
    genuinely exercised.  Inner-join output is batching-independent as
    long as no state is evicted: the watermark is wider than the fixture
    span, so every (view, click) pair within the interval is emitted
    exactly once and the batch twin's oracle (`interval_join_events`)
    applies unchanged.  The bounded-state behavior under tight watermarks
    (buffered left rows dropped once the right watermark passes
    left.ts + interval) is covered by tests/test_streaming.py, where
    lateness is constructed."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=4)

    def builder(stream):
        views = stream.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )
        clicks = stream.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        return W.stream_stream_interval_join(
            views, clicks, within="10 minutes", watermark=_WM
        )

    return _replay(
        spark, src, schema, builder, "q_stream_ivjoin", output_mode="append",
        sink="parquet", sf_dir=sf_dir,
    )


@query(
    "stream_stateful_running_totals",
    sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_running_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) driver-proven: each
    user's (count, sum) state survives across 4 micro-batches; update mode
    emits one row per touched key per batch, so the FINAL state per key is
    the row with the largest running count (strictly increasing), selected
    with max_by after materialization.  The Python kernel is the declared
    slow path — two numbers of state per key; the shuffle is the same hash
    partition a groupBy pays."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=4)
    updates = _replay(
        spark, src, schema, S.running_totals_stateful, "q_stream_totals",
        output_mode="update",
    )
    return updates.groupBy("user_id").agg(
        F.max("n").alias("n"), F.max_by("total", "n").alias("total")
    )


@query(
    "stream_ewma_sequential",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
    FROM events GROUP BY user_id
    """,
)
def stream_ewma_sequential(spark, sf_dir):
    """TRUE sequential EWMA (e ← α·x + (1−α)·e) as a stateful streaming
    operator — the unbounded recurrence the batch operator
    (operators/timeseries.ewma_bounded) deliberately truncates.  Replayed
    from a single file so arrival order is the per-batch (ts, event_id)
    sort.  Hash-proving an order-sensitive float recurrence cross-engine
    needs BIT determinism, not rounding: a first attempt with α=0.3 and
    fixed-dp rounding double-rounded onto .5 boundaries (2/150 users
    flipped at 4 dp).  With α=0.25 both α and 1−α are exactly
    representable doubles, the per-step ops (two mults, one add) run in
    the same IEEE order in both engines, and the unrounded accumulators
    match bit-for-bit (measured: 150/150 users identical to DuckDB's
    list_reduce over the ts-ordered value list)."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=1)
    out = _replay(
        spark, src, schema,
        lambda s: S.streaming_ewma(s, alpha=0.25, round_dp=None),
        "q_stream_ewma", output_mode="update", one_batch=True,
    )
    return out.select("user_id", "n_obs", "ewma")


@query(
    "stream_session_multibatch",
    sql="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    sess AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked)
    SELECT user_id, COUNT(DISTINCT sess_id) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def stream_session_multibatch(spark, sf_dir):
    """CROSS-BATCH session-window merge, driver-proven in the topology a
    real session pipeline runs: APPEND mode + a real watermark, 4
    micro-batches of randomly-assigned events (so one user's session
    fragments merge in the state store across batches), then a sentinel
    fifth batch (user_id=-1, event time past max(ts) + delay) that
    advances the watermark beyond every real session's end — Spark
    finalizes and emits ALL sessions in the trailing no-data micro-batch,
    exactly how an unbounded stream continuously retires sessions as the
    watermark passes them.  The sentinel's own session never finalizes
    (the watermark trails it by the full delay), so it cannot leak into
    the append output; the result-side user_id >= 0 filter is belt and
    braces.  This closes the shape `stream_session_replay` deliberately
    avoided (complete mode + no watermark silently LOSES rows on
    multi-batch session merge — a measured Spark corner, see that query's
    docstring); gap semantics unchanged: windows that exactly touch merge
    (oracle uses strict >).  Streaming allows one stateful aggregation
    per query, so the per-user rollup runs as a batch agg over the
    finalized per-session rows."""
    src, schema = _ensure_stream_src_sentinel(spark, sf_dir, n_files=4)
    sessions = _replay(
        spark, src, schema,
        lambda s: W.session_window_stats(s, watermark=_WM),
        "q_stream_sess_mb", output_mode="append", sink="parquet", sf_dir=sf_dir,
    )
    return (
        sessions.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@query(
    "stream_tumbling_append",
    sql="""
    SELECT CAST(TO_TIMESTAMP(FLOOR(EPOCH(ts) / 300) * 300) AS TIMESTAMP) AS w_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_append(spark, sf_dir):
    """Tumbling windows in APPEND mode — the production output mode for
    time windows (complete mode re-emits the whole result every batch;
    append emits each window exactly once, when the watermark passes its
    end).  Same sentinel-finalizer machinery as
    `stream_session_multibatch`: 4 micro-batches of real events merge
    per-window partials in the state store, then a sentinel batch
    (event_type 'zz_sentinel', ts past max(ts) + delay) advances the
    watermark beyond every real window's end, so Spark finalizes and
    appends ALL real windows in the trailing no-data batch.  The
    sentinel's own window never finalizes (the watermark trails it by the
    full delay) and cannot leak into the output; the event_type filter is
    belt and braces.  The oracle is the SAME batch SQL as the
    complete-mode twin `stream_tumbling_replay` — append emits every
    finalized window once, so the materialized results are identical; the
    hash equality between the two replays IS the proof that append-mode
    finalization loses nothing."""
    src, schema = _ensure_sentinel_src(
        spark, sf_dir, n_files=4, cols=("ts", "event_type", "value"),
        sentinel_vals={"event_type": "zz_sentinel", "value": 0.0},
        prefix="stream_src_sentw",
    )
    out = _replay(
        spark, src, schema,
        lambda s: W.tumbling_window_counts(s, watermark=_WM),
        "q_stream_tumble_app", output_mode="append",
    )
    return out.filter(F.col("event_type") != "zz_sentinel")


@query(
    "stream_sliding_append",
    sql="""
    WITH x AS (
      SELECT event_type, FLOOR(EPOCH(ts) / 300) * 300 AS b FROM events),
    w AS (
      SELECT event_type, b AS ws FROM x
      UNION ALL
      SELECT event_type, b - 300 AS ws FROM x)
    SELECT CAST(TO_TIMESTAMP(ws) AS TIMESTAMP) AS w_start, event_type,
           COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def stream_sliding_append(spark, sf_dir):
    """Sliding windows (10-min length, 5-min slide) in APPEND mode, via
    the same sentinel finalizer as `stream_tumbling_append`: every event
    lands in two overlapping windows whose state merges across 4
    micro-batches; the sentinel batch advances the watermark past every
    real window's end and the trailing no-data batch appends them all
    exactly once.  Oracle identical to the complete-mode twin
    `stream_sliding_replay` (UNION ALL of the two bucketings)."""
    src, schema = _ensure_sentinel_src(
        spark, sf_dir, n_files=4, cols=("ts", "event_type", "value"),
        sentinel_vals={"event_type": "zz_sentinel", "value": 0.0},
        prefix="stream_src_sentw",
    )
    out = _replay(
        spark, src, schema,
        lambda s: W.sliding_window_counts(s, watermark=_WM),
        "q_stream_slide_app", output_mode="append",
    )
    return out.filter(F.col("event_type") != "zz_sentinel")


@query(
    "stream_static_enrich_replay",
    sql="""
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def stream_static_enrich_replay(spark, sf_dir):
    """Stream–static broadcast enrichment through a REAL stream: every
    micro-batch (4 of them) joins against the static customer dimension
    via `stream_static_enrich` — the standard attach-metadata-to-events
    topology.  The join is stateless (no watermark, no state store): the
    static side broadcasts, so the stream never shuffles; at 100 TB/day
    this is the shape that keeps enrichment off the shuffle service
    entirely.  Inner-join here (every fixture user_id has a customer row;
    the operator's default left-join is equivalent on this data but inner
    keeps the oracle a plain JOIN).  Complete-mode rollup by segment ×
    event_type makes the result batching-independent; the value sum
    accumulates as exact integer cents (events.value is 2-dp by
    construction), so the hash is summation-order-proof at any SF."""
    src, schema = _ensure_stream_src(spark, sf_dir, kind="full", n_files=4)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    def builder(stream):
        enriched = W.stream_static_enrich(stream, dim, "user_id").filter(
            F.col("c_mktsegment").isNotNull()
        )
        cents = F.round(F.col("value") * 100, 0).cast("long")
        return enriched.groupBy("c_mktsegment", "event_type").agg(
            F.count("*").alias("n"), F.sum(cents).alias("total_cents")
        )

    return _replay(
        spark, src, schema, builder, "q_stream_enrich", output_mode="complete"
    )
