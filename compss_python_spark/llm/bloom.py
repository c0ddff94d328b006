"""Bloom-filter membership for corpus-scale dedup / decontamination.

Use case at 100 TB: testing incoming documents against a reference key set
(already-crawled URLs, benchmark fingerprints, a previous snapshot's doc
hashes) whose RAW keys are too big to broadcast — 1B 60-byte keys is
~60 GB — but whose Bloom bitmap at ~10 bits/key is ~1.25 GB and broadcasts
fine.  False positives (rate set by m/n and k) drop a small, tunable
fraction of genuinely-novel documents; false negatives are impossible, so
nothing already seen ever slips through.

Engine-portable hash family (Kirsch–Mitzenmacher double hashing): h1/h2 are
the first/second 48 bits of md5(key), position_j = (h1 + j*h2) mod m.  Both
halves are recomputable in ANSI SQL (`CAST('0x'||substr(md5(k),…) AS
BIGINT)`), so a DuckDB oracle can reproduce the bitmap AND the membership
verdicts bit-for-bit — including the false positives.

Plan shape: position derivation is a per-row JVM expression (no Python);
the build is one explode + one map-combined groupBy on byte index (sparse
path, bounded by the bit count) or per-partition numpy bitmaps OR-merged on
the driver (dense path, bounded by nbytes × partitions); membership is a
narrow scan whose only Python is an Arrow-batched numpy bitmap gather.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MAX_BITMAP_BYTES = 1 << 30  # 1 GiB broadcast budget
_SPARSE_MAX_SET_BITS = 4_000_000  # above this, collect bitmaps not rows
_LITERAL_BITMAP_MAX_BITS = 1 << 16  # ≤1024-long array literal → pure-JVM membership


def _h48(col, offset: int):
    """48-bit integer from md5 hex digits [offset, offset+12) — fits a
    BIGINT exactly in Spark (`conv`) and DuckDB (`'0x'||substr`)."""
    return F.conv(
        F.substring(F.md5(F.encode(col, "UTF-8")), offset, 12), 16, 10
    ).cast("long")


def bloom_positions(col, m: int, k: int):
    """array<long> of the k bit positions for a key: (h1 + j*h2) mod m.

    h1, h2 < 2^48 and j < k, so h1 + j*h2 stays well inside int64 for any
    practical k (< 2^15)."""
    h1, h2 = _h48(col, 1), _h48(col, 13)
    return F.array(*[((h1 + F.lit(j) * h2) % F.lit(m)) for j in range(k)])


@dataclass
class BloomFilter:
    bits: np.ndarray  # uint8, length ceil(m/8)
    m: int
    k: int

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.bits).sum())


def bloom_build(
    df: DataFrame, key_col: str, m: int, k: int = 5, method: str = "auto"
) -> BloomFilter:
    """Build a Bloom filter over ``df[key_col]`` (distributed; the driver
    only ever materializes the bitmap, never the keys).

    ``method='sparse'`` aggregates lit BYTES — one groupBy(byte_index) with
    map-side bit_or combine, collect bounded by min(k·n, m/8) rows.  Right
    when the key set is far smaller than m (the usual sizing).
    ``method='dense'`` has each partition build a local numpy bitmap
    (Arrow-batched) and ORs the ≤32 bitmaps on the driver — right when
    k·n approaches m and row-collect would dwarf the bitmap itself.
    ``'auto'`` picks by a count() probe against a 4M set-bit threshold,
    the same size-adaptive pattern as graph/components.py.

    Null keys are excluded from the build (a null hashes to nothing; see
    :func:`bloom_contains`, which reports null keys as non-members).
    """
    nbytes = (m + 7) // 8
    if nbytes > _MAX_BITMAP_BYTES:
        raise ValueError(
            f"bloom_build: bitmap of {nbytes} bytes exceeds the "
            f"{_MAX_BITMAP_BYTES}-byte broadcast budget; use "
            "bloom_build_sharded (one bitmap per key range) or lower m"
        )
    keys = df.filter(F.col(key_col).isNotNull())
    pos = keys.select(F.explode(bloom_positions(F.col(key_col), m, k)).alias("p"))
    if method == "auto":
        method = "sparse" if keys.count() * k <= _SPARSE_MAX_SET_BITS else "dense"
    bits = np.zeros(nbytes, dtype=np.uint8)
    if method == "sparse":
        rows = (
            pos.select(
                F.expr("CAST(p DIV 8 AS LONG) AS bidx"),
                F.expr("shiftleft(1, CAST(p % 8 AS INT)) AS bit"),
            )
            .groupBy("bidx")
            .agg(F.bit_or("bit").alias("bval"))
            .collect()
        )
        for r in rows:
            bits[r["bidx"]] = r["bval"]
    elif method == "dense":
        nparts = max(1, min(32, _MAX_BITMAP_BYTES * 4 // max(nbytes, 1)))

        def to_bitmap(it):
            local = np.zeros(nbytes, dtype=np.uint8)
            for pdf in it:
                p = pdf["p"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(local, p >> 3, (1 << (p & 7)).astype(np.uint8))
            yield pd.DataFrame({"bm": [local.tobytes()]})

        for r in pos.coalesce(nparts).mapInPandas(to_bitmap, "bm binary").collect():
            bits |= np.frombuffer(r["bm"], dtype=np.uint8)
    else:
        raise ValueError(f"bloom_build: unknown method {method!r}")
    return BloomFilter(bits=bits, m=m, k=k)


def _bloom_contains_literal(
    df: DataFrame, key_col: str, bf: BloomFilter, output_col: str
) -> DataFrame:
    """Pure-JVM membership for small bitmaps: the bits become a
    constant-folded array<long> literal (little-endian packing: bit p lives
    at bit (p & 63) of long (p >> 6)), and each of the k positions is
    tested with element_at + shiftright + AND — whole-stage codegen, zero
    Python.  Bit-identical to the Arrow-gather path (property-tested)."""
    nlongs = (bf.m + 63) // 64
    raw = bf.bits.tobytes().ljust(nlongs * 8, b"\x00")
    words = np.frombuffer(raw, dtype="<u8").tolist()
    signed = [int(w) - (1 << 64) if w >= (1 << 63) else int(w) for w in words]
    lit_arr = F.array(*[F.lit(w).cast("long") for w in signed])
    key = F.col(key_col)
    safe = F.coalesce(key, F.lit(""))
    h1, h2 = _h48(safe, 1), _h48(safe, 13)
    member = F.lit(True)
    for j in range(bf.k):
        p = (h1 + F.lit(j) * h2) % F.lit(bf.m)
        word = F.element_at(lit_arr, F.floor(p / F.lit(64)).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftright", word, (p % F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        member = member & (bit == F.lit(1))
    return df.withColumn(
        output_col, F.when(key.isNull(), F.lit(False)).otherwise(member)
    )


def bloom_contains(
    df: DataFrame,
    key_col: str,
    bf: BloomFilter,
    output_col: str = "bloom_member",
    deterministic: bool = True,
) -> DataFrame:
    """Adds a boolean ``output_col``: true iff all k positions of the key
    are set — "probably seen" (exact for members, false-positive at the
    filter's design rate for non-members).  Null keys are reported as
    non-members without touching the bitmap (they were never built in; the
    F.when short-circuit also keeps nulls out of the Arrow batch, where a
    null position array would poison the numpy gather).  Hashing runs
    JVM-side; the only Python is a vectorized bitmap gather over the
    broadcast bits.

    ``deterministic=False`` marks the membership UDF nondeterministic —
    results are identical, but it stops InferFiltersFromConstraints from
    CLONING the membership predicate onto the other side of a downstream
    equi-join on the key (observed in bloom_prejoin's plan: the small side
    paid a second full Bloom pass for zero pruning, every reference key
    being a member by construction).  Honored on the Arrow path only: the
    literal path below is a pure expression and cannot be marked
    nondeterministic — see bloom_prejoin for why that is harmless there.

    Bitmaps of ≤ 2^16 bits skip Python entirely: the bitmap rides the plan
    as a constant-folded array<long> literal and each of the k bit tests is
    a shiftright/AND expression inside whole-stage codegen — no Arrow
    round-trip for the common small-reference-set case."""
    if bf.m <= _LITERAL_BITMAP_MAX_BITS:
        return _bloom_contains_literal(df, key_col, bf, output_col)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bf.bits)

    @pandas_udf("boolean")
    def _member(pos: pd.Series) -> pd.Series:
        bits = bc.value
        if not len(pos):
            return pd.Series(np.empty(0, dtype=bool))
        arr = np.array(pos.tolist(), dtype=np.int64)
        hit = (bits[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    if not deterministic:
        _member = _member.asNondeterministic()
    key = F.col(key_col)
    # The coalesce keeps the Arrow batch null-free even if Spark evaluates
    # the UDF branch on every row (CASE WHEN does not short-circuit Python
    # UDF evaluation); the outer when() then forces null keys to False.
    safe_pos = bloom_positions(F.coalesce(key, F.lit("")), bf.m, bf.k)
    return df.withColumn(
        output_col,
        F.when(key.isNull(), F.lit(False)).otherwise(_member(safe_pos)),
    )


@dataclass
class ShardedBloomFilter:
    """Key-range-sharded Bloom filter: shard = h1(key) mod n_shards, each
    shard an independent ``m``-bit filter.  Lets the total bitmap exceed the
    single-broadcast budget — each shard broadcasts separately (all under
    budget) and a key is tested against exactly its own shard, so FP math
    per shard is the ordinary m/n_shard_keys formula."""

    shards: list  # list[BloomFilter], one per shard, all with the same m/k
    m: int  # bits PER SHARD
    k: int

    @property
    def n_shards(self) -> int:
        return len(self.shards)


def bloom_shard_id(col, n_shards: int):
    """Shard routing: h1 mod n_shards (h1 = first 48 md5 bits — the same
    engine-portable digest the in-shard positions use, so an oracle can
    reproduce routing AND membership)."""
    return _h48(col, 1) % F.lit(n_shards)


def bloom_build_sharded(
    df: DataFrame,
    key_col: str,
    m_total: int,
    k: int = 5,
    n_shards: int | None = None,
    budget_bytes: int = _MAX_BITMAP_BYTES,
) -> ShardedBloomFilter:
    """Build a sharded Bloom filter whose TOTAL size may exceed the
    single-broadcast budget (the documented escape hatch bloom_build's
    ValueError points at).  ``n_shards`` defaults to the smallest count
    that brings each shard under ``budget_bytes``; raises only if even one
    shard would exceed it (i.e. caller pinned n_shards too low).

    ONE distributed pass builds every shard: keys route to shard
    h1 mod n_shards JVM-side, bit positions explode with the same
    Kirsch–Mitzenmacher family mod the PER-SHARD m, and a single
    map-combined groupBy(shard, byte_index) aggregate returns the set
    bytes of all shards together — the driver only ever materializes
    bitmaps, never keys.  With n_shards=1 the result is bit-identical to
    :func:`bloom_build` at the same m/k (property-tested)."""
    total_bytes = (m_total + 7) // 8
    if n_shards is None:
        n_shards = max(1, -(-total_bytes // budget_bytes))
    m = -(-m_total // n_shards)  # bits per shard, ceil
    nbytes = (m + 7) // 8
    if nbytes > budget_bytes:
        raise ValueError(
            f"bloom_build_sharded: {nbytes}-byte shard exceeds the "
            f"{budget_bytes}-byte budget even split {n_shards} ways; raise "
            "n_shards or lower m_total"
        )
    keys = df.filter(F.col(key_col).isNotNull())
    pos = keys.select(
        bloom_shard_id(F.col(key_col), n_shards).alias("shard"),
        F.explode(bloom_positions(F.col(key_col), m, k)).alias("p"),
    )
    rows = (
        pos.select(
            "shard",
            F.expr("CAST(p DIV 8 AS LONG) AS bidx"),
            F.expr("shiftleft(1, CAST(p % 8 AS INT)) AS bit"),
        )
        .groupBy("shard", "bidx")
        .agg(F.bit_or("bit").alias("bval"))
        .collect()
    )
    bitmaps = [np.zeros(nbytes, dtype=np.uint8) for _ in range(n_shards)]
    for r in rows:
        bitmaps[r["shard"]][r["bidx"]] = r["bval"]
    return ShardedBloomFilter(
        shards=[BloomFilter(bits=b, m=m, k=k) for b in bitmaps], m=m, k=k
    )


def bloom_contains_sharded(
    df: DataFrame,
    key_col: str,
    sbf: ShardedBloomFilter,
    output_col: str = "bloom_member",
) -> DataFrame:
    """Membership against a sharded filter: each key is tested against its
    OWN shard's bitmap only (routing and positions both JVM-side md5
    expressions).  One broadcast per shard — none above the budget — and
    one Arrow-batched gather that indexes the right bitmap per row.  Null
    keys are non-members, as in :func:`bloom_contains`."""
    sc = df.sparkSession.sparkContext
    bcs = [sc.broadcast(s.bits) for s in sbf.shards]

    @pandas_udf("boolean")
    def _member(shard: pd.Series, pos: pd.Series) -> pd.Series:
        if not len(shard):
            return pd.Series(np.empty(0, dtype=bool))
        res = np.zeros(len(shard), dtype=bool)
        sh = shard.to_numpy(dtype=np.int64)
        arr = np.array(pos.tolist(), dtype=np.int64)
        for s, bc in enumerate(bcs):
            sel = sh == s
            if not sel.any():
                continue
            bits = bc.value
            a = arr[sel]
            hit = (bits[a >> 3] >> (a & 7).astype(np.uint8)) & 1
            res[sel] = hit.all(axis=1)
        return pd.Series(res)

    key = F.col(key_col)
    safe = F.coalesce(key, F.lit(""))
    return df.withColumn(
        output_col,
        F.when(key.isNull(), F.lit(False)).otherwise(
            _member(
                bloom_shard_id(safe, sbf.n_shards),
                bloom_positions(safe, sbf.m, sbf.k),
            )
        ),
    )


def bloom_prejoin(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m: int | None = None,
    k: int = 5,
    how: str = "inner",
    bits_per_key: int = 10,
    materialize_small: bool = False,
) -> DataFrame:
    """Runtime-filter join: build a Bloom over ``small[on]``, prune ``big``
    BEFORE its shuffle, then run the exact join.  The result is IDENTICAL
    to ``big.join(small, on)`` — pruning has no false negatives (every true
    match survives) and false positives are eliminated by the join itself —
    so the whole plan is hash-oracle-able against a plain SQL join.

    This is the explicit form of semi-join pushdown / runtime row-group
    filtering: the big side's shuffle volume drops by the selectivity of
    the small side's key set (bitmap cost: m/8 bytes broadcast once, vs
    shuffling the non-matching majority of the big table).  Spark's own
    InjectRuntimeFilter does this inside the scan for eligible shapes;
    this operator makes it available on any source and any plan position,
    at a false-positive rate of ~(1-e^{-kn/m})^k.

    Crossover condition (measured — SCALE.md round-7 sixth finding): the
    prune pays k md5 probes per big-side row to save shuffle bytes, so it
    wins only when the shuffle is the bottleneck — network-bound
    exchanges, wide fact rows, low match selectivity.  On a single-JVM
    local shuffle of narrow rows the PLAIN join is faster (8× at the 100×
    probe); don't use this operator there.

    Only inner/semi joins are eligible (an outer join must keep unmatched
    big-side rows, which pruning would drop).

    ``m=None`` (default) auto-sizes the bitmap from the small side's key
    count at ``bits_per_key`` (10 bits/key, k=5 → ~1% false positives) —
    a FIXED m is a scale trap: the 100× probe showed a 2^20 bitmap
    saturating at 30 M keys (fp → 1), paying the full membership pass on
    the 600 M-row fact side while pruning NOTHING.  If the auto-sized
    bitmap would blow the broadcast budget, pruning is skipped and the
    plain join runs — the same degrade-to-exact fallback as Spark's own
    runtime-filter `maxNumBits` guard (pruning is an optimization; the
    join is the contract)."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom_prejoin: pruning is only sound for inner/semi joins, got {how!r}")
    method = "auto"
    if m is None:
        if materialize_small:
            # Opt-in: pin an EXPENSIVE derived small side once so the three
            # consumers (sizing, build, join) don't re-execute its plan.
            # Off by default — for the common filtered-scan small side,
            # re-reading the pushed-down scan is cheaper than materializing
            # it (measured at the 100× probe: checkpointing the 30 M-row
            # side cost more than the two extra scans it saved).
            small = small.localCheckpoint(eager=False)
        # Size from DISTINCT keys (dup-heavy sides would oversize m or
        # spuriously trip the budget fallback on row count) — but with the
        # APPROX sketch: exact count_distinct is a full shuffle of the key
        # set, while approx_count_distinct is a map-combined HLL whose ±2%
        # error vanishes inside the next-power-of-two rounding (measured:
        # the exact version tripled the 100× probe time).
        n = int(
            small.filter(F.col(on).isNotNull())
            .agg(F.approx_count_distinct(F.col(on)))
            .first()[0]
        )
        m = max(1 << 14, 1 << (max(1, bits_per_key * n) - 1).bit_length())
        if (m + 7) // 8 > _MAX_BITMAP_BYTES:
            return big.join(small, on, how)
        # n is known — pick the build method here so bloom_build's 'auto'
        # probe doesn't re-count the small side.  (n*k counts distinct
        # keys; duplicate rows re-set the same bits, so this bound holds.)
        method = "sparse" if n * k <= _SPARSE_MAX_SET_BITS else "dense"
    # Collision-free flag column: big may already carry _bloom_member (e.g.
    # the output of a prior bloom_contains), which the plain join would
    # keep — silently replacing it would break the result-identity contract.
    flag = "_bloom_member"
    while flag in big.columns or flag in small.columns:
        flag += "_"
    # deterministic=False blocks InferFiltersFromConstraints from cloning
    # the probe onto the small side.  Only the Arrow path honors it (pure
    # expressions can't be marked nondeterministic); on the literal path
    # (m ≤ 2^16 ⇒ small side ≤ ~6.5k keys) the clone costs k JVM probes
    # over that tiny side — harmless by the same bound that sized the
    # bitmap, and the literal filter stays pushdown-eligible on the big
    # side in exchange.
    pruned = bloom_contains(big, on, bloom_build(small, on, m, k, method=method),
                            flag, deterministic=False).filter(F.col(flag)).drop(flag)
    return pruned.join(small, on, how)


def bloom_filter_out(df: DataFrame, key_col: str, bf: BloomFilter) -> DataFrame:
    """Keep only rows whose key is (probably) NOT in the filter — the
    incremental-dedup / decontamination action.  By Bloom semantics this
    never keeps a true member; it drops novel keys at the false-positive
    rate, the standard price for the 10-100× broadcast saving."""
    out = bloom_contains(df, key_col, bf, "_bloom_member")
    return out.filter(~F.col("_bloom_member")).drop("_bloom_member")
