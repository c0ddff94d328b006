"""Evidence tests for checkpoint/persist hygiene (r12 VERDICT item 9).

Round 12 asserted "persistent RDDs 2-4/query → ≤1 after release" for the
iterative operators in prose only; these tests make the claim a committed,
re-runnable artifact.  The contract under test: after an iterative
operator returns and its result is materialized, at most ONE persistent
RDD attributable to it remains (the returned eager-checkpointed leaf), and
releasing that result drops the count back to the baseline.

The tests measure a DELTA against the session's persistent-RDD count at
entry (the session fixture is shared, so an absolute count would be
order-dependent), and sweep any stray blocks first so earlier tests can't
bleed in.
"""

import pytest

pyspark = pytest.importorskip("pyspark")


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _sweep(spark) -> None:
    """Release every persisted block (same shape as bench.py's untimed
    inter-query hygiene) so the baseline for the delta is clean."""
    from compss_python_spark.caching import release_width_pins

    release_width_pins(spark)
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().iterator()
    rdds = []
    while it.hasNext():
        rdds.append(it.next()._2())
    for rdd in rdds:
        rdd.unpersist(False)


def test_pagerank_loop_leaves_at_most_one_checkpoint(spark):
    from compss_python_spark.caching import release_checkpoint
    from compss_python_spark.graph.pagerank import pagerank

    _sweep(spark)
    base = _n_persistent(spark)
    edges = spark.createDataFrame(
        [(i % 53, (i * 7 + 1) % 53) for i in range(400)], "src long, dst long"
    )
    # local_threshold=0 forces the distributed loop (the checkpointing
    # code path under test; the driver kernel persists nothing).
    ranks = pagerank(edges, max_iters=6, checkpoint_every=2, local_threshold=0)
    assert ranks.count() == 53
    # Only the returned eager checkpoint may remain: the per-iteration
    # lazy checkpoints and the edge/node helper persists must be gone.
    assert _n_persistent(spark) - base <= 1
    release_checkpoint(ranks)
    assert _n_persistent(spark) - base == 0


def test_kmeans_lloyd_leaves_at_most_one_checkpoint(spark, sf_dir):
    from compss_python_spark.caching import release_checkpoint
    from compss_python_spark.ml.clustering import kmeans_lloyd
    from compss_python_spark.plans import table

    _sweep(spark)
    base = _n_persistent(spark)
    emb = table(spark, sf_dir, "embeddings")
    out = kmeans_lloyd(emb, init_ids=[0, 1, 2, 3], iters=3)
    out.count()
    # Superseded per-iteration centroid checkpoints are released inside
    # the loop; only the final centroid checkpoint (which the returned
    # assignment plan still reads) may remain.
    assert _n_persistent(spark) - base <= 1
    release_checkpoint(out)
    assert _n_persistent(spark) - base == 0


def test_lsh_cc_pipeline_leaves_at_most_one_checkpoint(spark, sf_dir):
    from compss_python_spark import caching
    from compss_python_spark.caching import release_checkpoint
    from compss_python_spark.graph.components import connected_components
    from compss_python_spark.llm import dedup
    from compss_python_spark.plans import table

    def _non_pin_persistent() -> int:
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().iterator()
        n = 0
        while it.hasNext():
            if it.next()._1() not in caching._WIDTH_PINS:
                n += 1
        return n

    _sweep(spark)
    base = _non_pin_persistent()
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, collapse_exact=True)
    # local_threshold=0 forces the distributed label-propagation loop.
    comp = connected_components(
        pairs, src="id_a", dst="id_b", local_threshold=0
    )
    comp.count()
    # Besides the session-lived width pin (released only via the session
    # hook, counted out above): the pair table's collapse barrier is
    # released once the eager pair result exists and the CC loop releases
    # each superseded label table, so only the pair result and the final
    # labels may remain.
    assert _non_pin_persistent() - base <= 2
    release_checkpoint(comp)
    release_checkpoint(pairs)
    assert _non_pin_persistent() - base == 0
    caching.release_width_pins(spark)
    assert _n_persistent(spark) == 0


def test_release_checkpoint_skips_width_pins(spark):
    """A width-guard pin is shared-by-design across consumers;
    release_checkpoint must not free it as a stray leaf of one consumer's
    plan (r12 ADVICE: a released checkpoint cannot be recomputed, so a
    mistaken release fails the other consumers unrecoverably)."""
    from compss_python_spark import caching
    from compss_python_spark.width import ensure_min_partitions

    _sweep(spark)
    base = _n_persistent(spark)
    narrow = spark.range(1000).repartition(1)
    widened = ensure_min_partitions(narrow)
    consumer_a = widened.selectExpr("sum(id) as s")
    consumer_b = widened.selectExpr("count(*) as c")
    assert consumer_a.first()["s"] == 499500
    # Releasing one consumer's plan must leave the shared pin alive …
    caching.release_checkpoint(consumer_a)
    assert consumer_b.first()["c"] == 1000
    # … and the session-level hook is the designated release path.
    caching.release_width_pins(spark)
    assert _n_persistent(spark) - base == 0
