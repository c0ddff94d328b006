"""tools/gen_sf.py — the true-content second-scale-factor generator must
stay schema-identical to the driver's testdata (bench.py and every
registry query run against it unchanged) and byte-deterministic."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_generated_schemas_match_driver_testdata(spark, sf_dir):
    import gen_sf

    tables = gen_sf.build_tables(spark, 1)
    for name, df in tables.items():
        ref = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in ref.schema.fields]
        assert got == want, f"{name}: generated schema {got} != testdata {want}"


def test_generated_data_is_deterministic_and_fk_consistent(spark):
    import gen_sf
    from pyspark.sql import functions as F

    t1 = gen_sf.build_tables(spark, 1)
    t2 = gen_sf.build_tables(spark, 1)
    h1 = t1["orders"].agg(F.bit_xor(F.xxhash64(F.struct("*")))).first()[0]
    h2 = t2["orders"].agg(F.bit_xor(F.xxhash64(F.struct("*")))).first()[0]
    assert h1 == h2, "same multiplier must generate byte-identical data"

    n_cust = gen_sf.BASE["customer"]
    bad = t1["orders"].filter(
        (F.col("o_custkey") < 0) | (F.col("o_custkey") >= n_cust)
    )
    assert bad.count() == 0, "o_custkey must stay inside the customer key range"
    n_part = gen_sf.BASE["part"]
    bad_li = t1["lineitem"].filter(
        (F.col("l_partkey") < 0) | (F.col("l_partkey") >= n_part)
    )
    assert bad_li.count() == 0, "l_partkey must stay inside the part key range"
