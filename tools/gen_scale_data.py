"""Deterministic synthetic data generator for SCALING spot-benches.

The graded testdata stops at sf0.1 (~600k lineitem rows), where every
query is dominated by fixed per-query overhead and 8 cores beat 32 —
the bench cannot certify the parallelism story (round-10 verdict item
2). This generator produces bigger corpora with the SAME schemas so
the top queries can be timed at sf0.5/sf1 under different core counts.

Strictly measurement infrastructure:
- never read by bench.py, the driver contract, or the oracle gate;
- deterministic (xxhash64 of ids — no rand(), so re-runs are identical);
- distributions are synthetic approximations, NOT the driver's: a
  Zipf-ish token head, a constant per-capita near-dup plant rate
  (1/37 docs is a ~0.85-Jaccard variant of its predecessor; 1/20
  embeddings a near-copy), TPC-H-ish fact/dim ratios. Absolute times
  are therefore not comparable with the graded testdata — only the
  core-count RATIOS and the SF growth curves are the measurement.

Usage: python tools/gen_scale_data.py SF OUTDIR   (e.g. 1 /tmp/gen_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestionframework_spark.session import get_spark


def _h(*cols):
    return F.xxhash64(*cols)


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "doc_id")
    is_var = F.pmod(F.col("doc_id"), F.lit(37)) == 1
    base = F.when(is_var, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    n_tok = (F.pmod(_h(base, F.lit(1)), F.lit(80)) + F.lit(40)).cast("int")
    cut = (n_tok.cast("double") * F.lit(0.85)).cast("int")

    def tok(seed_id, p):
        hv = F.pmod(_h(seed_id, p, F.lit(5)), F.lit(10))
        common = F.concat(F.lit("the"), F.pmod(_h(seed_id, p, F.lit(6)), F.lit(50)).cast("string"))
        rare = F.concat(F.lit("w"), F.pmod(_h(seed_id, p, F.lit(7)), F.lit(30000)).cast("string"))
        return F.when(hv < 4, common).otherwise(rare)

    toks = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda p: F.when(is_var & (p >= cut), tok(F.col("doc_id"), p)).otherwise(
            tok(base, p)
        ),
    )
    return d.select(
        "doc_id",
        F.concat_ws(" ", toks).alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "it")]),
            (F.pmod(_h(F.col("doc_id"), F.lit(2)), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(_h(F.col("doc_id"), F.lit(3)), F.lit(8)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))


def gen_embeddings(spark: SparkSession, n: int, dim: int = 64) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "vec_id")
    is_var = F.pmod(F.col("vec_id"), F.lit(20)) == 1
    base = F.when(is_var, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda p: (
            (F.pmod(_h(base, p, F.lit(11)), F.lit(2001)) - 1000).cast("double") / 1000.0
            + F.when(is_var, (F.pmod(_h(F.col("vec_id"), p, F.lit(12)), F.lit(101)) - 50).cast("double") / 2000.0).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    return d.select(
        "vec_id",
        emb.alias("embedding"),
        F.pmod(_h(F.col("vec_id"), F.lit(13)), F.lit(10)).cast("int").alias("label"),
    )


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "c_custkey")
    return d.select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")).alias("c_name"),
        F.pmod(_h(F.col("c_custkey"), F.lit(21)), F.lit(25)).cast("int").alias("c_nationkey"),
        ((F.pmod(_h(F.col("c_custkey"), F.lit(22)), F.lit(1100000)) - 100000).cast("double") / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
            (F.pmod(_h(F.col("c_custkey"), F.lit(23)), F.lit(5)) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "o_orderkey")
    k = F.col("o_orderkey")
    return d.select(
        "o_orderkey",
        F.pmod(_h(k, F.lit(31)), F.lit(n_cust)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            (F.pmod(_h(k, F.lit(32)), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (F.pmod(_h(k, F.lit(33)), F.lit(44999900)).cast("double") / 100.0 + 1.0).alias("o_totalprice"),
        (F.lit("1995-01-01").cast("timestamp") + F.make_interval(days=F.pmod(_h(k, F.lit(34)), F.lit(2557)).cast("int"))).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (F.pmod(_h(k, F.lit(35)), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, n_orders: int, n_part: int, n_supp: int) -> DataFrame:
    d = spark.range(n_orders * 4).withColumnRenamed("id", "rid")
    k = F.col("rid")
    return d.select(
        (k / 4).cast("long").alias("l_orderkey"),
        F.pmod(_h(k, F.lit(41)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(_h(k, F.lit(42)), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(k, F.lit(4)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(_h(k, F.lit(43)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (F.pmod(_h(k, F.lit(44)), F.lit(9999900)).cast("double") / 100.0 + 1.0).alias("l_extendedprice"),
        (F.pmod(_h(k, F.lit(45)), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(_h(k, F.lit(46)), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (F.pmod(_h(k, F.lit(47)), F.lit(3)) + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")), (F.pmod(_h(k, F.lit(48)), F.lit(2)) + 1).cast("int")).alias("l_linestatus"),
        (F.lit("1995-01-01").cast("timestamp") + F.make_interval(days=F.pmod(_h(k, F.lit(49)), F.lit(2557)).cast("int"))).alias("l_shipdate"),
    )


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "p_partkey")
    k = F.col("p_partkey")
    return d.select(
        "p_partkey",
        F.concat(F.lit("part w"), F.pmod(_h(k, F.lit(51)), F.lit(5000)).cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.pmod(_h(k, F.lit(52)), F.lit(25)) + 11).cast("string")).alias("p_brand"),
        F.concat(F.lit("TYPE "), F.pmod(_h(k, F.lit(53)), F.lit(150)).cast("string")).alias("p_type"),
        (F.pmod(_h(k, F.lit(54)), F.lit(50)) + 1).cast("int").alias("p_size"),
        (F.pmod(_h(k, F.lit(55)), F.lit(200000)).cast("double") / 100.0 + 900.0).alias("p_retailprice"),
    )


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "s_suppkey")
    k = F.col("s_suppkey")
    return d.select(
        "s_suppkey",
        F.concat(F.lit("Supplier#"), F.lpad(k.cast("string"), 9, "0")).alias("s_name"),
        F.pmod(_h(k, F.lit(61)), F.lit(25)).cast("int").alias("s_nationkey"),
        ((F.pmod(_h(k, F.lit(62)), F.lit(1100000)) - 100000).cast("double") / 100.0).alias("s_acctbal"),
    )


def gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    d = spark.range(n).withColumnRenamed("id", "event_id")
    k = F.col("event_id")
    ts = F.lit("2024-01-01").cast("timestamp") + F.make_interval(
        secs=F.pmod(_h(k, F.lit(71)), F.lit(30 * 86400)).cast("double")
    )
    return d.select(
        "event_id",
        F.when(F.pmod(_h(k, F.lit(72)), F.lit(100)) == 0, F.lit(None).cast("timestamp")).otherwise(ts).alias("ts"),
        F.pmod(_h(k, F.lit(73)), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("click", "view", "view", "purchase", "error")]),
            (F.pmod(_h(k, F.lit(74)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(_h(k, F.lit(75)), F.lit(100000)).cast("double") / 100.0).alias("value"),
        F.concat(F.lit('{"k":'), F.pmod(_h(k, F.lit(76)), F.lit(1000)).cast("string"), F.lit("}")).alias("props"),
    )


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    spark = get_spark("gen_scale_data")
    scale = sf / 0.1  # the graded sf0.1 is the reference point
    counts = {
        "documents": int(5000 * scale),
        "embeddings": int(2000 * scale),
        "customer": int(15000 * scale),
        "orders": int(150000 * scale),
        "part": int(20000 * scale),
        "supplier": int(1000 * scale),
        "events": int(100000 * scale),
    }
    os.makedirs(out, exist_ok=True)
    gens = {
        "documents": lambda: gen_documents(spark, counts["documents"]),
        "embeddings": lambda: gen_embeddings(spark, counts["embeddings"]),
        "customer": lambda: gen_customer(spark, counts["customer"]),
        "orders": lambda: gen_orders(spark, counts["orders"], counts["customer"]),
        "lineitem": lambda: gen_lineitem(spark, counts["orders"], counts["part"], counts["supplier"]),
        "part": lambda: gen_part(spark, counts["part"]),
        "supplier": lambda: gen_supplier(spark, counts["supplier"]),
        "events": lambda: gen_events(spark, counts["events"], max(2000, int(2000 * scale))),
    }
    for name, fn in gens.items():
        fn().write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)
    # fixed-size dims: copy the graded sf0.1 ones verbatim
    for name in ("nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.1/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))
        print(f"copied {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
