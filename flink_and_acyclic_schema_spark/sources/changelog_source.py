"""The reference's multiplexed changelog text format: parser + generator.

Format (reference DataFlow.java:63-119, FIXTURES.md §2): one text line per
event — a 7-char header ``<Add|Sub><LINE|ORDE|CUST|NATI>`` then ``|``-separated
fields in TPC-H column order:

    AddLINE|<orderkey>|<partkey>|<suppkey>|<linenumber>|<qty>|<extprice>|<disc>|<tax>|<flag>
    AddORDE|<orderkey>|<custkey>|<status>|<totalprice>|<orderdate yyyy-MM-dd>
    AddCUST|<custkey>|<name>|<address>|<nationkey>|<phone>|<acctbal>|<seg>|<comment>
    AddNATI|<nationkey>|<name>

The reference demultiplexes with a ProcessFunction into 4 side outputs
(DataFlow.java:21-24, 85-116); here the same parse is 4 filtered declarative
projections over one text DataFrame — works identically on a batch
``spark.read.text`` and a streaming ``spark.readStream.text`` source.
``Add*``/``Sub*`` become weight +1/−1 (SURVEY.md §1.3 mapping).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER_LEN = 7


def _fields(body):
    return F.split(body, r"\|")


def parse_changelog(lines: DataFrame) -> dict[str, DataFrame]:
    """Demultiplex raw changelog lines into 4 typed weighted DataFrames.

    Mirrors ref DataFlow.java:85-116 field extraction (indexes per relation),
    but with fixed schemas and a weight column instead of Insert/Delete tags.
    """
    base = lines.select(
        F.substring("value", 1, HEADER_LEN).alias("hdr"),
        _fields(F.expr(f"substring(value, {HEADER_LEN + 2})")).alias("f"),
    ).select(
        F.substring("hdr", 1, 3).alias("op"),
        F.substring("hdr", 4, 4).alias("tbl"),
        "f",
    )
    base = base.withColumn(
        "weight", F.when(F.col("op") == "Add", F.lit(1)).otherwise(F.lit(-1))
    )

    def fld(i: int):
        return F.element_at("f", i + 1)  # element_at is 1-based; i is ref's 0-based index

    def num(i: int, t: str):
        # try_cast: a malformed field nulls the row (drops out of keyed joins)
        # instead of killing the stream with an ANSI cast error
        return fld(i).try_cast(t)

    date = F.when(
        fld(4).rlike(r"^\d{4}-\d{2}-\d{2}$"), F.to_timestamp_ntz(fld(4), F.lit("yyyy-MM-dd"))
    )

    lineitem = base.filter(F.col("tbl") == "LINE").select(
        num(0, "long").alias("l_orderkey"),
        num(1, "long").alias("l_partkey"),
        num(2, "long").alias("l_suppkey"),
        num(3, "int").alias("l_linenumber"),
        num(4, "double").alias("l_quantity"),
        num(5, "double").alias("l_extendedprice"),
        num(6, "double").alias("l_discount"),
        num(7, "double").alias("l_tax"),
        fld(8).alias("l_returnflag"),
        "weight",
    )
    orders = base.filter(F.col("tbl") == "ORDE").select(
        num(0, "long").alias("o_orderkey"),
        num(1, "long").alias("o_custkey"),
        fld(2).alias("o_orderstatus"),
        num(3, "double").alias("o_totalprice"),
        date.alias("o_orderdate"),
        "weight",
    )
    customer = base.filter(F.col("tbl") == "CUST").select(
        num(0, "long").alias("c_custkey"),
        fld(1).alias("c_name"),
        num(3, "int").alias("c_nationkey"),
        num(5, "double").alias("c_acctbal"),
        "weight",
    )
    nation = base.filter(F.col("tbl") == "NATI").select(
        num(0, "int").alias("n_nationkey"),
        fld(1).alias("n_name"),
        "weight",
    )
    return {"lineitem": lineitem, "orders": orders, "customer": customer, "nation": nation}


def generate_changelog_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> str:
    """Write a deterministic changelog stream derived from the base tables as
    ``n_chunks`` text files (one per micro-batch when streamed with
    maxFilesPerTrigger=1).

    Events (mirrored exactly by the SQL oracle in streaming_plans.py):
      +1 every row of lineitem/orders/customer/nation
      +1 duplicate insert of lineitem rows with l_orderkey % 5 == 0
      −1 delete of lineitem rows with l_orderkey % 7 == 0
      −1 delete of orders rows with o_orderkey % 7 == 0
    Chunk assignment hashes the row key so deletes may arrive in a different
    micro-batch than their insert — the weight algebra is order-independent.
    """
    from ..tables import load

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def li_line(op):
        return F.concat_ws(
            "|",
            F.lit(op + "LINE"),
            F.col("l_orderkey").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_quantity").cast("string"),
            F.col("l_extendedprice").cast("string"),
            F.col("l_discount").cast("string"),
            F.col("l_tax").cast("string"),
            F.col("l_returnflag"),
        )

    def o_line(op):
        return F.concat_ws(
            "|",
            F.lit(op + "ORDE"),
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )

    c_line = F.concat_ws(
        "|",
        F.lit("AddCUST"),
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.lit("addr"),
        F.col("c_nationkey").cast("string"),
        F.lit("phone"),
        F.col("c_acctbal").cast("string"),
        F.col("c_mktsegment"),
        F.lit("comment"),
    )
    n_line = F.concat_ws(
        "|", F.lit("AddNATI"), F.col("n_nationkey").cast("string"), F.col("n_name")
    )

    parts = [
        li.select(li_line("Add").alias("value"), (F.col("l_orderkey") % n_chunks).alias("chunk")),
        li.filter(F.col("l_orderkey") % 5 == 0).select(
            li_line("Add").alias("value"), ((F.col("l_orderkey") + 1) % n_chunks).alias("chunk")
        ),
        li.filter(F.col("l_orderkey") % 7 == 0).select(
            li_line("Sub").alias("value"), ((F.col("l_orderkey") + 2) % n_chunks).alias("chunk")
        ),
        o.select(o_line("Add").alias("value"), (F.col("o_orderkey") % n_chunks).alias("chunk")),
        o.filter(F.col("o_orderkey") % 7 == 0).select(
            o_line("Sub").alias("value"), ((F.col("o_orderkey") + 2) % n_chunks).alias("chunk")
        ),
        c.select(c_line.alias("value"), (F.col("c_custkey") % n_chunks).alias("chunk")),
        n.select(n_line.alias("value"), (F.col("n_nationkey") % n_chunks).alias("chunk")),
    ]
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p)

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for i in range(n_chunks):
        tmp = os.path.join(out_dir, f"_tmp{i}")
        allv.filter(F.col("chunk") == i).select("value").coalesce(1).write.mode(
            "overwrite"
        ).text(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.txt"))
        shutil.move(part, os.path.join(out_dir, f"chunk{i}.txt"))
        shutil.rmtree(tmp)
    return out_dir
