"""TRUE multi-process commit contention on one table (extends the r9
cross-process transaction fuzz to the plain append path): a second OS
process with its OWN SparkSession appends batches against the same
commit log while this process does the same. The optimistic
tmp+rename protocol must serialize every commit: no lost batch, no
double batch, contiguous versions, every row visible exactly once."""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

from crest_spark.lakehouse import LakehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_append_contention(spark, tmp_path):
    wh = str(tmp_path / "wh")
    n_batches, rows_per = 8, 10
    cat = LakehouseCatalog(wh)
    schema = "writer string, batch int, v long"
    t = cat.get_or_create_table("contended", spark.createDataFrame([], schema).schema)

    other_src = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
from crest_spark.lakehouse import LakehouseCatalog
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
cat = LakehouseCatalog({wh!r})
t = cat.table("contended")
for b in range({n_batches}):
    df = spark.createDataFrame(
        [("p2", b, i) for i in range({rows_per})],
        "writer string, batch int, v long",
    )
    t.append(df, writer_id="p2", batch_id=b)
    # replay one batch mid-stream: idempotence must hold under
    # cross-process contention too
    if b == 3:
        t.append(df, writer_id="p2", batch_id=b)
print("P2_OK", flush=True)
"""
    log = str(tmp_path / "p2.log")
    with open(log, "w") as lf:
        p2 = subprocess.Popen(
            [sys.executable, "-c", other_src], stdout=lf, stderr=lf
        )
    try:
        for b in range(n_batches):
            df = spark.createDataFrame(
                [("p1", b, i) for i in range(rows_per)], schema
            )
            t.append(df, writer_id="p1", batch_id=b)
        p2.wait(timeout=180)
    finally:
        if p2.poll() is None:
            p2.kill()
    assert p2.returncode == 0, open(log).read()[-2000:]
    out = t.read(spark)
    # exactly-once per (writer, batch): no lost commits, no doubles —
    # including the deliberately replayed p2 batch 3
    counts = {
        (r["writer"], r["batch"]): r["n"]
        for r in out.groupBy("writer", "batch")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expect = {
        (w, b): rows_per for w in ("p1", "p2") for b in range(n_batches)
    }
    assert counts == expect
    # version chain is contiguous (every rename landed a distinct slot)
    versions = t.versions()
    assert versions == list(range(1, len(versions) + 1))
