"""applyInPandasWithState theta sketch: streaming state after N
micro-batches must equal the batch sketch over the union (KMV folding is a
deterministic order-insensitive monoid — the reference's streaming
contract)."""

import pandas as pd
import pyspark.sql.functions as F

from datasketches_cpp_spark.functions.theta import theta_sketch_agg, with_estimate
from datasketches_cpp_spark.streaming.stateful import streaming_theta_distinct


def _corpus():
    rows = []
    for i in range(3000):
        rows.append({"k": f"grp{i % 3}", "item": f"item{i % 700}_{i % 3}"})
    return pd.DataFrame(rows)


def test_stateful_stream_equals_batch(spark, tmp_path):
    pdf = _corpus()
    src = tmp_path / "drops"
    src.mkdir()
    for i, sl in enumerate([pdf.iloc[0:1000], pdf.iloc[1000:2200], pdf.iloc[2200:]]):
        spark.createDataFrame(sl).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"drop_{i}")
        )
    schema = spark.createDataFrame(pdf.iloc[:1]).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "drop_*"))
    )
    q = (
        streaming_theta_distinct(stream, "k", "item", lg_k=6)
        .writeStream.outputMode("update")
        .format("memory")  # update-mode sink; rows arrive in trigger order
        .queryName("theta_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # last emitted row per key = final state
    mem = spark.sql("select * from theta_state").toPandas()
    assert len(mem) >= 3
    final = {}
    for _, r in mem.iterrows():
        final[r["key"]] = r  # rows arrive in trigger order; later overwrite

    batch = with_estimate(
        theta_sketch_agg(spark.createDataFrame(pdf), ["k"], "item", lg_k=6)
    ).collect()
    assert len(batch) == 3
    for b in batch:
        f = final[b["k"]]
        assert f["theta"] == b["theta"], b["k"]
        assert f["n_retained"] == len(b["sig"])
        assert abs(f["estimate"] - b["estimate"]) < 1e-9
        # exact-mode sanity: 700 distinct per key with lg_k=6 -> estimation
    # at least one key must be in estimation mode for this to be a real test
    assert any(b["theta"] != -1 for b in batch)
