"""Minimal maintenance job for `spark-submit --py-files` delivery.

The north rule requires the engine to run "via spark-submit --py-files on
multi-executor clusters" (reference deploys as a long-lived Rust service;
this engine deploys as a plain Spark application). This script is the
deployable unit: it imports `moonlink_spark` ONLY from the submitted
`--py-files` zip (no repo checkout on the cluster), drives a full
create -> append -> MERGE -> compact -> scan lifecycle, and prints one JSON
line for the caller to assert on.

Usage:
    spark-submit --master local[4] --py-files moonlink_spark.zip \
        tools/submit_demo.py /path/to/table_dir [n_rows]

`tests/test_spark_submit.py` runs exactly this with an empty PYTHONPATH to
prove the package is self-contained under --py-files (UDFs unpickle on
executors from the shipped zip, not from a driver-side checkout).
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    table_dir = sys.argv[1]
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    # the session comes from spark-submit; only configure what the engine
    # needs (see moonlink_spark.session.get_spark for the full set)
    spark = (
        SparkSession.builder.appName("moonlink-submit-demo")
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        .config("spark.sql.parquet.fieldId.write.enabled", "true")
        .getOrCreate()
    )

    from moonlink_spark import create_table
    from moonlink_spark.cdc import CdcScheduleGenerator, spec_to_spark
    from moonlink_spark.datagen import generate_images
    from moonlink_spark.operators.compact import FULL, compact
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.scan import scan
    from moonlink_spark.table.writer import write_data_files

    t = create_table(table_dir, IMAGES_SCHEMA)
    df = generate_images(spark, n_rows, partitions=4)
    entries = write_data_files(
        spark, df, t.new_data_dir(), max_records_per_file=64,
        field_id_schema=t.schema,
    )
    t.commit("append", added=entries, lsn=100)

    gen = CdcScheduleGenerator(seed=7)
    gen.next_spec(n_rows, 0, 0)  # align the generator's id space to the load
    spec = gen.next_spec(0, n_rows // 8, n_rows // 16)
    merge_cdc_batch(spark, t, spec_to_spark(spark, spec, partitions=4),
                    lsn=int(spec["lsn"].max()))
    compact(spark, t, mode=FULL)

    final = scan(spark, t).count()
    expected = n_rows - n_rows // 16

    # the Python DataSource runs in dedicated datasource worker processes —
    # prove THEY also resolve moonlink_spark from the shipped zip (planning
    # pickles the reader; partitions read executor-side via pyarrow)
    from moonlink_spark.datasource import register

    register(spark)
    ds_rows = spark.read.format("moonlink").load(table_dir).count()

    print(json.dumps({
        "rows": final,
        "expected": expected,
        "ok": final == expected and ds_rows == final,
        "datasource_rows": ds_rows,
        "snapshots": len(t.md.snapshots),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
