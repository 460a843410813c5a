"""Literal ``spark-submit --py-files`` smoke job.

`tools/multijvm_replay.py` ships the wheel via ``sc.addPyFile`` —
the *programmatic equivalent* of a cluster submission.  This job
closes the last inch: it is designed to be launched through the REAL
launcher, exactly as a cluster user would, with the wheel as the
only package source:

    /opt/spark/bin/spark-submit \
        --master local-cluster[2,2,2048] \
        --conf spark.pyspark.python=$(which python) \
        --py-files dist/semantic_olap_spark-0.1.0-py3-none-any.whl.zip \
        tools/submit_smoke.py /root/testdata/sf0.01

(spark-submit's ``--py-files`` has the same
``PACKAGE_EXTENSIONS = (".zip", ".egg", ".jar")`` limitation as
``addPyFile`` — ship the ``.whl.zip`` alias, see
tools/build_wheel.py.)

The job runs one pure-Catalyst query and one executor-Python
(Arrow pandas UDF) query through the package API and prints
``SUBMIT_SMOKE_OK <n1> <n2>`` on success.  The driver process gets
the package from --py-files too (spark-submit prepends py-files to
the driver's sys.path), so NOTHING here imports from the repo tree.

tests/test_submit_smoke.py runs this end-to-end and asserts both
counts; the test subprocess scrubs PYTHONPATH so a pass proves the
wheel carried the package to driver AND executors.
"""
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # proves the wheel reached the DRIVER's sys.path
    from semantic_olap_spark.operators.deterministic import num_filter
    from semantic_olap_spark.operators.semantic import sem_filter
    from semantic_olap_spark.sources.loaders import load_table

    orders = load_table(spark, sf_dir, "orders")
    n1 = num_filter(
        orders,
        [{"column": "o_totalprice", "operator": ">", "threshold": 1000.0}],
    ).count()

    # proves the wheel reached EXECUTOR Python workers (Arrow UDF
    # closures import the package by reference on the worker side)
    docs = load_table(spark, sf_dir, "documents")
    n2 = sem_filter(docs, ["text"], "rows about spark").count()

    print(f"SUBMIT_SMOKE_OK {n1} {n2}")
    spark.stop()


if __name__ == "__main__":
    main()
