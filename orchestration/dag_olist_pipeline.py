"""Airflow shim for the graft Olist pipeline — orchestration parity
with the reference's nine DAGs (one per table + the gold job), each of
which ran eager pandas inside PythonOperators with /tmp handoffs.

Here Airflow only LAUNCHES Spark (BASELINE.json "spark_approach"):
one SparkSubmitOperator runs the whole bronze->silver->gold flow
(graft.tools.RunPipeline); per-table scheduling is unnecessary because
the eight ingest jobs are independent Spark jobs inside one
application, parallelized by the scheduler rather than by Airflow.

Not executed in this container (no Airflow installation) — an
orchestration artifact documenting the deployment shape.
"""
from datetime import datetime

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

with DAG(
    dag_id="graft_olist_pipeline",
    start_date=datetime(2024, 1, 1),
    schedule_interval="@once",  # parity with the reference's @once DAGs
    catchup=False,
) as dag:
    run_pipeline = SparkSubmitOperator(
        task_id="bronze_to_gold",
        application="graft-assembly.jar",
        java_class="graft.tools.RunPipeline",
        application_args=[
            "s3a://bronze", "s3a://silver", "s3a://gold",
        ],
        conf={
            "spark.hadoop.fs.s3a.endpoint": "{{ var.value.minio_endpoint }}",
            "spark.hadoop.fs.s3a.path.style.access": "true",
            "spark.sql.session.timeZone": "UTC",
        },
    )
