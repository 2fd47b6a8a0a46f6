"""callio_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Khang-TB/Callio-ETL, re-expressed Spark-first.

The reference (read-only at /root/reference) is a multi-tenant incremental ETL
pipeline: paginated API scans -> pandas flatten/derive/dedup -> BigQuery MERGE
upserts -> a large analytical reporting SQL. This package re-expresses that
capability surface as idiomatic Spark DataFrame / SQL plans:

- ``session``      SparkSession factory (UTC, AQE, Arrow) + runtime configure()
- ``tables``       sources over the driver testdata parquet (nanos-ts handling)
- ``functions``    scalar/derived-column operators (SURVEY.md section 2.2)
- ``dedup``        dedup operators D1-D4 (section 2.4)
- ``merge``        MERGE-upsert emulation J8-J11 (section 2.5) without Delta
- ``checkpoints``  incremental checkpoint / update_log protocol C1-C5 (section 2.9)
- ``queries``      relational query library incl. the flagship reporting query
- ``llm_ops``      scale-oriented LLM-data-pipeline extensions (dedup families,
                   similarity search, text analysis, multimodal plumbing)
- ``registry``     name -> (spark_fn, oracle_sql) registry backing the driver
                   contract in ``__spark_entry__.py``

Every operator is designed for 100 TB scale: declarative plans (Catalyst does
pushdown/pruning/broadcast), no driver-side collects in data paths, explicit
broadcast hints for dimension joins, and Pandas UDFs only where built-in
expressions genuinely cannot express the semantics.
"""

from callio_etl_spark.session import get_spark, configure  # noqa: F401
