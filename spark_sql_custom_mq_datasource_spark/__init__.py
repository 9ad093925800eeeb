"""PySpark-native analytics engine with the capabilities of the reference
``chenyyyang/spark-sql-custom-mq-dataSource`` (a Spark DSv2 custom streaming
"mock MQ" source, `/root/reference/src/main/java/org/example/`), rebuilt
Spark-first:

- ``sources/``   — the custom MQ source via the Python DataSource API
                   (pyspark.sql.datasource), batch + micro-batch streaming.
- ``plans/``     — the declarative query library (DataFrame/SQL) over the
                   fixture tables, each query paired with an ANSI-SQL oracle.
- ``operators/`` — LLM-data-pipeline operators: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard / embedding-cosine), similarity
                   search (brute-force + LSH-bucketed ANN), top-k patterns.
- ``functions/`` — scalar/vector helpers: text analysis, vector math.
- ``streaming/`` — watermarked windows, streaming dedup, stateful pipelines.

Everything is expressed with the public PySpark DataFrame/SQL API so Catalyst
(pushdown, pruning, AQE, whole-stage codegen) does the physical planning.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
