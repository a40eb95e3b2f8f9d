"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``pdf_parse_vector_db_spark`` package; this
module only adapts the plan registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_parse_vector_db_spark.plans import advanced as _advanced
from pdf_parse_vector_db_spark.plans import curation as _curation
from pdf_parse_vector_db_spark.plans import evaluation as _evaluation
from pdf_parse_vector_db_spark.plans import ingest as _ingest
from pdf_parse_vector_db_spark.plans import graph as _graph
from pdf_parse_vector_db_spark.plans import knn_graph as _knn_graph
from pdf_parse_vector_db_spark.plans import registry as _registry
from pdf_parse_vector_db_spark.plans import relational as _relational
from pdf_parse_vector_db_spark.plans import retrieval as _retrieval
from pdf_parse_vector_db_spark.plans import metadata as _metadata
from pdf_parse_vector_db_spark.plans import mixture as _mixture
from pdf_parse_vector_db_spark.plans import multimodal as _multimodal
from pdf_parse_vector_db_spark.plans import postings as _postings
from pdf_parse_vector_db_spark.plans import privacy as _privacy
from pdf_parse_vector_db_spark.plans import quality as _quality
from pdf_parse_vector_db_spark.plans import search as _search
from pdf_parse_vector_db_spark.plans import similarity as _similarity
from pdf_parse_vector_db_spark.plans import sketches as _sketches
from pdf_parse_vector_db_spark.plans import streaming_queries as _streaming_queries
from pdf_parse_vector_db_spark.plans import temporal as _temporal
from pdf_parse_vector_db_spark.plans import textanalysis as _textanalysis
from pdf_parse_vector_db_spark.plans import tpch_extra as _tpch_extra

_MODULES = [
    _search,
    _ingest,
    _relational,
    _advanced,
    _tpch_extra,
    _textanalysis,
    _curation,
    _evaluation,
    _similarity,
    _sketches,
    _graph,
    _knn_graph,
    _retrieval,
    _postings,
    _metadata,
    _mixture,
    _multimodal,
    _privacy,
    _quality,
    _streaming_queries,
    _temporal,
]

_SPECS = _registry.collect(*_MODULES)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's primary read path — filtered exact kNN
    with over-fetch, per-file dedup, and ascending top-5
    (extract_and_search.py:94-131) — over the sf0.001 embeddings fixture.
    """
    return _SPECS["search_similar"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _SPECS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return {name: spec.oracle for name, spec in _SPECS.items() if spec.oracle is not None}
