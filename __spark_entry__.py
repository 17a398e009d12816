"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mixed-format extraction on sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB oracle that computes the expected result in
closed form (the synthetic transcripts are deterministic functions of
(doc_id, turn_idx) — see semargl_spark/sources/transcripts.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make semargl_spark importable on the driver no matter the caller's cwd;
# queries ship it to executors via addPyFile (spark_util.ensure_py_files)
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from semargl_spark.queries import q_extract_mixed
    from semargl_spark.spark_util import ensure_py_files

    ensure_py_files(spark)
    return q_extract_mixed(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from semargl_spark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    from semargl_spark.queries import oracles

    return oracles()
