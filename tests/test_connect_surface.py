"""Spark Connect compatibility audit.

This container ships no grpcio, so a live Connect round-trip cannot run
here; what CAN be pinned is the static surface: every use of an API
that does not exist under Connect (``SparkContext``, ``_jc``/``_jvm``
JVM internals, the RDD API) must sit behind an explicitly documented
seam. The library's two seams are:

* ``spark_util.default_parallelism`` / ``ensure_py_files`` /
  ``is_connect`` — classic sessions use the SparkContext, Connect
  sessions use ``spark.conf`` and the artifact channel.
* ``operators/skew.py`` — reads Catalyst expression internals via
  ``_jc`` for the explain audit and RAISES a documented error under
  Connect (the audit is a dev-time tool, not a pipeline stage).

If this test fails, a new operator leaked a classic-only API outside
the seams — route it through spark_util or extend the allowlist WITH a
Connect story.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "semargl_spark"

# file -> reason it may touch classic-only APIs
ALLOWLIST = {
    "spark_util.py": "the documented seam (is_connect branches)",
    "operators/skew.py": "explain audit; raises a typed error on Connect",
}

FORBIDDEN = re.compile(
    r"\.sparkContext\b|\._jc\b|\._jvm\b|\._jdf\b|\._sc\b|\.rdd\b"
)


def _hits():
    out = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        if rel in ALLOWLIST:
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if FORBIDDEN.search(code):
                out.append(f"{rel}:{i}: {line.strip()}")
    return out


def test_no_classic_only_api_outside_seams():
    hits = _hits()
    assert not hits, (
        "classic-only Spark APIs outside the documented Connect seams:\n"
        + "\n".join(hits)
    )


def test_default_parallelism_classic(spark):
    from semargl_spark.spark_util import default_parallelism, is_connect

    assert not is_connect(spark)
    assert default_parallelism(spark) == (
        spark.sparkContext.defaultParallelism
    )


def test_is_connect_detects_connect_module():
    from semargl_spark.spark_util import is_connect

    class _FakeConnect:
        pass

    _FakeConnect.__module__ = "pyspark.sql.connect.session"
    assert is_connect(_FakeConnect())

    class _FakeClassic:
        pass

    _FakeClassic.__module__ = "pyspark.sql.session"
    assert not is_connect(_FakeClassic())


def test_default_parallelism_connect_falls_back_to_conf():
    from semargl_spark.spark_util import default_parallelism

    class _Conf:
        def get(self, key):
            assert key == "spark.sql.shuffle.partitions"
            return "24"

    class _FakeConnect:
        conf = _Conf()

    _FakeConnect.__module__ = "pyspark.sql.connect.session"
    assert default_parallelism(_FakeConnect()) == 24
