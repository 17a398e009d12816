"""Mini A/B bench: times the extraction path only, in a fresh process.

Usage: python tools/minibench.py <repo_root>
Prints one JSON line with extract_mixed (best of 4) and extract_ntriples
(best of 2) at sf0.1, matching bench.py's protocol.
"""

import json
import os
import sys
import time

root = os.path.abspath(sys.argv[1])
sys.path.insert(0, root)

sf_dir = "/root/testdata/sf0.1"

from semargl_spark.spark_util import tuned_session  # noqa: E402

spark = tuned_session(parallelism=32, app_name="minibench")
spark.sparkContext.setLogLevel("ERROR")

from semargl_spark import queries as Q  # noqa: E402
from semargl_spark.operators.extract import extract_statements, triples  # noqa: E402
from semargl_spark.sources.transcripts import synth_transcripts  # noqa: E402

triples(extract_statements(synth_transcripts(spark, sf_dir, turns_per_doc=1))).count()

out = {}
mixed = synth_transcripts(spark, sf_dir, turns_per_doc=64)
best = None
for _ in range(4):
    t0 = time.perf_counter()
    n = triples(extract_statements(mixed)).count()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
out["extract_mixed"] = round(best, 3)
out["mixed_rows"] = n

reg = Q.registry()
for name in ("extract_ntriples", "vocab_expand", "render_turtle", "model_diff"):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        reg[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)

print(json.dumps(out))
spark.stop()
