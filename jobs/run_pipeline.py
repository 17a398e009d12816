"""spark-submit entry point for the full KG-construction pipeline
(north_rule: ``spark-submit --py-files semargl_spark.zip
jobs/run_pipeline.py --input ... --output ...``).

Stages: extract → link → canon → merge, with per-stage lineage rows and
idempotent partitioned writes (checkpoint-resume: re-running overwrites
only the partitions it produces; the lineage table records per-partition
row counts + checksums for audit).

Build the zip with:  python -c "from semargl_spark.spark_util import \
build_pyfiles_zip; print(build_pyfiles_zip('semargl_spark.zip'))"
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts parquet dir (conv_id, turn_idx, role, text, tool, ts[, fmt])")
    ap.add_argument("--output", required=True, help="output dir for nodes/edges/lineage")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--dictionary", default=None,
                    help="entity dictionary parquet (canonical_iri, surface_form, weight)")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose lineage rows for this run-id already "
                         "exist (checkpoint-resume after a failed/killed run); "
                         "requires --run-id, the id of the run being resumed")
    ap.add_argument("--fuzzy-link", action="store_true",
                    help="link with the distance-1 SymSpell fuzzy joiner "
                         "(operators/link.fuzzy_link_entities) instead of "
                         "exact surface matching — recovers mentions with one "
                         "character of noise at the cost of a wider broadcast")
    ap.add_argument("--shapes", default=None,
                    help="JSON file with a list of SHACL-lite shape dicts "
                         "(operators/validate.validate_shapes); violations "
                         "are written to <output>/violations as a data-"
                         "quality side output")
    ap.add_argument("--ontology", default=None,
                    help="NTriples file of RDFS axioms (subClassOf/"
                         "subPropertyOf/domain/range); entailed triples are "
                         "materialized into the edge tables "
                         "(operators/vocab.rdfs_infer)")
    ap.add_argument("--sparql", default=None,
                    help="SPARQL SELECT/ASK/CONSTRUCT/DESCRIBE or a SPARQL "
                         "1.1 Update request (operators/sparql.py subset) to "
                         "run against the materialized edge table after the "
                         "merge stage; non-ASK results (for Update: the "
                         "updated edge set) land in <output>/query and the "
                         "row count (or ASK boolean) is reported in the "
                         "summary JSON")
    args = ap.parse_args(argv)
    if args.resume and not args.run_id:
        # without the original run-id the lineage filter matches nothing
        # and every stage silently re-runs — refuse instead
        ap.error("--resume requires --run-id (the id of the run to resume)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("semargl-kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    summary = run(spark, input_path=args.input, output=args.output,
                  run_id=args.run_id, dictionary=args.dictionary,
                  resume=args.resume, fuzzy_link=args.fuzzy_link,
                  shapes=args.shapes, ontology=args.ontology,
                  sparql=args.sparql)
    print(json.dumps(summary))
    spark.stop()
    return 0


def run(spark, *, input_path: str, output: str, run_id: str | None = None,
        dictionary: str | None = None, resume: bool = False,
        fuzzy_link: bool = False, shapes: str | None = None,
        ontology: str | None = None, sparql: str | None = None) -> dict:
    """The pipeline body, callable in-process (tests, notebooks) — does
    not stop the session. ``main`` wraps it for spark-submit."""
    from pyspark.sql import functions as F

    from semargl_spark.operators.canon import connected_components
    from semargl_spark.operators.extract import errors, extract_statements, triples
    from semargl_spark.operators.link import fuzzy_link_entities, link_entities
    from semargl_spark.operators.materialize import (
        lineage_rows,
        materialize_kg,
        write_lineage,
    )

    run_id = run_id or f"run-{int(time.time())}"
    t_start = time.perf_counter()
    transcripts = spark.read.parquet(input_path)

    # checkpoint-resume (north_rule): the lineage table doubles as the
    # stage ledger — a stage whose lineage rows for this run_id are
    # already recorded completed its (idempotent) write before the
    # previous attempt died, so --resume skips it
    done_stages: set[str] = set()
    if resume:
        try:
            done_stages = {
                r["stage"]
                for r in spark.read.parquet(f"{output}/lineage")
                .filter(F.col("run_id") == run_id)
                .select("stage")
                .distinct()
                .collect()
            }
        except Exception:  # no lineage yet → fresh run
            done_stages = set()

    # named observation on the extraction output: per-run metric rows
    # (statements / error statements) collected by the JVM during the
    # job's own actions — zero extra passes, the production-monitoring
    # hook a 10^12-turn run exposes to its scheduler
    from pyspark.sql import Observation

    # unnamed → a session-unique internal name; a fixed name would
    # collide when run() executes twice in one session (resume/replay)
    obs = Observation()
    statements = extract_statements(transcripts).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col("obj_kind") == "error").cast("long")).alias("error_rows"),
    ).persist()
    st = triples(statements)
    err = errors(statements)

    resumed = sorted(done_stages)
    if "extract" not in done_stages:
        write_lineage(lineage_rows(st, run_id, "extract"), f"{output}/lineage")

    equiv = None
    if dictionary:
        dict_df = spark.read.parquet(dictionary)
        linker = fuzzy_link_entities if fuzzy_link else link_entities
        links = linker(st, dict_df).persist()
        if "link" not in done_stages:
            links.write.mode("overwrite").parquet(f"{output}/links")
            write_lineage(lineage_rows(links, run_id, "link"), f"{output}/lineage")
        equiv = links.select(
            F.col("mention_node").alias("src"), F.col("canonical_iri").alias("dst")
        ).distinct()

    components = connected_components(equiv) if equiv is not None else None
    if components is not None and "canon" not in done_stages:
        write_lineage(
            lineage_rows(components, run_id, "canon"), f"{output}/lineage"
        )

    if ontology and "infer" not in done_stages:
        # RDFS materialization BEFORE merge: entailed triples join the
        # asserted ones in the edge tables (closure pre-composed on the
        # driver, one broadcast join per rule)
        from semargl_spark.kernels.ntriples import parse as parse_ntriples
        from semargl_spark.operators.vocab import rdfs_infer

        with open(ontology) as f:
            axioms, onto_errs = parse_ntriples(f.read(), doc_key="onto")
        if onto_errs:
            raise ValueError(f"ontology parse errors: {onto_errs[:3]}")
        onto_triples = [(t.subj, t.pred, t.obj) for t in axioms]
        inferred = rdfs_infer(
            st.select("subj", "pred", "obj", "obj_kind").distinct(),
            onto_triples,
        ).select(
            "subj", "pred", "obj", "obj_kind",
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("dtype"),
            F.lit(None).cast("string").alias("graph"),
            F.lit("rdfs").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
        )
        st = st.unionByName(inferred, allowMissingColumns=True)
        write_lineage(lineage_rows(inferred, run_id, "infer"),
                      f"{output}/lineage")

    if shapes and "validate" not in done_stages:
        # data-quality side output: violation rows only, never the
        # conforming majority
        from semargl_spark.operators.validate import validate_shapes

        with open(shapes) as f:
            shape_list = json.load(f)
        violations = validate_shapes(
            st.select("subj", "pred", "obj", "obj_kind", "dtype").distinct(),
            shape_list,
        )
        violations.write.mode("overwrite").parquet(f"{output}/violations")
        write_lineage(lineage_rows(violations, run_id, "validate"),
                      f"{output}/lineage")
        summary_violations = violations.count()
    else:
        summary_violations = None

    if "merge" in done_stages:
        # whole run already completed: report from the materialized tables
        summary = {
            "run_id": run_id,
            "nodes": spark.read.parquet(f"{output}/nodes").count(),
            "edges": spark.read.parquet(f"{output}/edges").count(),
        }
    else:
        summary = materialize_kg(st, components, output, run_id)
    if summary_violations is not None:
        summary["violations"] = summary_violations
    summary["errors"] = err.count()
    summary["statements"] = st.count()
    try:
        summary["observed"] = {k: int(v) for k, v in obs.get.items()}
    except Exception:
        # metrics are ADVISORY and must never fail the job: when the
        # extraction plan is served from a structurally-equal cached
        # plan of an earlier in-session run (replay/concurrent resume),
        # the observe node never executes and getRow() has no metrics
        summary["observed"] = None
    if sparql:
        # query the JUST-MATERIALIZED edge table (reads back from disk,
        # so pushed predicate constants hit the parquet scan and the
        # src-partitioned layout prunes constant-subject patterns)
        import re as _re

        from semargl_spark.operators.sparql import (
            sparql_ask, sparql_construct, sparql_describe, sparql_select,
            sparql_update,
        )

        edges_df = spark.read.parquet(f"{output}/edges")
        head = _re.sub(r"(?i)PREFIX\s+\w*:\s*<[^>]*>", "", sparql).strip()
        verb = head.split(None, 1)[0].upper() if head else ""
        if verb == "ASK":
            summary["ask"] = sparql_ask(edges_df, sparql)
        else:
            if verb == "CONSTRUCT":
                res = sparql_construct(edges_df, sparql)
            elif verb == "DESCRIBE":
                res = sparql_describe(edges_df, sparql)
            elif verb in ("INSERT", "DELETE"):
                # SPARQL Update: the updated edge SET lands in
                # <output>/query (never overwrite the edges table
                # while reading it); a table-level commit is a
                # rerun's materialize over this result
                res = sparql_update(edges_df, sparql)
            else:
                res = sparql_select(edges_df, sparql)
            res.write.mode("overwrite").parquet(f"{output}/query")
            summary["query_rows"] = spark.read.parquet(f"{output}/query").count()
    if resumed:
        summary["resumed_stages"] = resumed
    statements.unpersist()
    # in-job wall (excludes JVM/session boot — the long-running-
    # application view a cluster deployment amortizes); used by
    # tools/bench_job_scaling.py
    summary["wall_sec"] = round(time.perf_counter() - t_start, 2)
    return summary


if __name__ == "__main__":
    sys.exit(main())
