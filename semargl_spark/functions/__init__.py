"""Scalar/graph helper functions: graph comparison (test oracle),
SPARQL ASK evaluation (RDFa conformance), similarity kernels."""
