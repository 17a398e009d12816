"""Reference-API facade: the migration surface for Semargl users.

Mirrors ``org.semarglproject.source.StreamProcessor``
(/root/reference/core/src/main/java/org/semarglproject/source/
StreamProcessor.java:35-106) including the exact property-URI keys
(StreamProcessor.java:45-56, RdfaParser.java:64-92), so reference-style
wiring

    sp = new StreamProcessor(RdfaParser.connect(NTriplesSerializer...))
    sp.setProperty(RdfaParser.ENABLE_VOCAB_EXPANSION, true)
    sp.process(reader, baseUri)

translates one-to-one::

    sp = StreamProcessor(output="ntriples")
    sp.setProperty(StreamProcessor.ENABLE_VOCAB_EXPANSION, True)
    lines = sp.process(transcripts_df)

Differences forced by the distributed setting, all documented per key:
vocabulary data must be provided offline (executors never fetch), and
disabled error recovery surfaces as a driver-side exception after the
extraction action rather than an abort mid-stream (tasks themselves
never fail — E10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators.extract import errors, extract_statements, triples


class ParseError(RuntimeError):
    """Raised by process() when error recovery is disabled and the
    corpus produced processor-graph errors (reference analogue:
    ParseException aborting StreamProcessor.process)."""


class StreamProcessor:
    # property keys — byte-identical to the reference constants
    ENABLE_ERROR_RECOVERY = (
        "http://semarglproject.org/core/properties/enable-error-recovery"
    )
    PROCESSOR_GRAPH_HANDLER_PROPERTY = (
        "http://semarglproject.org/core/properties/processor-graph-handler"
    )
    RDFA_VERSION_PROPERTY = "http://semarglproject.org/rdfa/properties/version"
    ENABLE_OUTPUT_GRAPH = (
        "http://semarglproject.org/rdfa/properties/enable-output-graph"
    )
    ENABLE_PROCESSOR_GRAPH = (
        "http://semarglproject.org/rdfa/properties/enable-processor-graph"
    )
    ENABLE_VOCAB_EXPANSION = (
        "http://semarglproject.org/rdfa/properties/enable-vocab-expansion"
    )
    # offline replacement for the reference's HTTP vocabulary fetch
    # (Vocabulary.java:55-108): a DataFrame of vocabulary triples
    VOCABULARY_PROPERTY = (
        "http://semarglproject.org/rdfa/properties/vocabulary-dataframe"
    )

    def __init__(self, output: str = "statements"):
        """``output`` selects the terminal sink: 'statements' (the quads
        DataFrame), 'ntriples' / 'nquads' (rendered text lines, W1/W2),
        or 'turtle' (per-document Turtle, W3)."""
        if output not in ("statements", "ntriples", "nquads", "turtle"):
            raise ValueError(f"unknown output sink: {output}")
        self._output = output
        self._props: dict[str, object] = {
            self.ENABLE_ERROR_RECOVERY: True,
            self.ENABLE_OUTPUT_GRAPH: True,
            self.ENABLE_PROCESSOR_GRAPH: False,
            self.ENABLE_VOCAB_EXPANSION: False,
        }

    def setProperty(self, key: str, value) -> bool:
        """Reference semantics (Pipe.setProperty walks the chain and
        returns whether anyone consumed the key)."""
        known = {
            self.ENABLE_ERROR_RECOVERY,
            self.ENABLE_OUTPUT_GRAPH,
            self.ENABLE_PROCESSOR_GRAPH,
            self.ENABLE_VOCAB_EXPANSION,
            self.VOCABULARY_PROPERTY,
            self.RDFA_VERSION_PROPERTY,
        }
        if key not in known:
            return False
        self._props[key] = value
        return True

    def process_uri(self, spark, uri: str, mime: str | None = None):
        """Reference ``process(uri|file, mimeType)`` overload
        (BaseStreamProcessor.java:61-120): DRIVER-side fetch + MIME/
        extension/content dispatch, then the ordinary distributed
        extraction. Executors never fetch (SCALE.md design rule)."""
        from .sources.fetch import fetch_to_dataframe

        return self.process(fetch_to_dataframe(spark, [uri], mime))

    def process(self, transcripts: DataFrame, fmt: str | None = None):
        """transcripts(conv_id, turn_idx, text[, fmt]) → configured sink.

        Returns a DataFrame (statements or rendered lines). With error
        recovery disabled, raises :class:`ParseError` if any document
        produced processor-graph errors (one eager count)."""
        if self._output == "turtle":
            self._check_turtle_props()
        st = extract_statements(transcripts, default_fmt=fmt)

        if not self._props[self.ENABLE_ERROR_RECOVERY]:
            st = st.localCheckpoint(eager=False)
            n_err = errors(st).count()
            if n_err:
                first = errors(st).select("obj").limit(1).collect()[0][0]
                raise ParseError(f"{n_err} parse errors; first: {first}")

        out = None
        if self._props[self.ENABLE_OUTPUT_GRAPH]:
            out = triples(st)
            if self._props[self.ENABLE_VOCAB_EXPANSION]:
                vocab = self._props.get(self.VOCABULARY_PROPERTY)
                if vocab is None:
                    raise ValueError(
                        "vocab expansion enabled but no VOCABULARY_PROPERTY "
                        "DataFrame set (executors never fetch over HTTP)"
                    )
                from .operators.vocab import expand_statements

                out = expand_statements(out, vocab)
        if self._props[self.ENABLE_PROCESSOR_GRAPH]:
            err = errors(st)
            out = err if out is None else out.unionByName(err)
        if out is None:  # both graphs disabled → empty stream
            out = triples(st).limit(0)

        if self._output == "statements":
            return out
        if self._output in ("ntriples", "nquads"):
            from .operators.serialize_ops import render_ntriples

            return render_ntriples(out, quads=self._output == "nquads")
        from .operators.serialize_ops import render_turtle_docs

        return render_turtle_docs(transcripts, fmt=fmt or "ntriples")

    def _check_turtle_props(self) -> None:
        """Turtle renders per-document via the fused parse→serialize
        pass, which bypasses the gated/expanded statements pipeline. The
        reference contract is "setProperty consumed ⟹ takes effect"
        (Pipe.setProperty walks the chain), so properties this sink
        cannot honor must fail loudly instead of being silently
        ignored."""
        incompatible = [
            key
            for key, required in (
                (self.ENABLE_OUTPUT_GRAPH, True),
                (self.ENABLE_PROCESSOR_GRAPH, False),
                (self.ENABLE_VOCAB_EXPANSION, False),
            )
            if bool(self._props[key]) is not required
        ]
        if incompatible:
            raise ValueError(
                "the turtle sink renders documents directly and cannot "
                f"honor non-default settings for: {incompatible}; use "
                "output='statements'/'ntriples' for gated/expanded graphs"
            )
