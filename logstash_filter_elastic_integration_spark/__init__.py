"""PySpark-native re-implementation of the Elasticsearch ingest-pipeline
execution model, as embedded by ``elastic/logstash-filter-elastic_integration``.

This is NOT a port: the reference (see ``/root/reference``) is a per-event,
row-at-a-time Java engine executing a declarative processor-chain DSL
(reference: ``EventProcessor.java``, ``IngestPipeline.java``).  Here the same
DSL compiles on the Spark driver into *declarative DataFrame transformations*
— pure Column expressions for every mutate/convert/route processor, and
vectorized pandas/Arrow UDFs only for regex-class extraction (grok, dissect
fallback, redact) — so Catalyst/Tungsten pick the physical plan and the whole
chain runs as a narrow, shuffle-free projection.

Layout:
  plans/       pipeline DSL model + driver-side compiler (JSON -> df transform)
  operators/   the 30+ processor implementations (SURVEY.md §2)
  functions/   grok bank, dissect, painless-subset condition compiler,
               fingerprints, text stats, vector math
  sources/     transcripts datagen, table catalog (parquet-backed, Iceberg-
               shaped API), checkpoint manifest, lookup dims
  streaming/   Structured Streaming wrapper (readStream -> pipeline ->
               foreachBatch router)
  router.py    datastream resolution, reroute fixpoint, multi-sink fan-out,
               per-sink aggregates
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
