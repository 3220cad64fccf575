"""Flagship north-rule job: parse -> enrich -> route -> aggregate over the
transcript table (BASELINE.json north_star).

Pipelines (JSON DSL, same language as the reference's fixtures):
 - ``transcripts-root``: grok the apache-style request line out of ``text``
   (typed captures), kv-parse tool lines, enrich via broadcast role/tool
   dims, fingerprint the turn, then reroute tool turns to the tool
   datastream.
 - ``transcripts-tools``: tool-turn enrichment (kv latency -> long, tool
   category lookup).
Failure rows (grok non-match over prose turns) keep the original text and
carry ``_ingest_pipeline_failure`` — they still land in their sink, tagged,
exactly like the reference plugin's failure contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .plans.pipeline import PipelineRegistry
from .router import Router
from .sources.datagen import role_dim, tool_dim

# IPV4 (not IP): the transcripts carry v4 addresses only, and the IPV6
# alternation multiplies regex cost ~10x per non-matching position
# unanchored (ES search semantics); measured marginally faster than the
# anchored packed lowering for this pattern at 1M rows
APACHE_PATTERN = (
    "%{IPV4:client_ip} %{WORD:http_method} %{URIPATHPARAM:url_path} "
    "%{NUMBER:http_status:int} %{NUMBER:bytes:int} %{NUMBER:duration:double}")

ROOT_PIPELINE = {
    "processors": [
        {"set": {"field": "event.kind", "value": "transcript-turn"}},
        {"grok": {
            "field": "text",
            "patterns": [APACHE_PATTERN],
            # tool= and JSON turns are parsed by their own processors below;
            # prose turns intentionally fall through to grok and FAIL ->
            # tagged _ingest_pipeline_failure with the original row kept
            # (the reference's failure contract, EventProcessor.java:176-184)
            "if": ("ctx.text.startsWith('tool=') != true && "
                   "ctx.text.startsWith('{') != true"),
        }},
        {"kv": {
            "field": "text",
            "field_split": " ",
            "value_split": "=",
            "include_keys": ["status", "latency_ms"],
            "prefix": "tool_",
            "if": "ctx.text.startsWith('tool=')",
            "ignore_failure": True,
        }},
        {"convert": {"field": "tool_latency_ms", "type": "long",
                     "ignore_missing": True, "ignore_failure": True}},
        {"lookup": {"field": "role", "table": "role_dim",
                    "target_field": "role_meta"}},
        {"lookup": {"field": "tool", "table": "tool_dim",
                    "target_field": "tool_meta", "ignore_missing": True}},
        {"fingerprint": {"fields": ["conv_id", "turn_idx", "text"],
                         "target_field": "turn_fingerprint", "method": "MD5"}},
        {"set": {"field": "http_class",
                 "value": "error", "if": "ctx.http_status >= 500"}},
        {"set": {"field": "http_class",
                 "value": "ok", "if": "ctx.http_status < 500"}},
        {"reroute": {"dataset": "agent.tools",
                     "if": "ctx.role == 'tool'"}},
    ]
}

TOOLS_PIPELINE = {
    "processors": [
        {"set": {"field": "event.kind", "value": "tool-turn"}},
        {"set": {"field": "tool_call", "value": "{{tool}}:{{tool_status}}"}},
    ]
}

ROUTING = {
    "logs-agent.turns-default": "transcripts-root",
    "logs-agent.tools-*": "transcripts-tools",
}


def build_registry(spark: SparkSession) -> PipelineRegistry:
    reg = PipelineRegistry()
    reg.register("transcripts-root", ROOT_PIPELINE)
    reg.register("transcripts-tools", TOOLS_PIPELINE)
    reg.dims["role_dim"] = role_dim(spark)
    reg.dims["tool_dim"] = tool_dim(spark)
    return reg


def build_router(spark: SparkSession, **kw) -> Router:
    return Router(registry=build_registry(spark), routing=dict(ROUTING), **kw)


def with_datastream(df: DataFrame) -> DataFrame:
    """Stamp the datastream routing fields the resolver consumes
    (DatastreamEventToIndexNameResolver shape)."""
    return (df.withColumn("data_stream.type", F.lit("logs"))
            .withColumn("data_stream.dataset", F.lit("agent.turns"))
            .withColumn("data_stream.namespace", F.lit("default")))


def run_flagship(spark: SparkSession, transcripts_df: DataFrame) -> DataFrame:
    router = build_router(spark)
    return router.execute(with_datastream(transcripts_df))
