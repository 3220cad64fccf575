"""Processor registry — the Spark analogue of the factory map built in
EventProcessorBuilder.java:80-118 (34 ingest-common processors + redact +
pipeline + geoip).  Processor types NOT in this dict (e.g. ``enrich``,
``inference``, ``set_security_user`` — deliberately unsupported in the
reference too, spec/integration/elastic_integration_spec.rb:1515-1570) fail
the pipeline for every routed row, matching reference behavior.

Each impl: ``(df: DataFrame, spec: ProcessorSpec, ctx: CompileContext) ->
DataFrame`` — a pure driver-side compilation step emitting Column
expressions / broadcast joins; nothing executes until the plan runs.
"""

from .mutate import (
    p_append, p_convert, p_dot_expander, p_drop, p_fail, p_foreach, p_gsub,
    p_join, p_lowercase, p_remove, p_rename, p_script, p_set, p_sort,
    p_split, p_terminate, p_trim, p_uppercase,
)
from .parse import p_csv, p_dissect, p_grok, p_json, p_kv, p_redact
from .dates import p_date, p_date_index_name
from .net import (
    p_bytes, p_community_id, p_fingerprint, p_html_strip,
    p_network_direction, p_registered_domain, p_uri_parts, p_urldecode,
    p_user_agent,
)
from .enrich import p_geoip, p_lookup
from .routing import p_pipeline, p_reroute

PROCESSOR_IMPLS = {
    "append": p_append,
    "bytes": p_bytes,
    "community_id": p_community_id,
    "convert": p_convert,
    "csv": p_csv,
    "date": p_date,
    "date_index_name": p_date_index_name,
    "dissect": p_dissect,
    "dot_expander": p_dot_expander,
    "drop": p_drop,
    "fail": p_fail,
    "fingerprint": p_fingerprint,
    "foreach": p_foreach,
    "geoip": p_geoip,
    "grok": p_grok,
    "gsub": p_gsub,
    "html_strip": p_html_strip,
    "join": p_join,
    "json": p_json,
    "kv": p_kv,
    "lookup": p_lookup,
    "lowercase": p_lowercase,
    "network_direction": p_network_direction,
    "pipeline": p_pipeline,
    "redact": p_redact,
    "registered_domain": p_registered_domain,
    "remove": p_remove,
    "rename": p_rename,
    "reroute": p_reroute,
    "script": p_script,
    "set": p_set,
    "sort": p_sort,
    "split": p_split,
    "terminate": p_terminate,
    "trim": p_trim,
    "uppercase": p_uppercase,
    "uri_parts": p_uri_parts,
    "urldecode": p_urldecode,
    "user_agent": p_user_agent,
}
