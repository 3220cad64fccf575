"""Physical-plan regression guards: the compiled pipeline must stay a
narrow, JVM-only projection (the whole performance story at 100 TB).
These fail if a change reintroduces Python row processing or a shuffle
into the parse/route path."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.flagship import (
    build_router, with_datastream)
from logstash_filter_elastic_integration_spark.sources.datagen import transcripts


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_plan_is_narrow_jvm_only(spark, tmp_path):
    src = str(tmp_path / "t")
    transcripts(spark, 500).write.parquet(src)
    tdf = spark.read.parquet(src)
    out = build_router(spark).execute(with_datastream(tdf))
    plan = _executed_plan(out)
    # grok runs as Arrow-batched pandas UDFs — NEVER row-at-a-time Python
    assert "BatchEvalPython" not in plan
    # no shuffle: broadcast joins only (BroadcastExchange is fine)
    stripped = plan.replace("BroadcastExchange", "BCX")
    assert "Exchange" not in stripped
    # r6: the tiny role/tool lookup dims compile to fused map-literal
    # probes — the flagship parse/enrich/route path carries NO join at
    # all (previously two BroadcastHashJoins re-copied the wide working
    # row; operators/enrich.py literal-map fast path)
    assert "Join" not in plan
    assert "map(keys" in plan or "try_element_at" in plan, plan[:2000]


def test_grok_jvm_engine_has_no_python_nodes(spark, tmp_path):
    """engine='jvm' grok compiles to pure Column expressions."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    reg.register("j", {"processors": [
        {"grok": {"field": "text", "engine": "jvm",
                  "patterns": ["%{IPV4:ip} %{WORD:w}"],
                  "ignore_failure": True}}]})
    src = str(tmp_path / "tj")
    transcripts(spark, 200).write.parquet(src)
    out = run_pipeline(spark.read.parquet(src), "j", reg)
    assert "EvalPython" not in _executed_plan(out)


def test_grok_jvm_regex_executes_once_despite_downstream_refs(spark):
    """The staged __grok_parts projection must NOT be inlined into
    downstream references (SPARK-36718: CollapseProject keeps non-cheap
    multi-referenced producer expressions staged).  Regression pin for
    the measured 5x blowup when the regex re-executes per reference —
    and for the removal of the legacy rand() pseudo-barrier, which
    Spark 4.1 constant-folds away anyway."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    df = spark.createDataFrame(
        [("1 ok 2",), ("7 go 9",)], ["msg"])
    reg = PipelineRegistry()
    reg.register("once", {"processors": [
        {"grok": {"field": "msg", "engine": "jvm",
                  "patterns": ["^%{INT:uid:int} %{WORD:etype} %{INT:val:int}$"]}},
        # three downstream references to the grok outputs = the
        # inlining pressure that used to duplicate the regex
        {"set": {"field": "combo", "value": "{{uid}}-{{etype}}-{{val}}"}},
    ]})
    out = run_pipeline(df, "once", reg).select("uid", "etype", "val", "combo")
    plan = _executed_plan(out)
    # the match predicate runs exactly once per row
    assert plan.count("RLIKE") == 1, plan
    # the packed rewrite runs exactly once per row
    assert plan.count("regexp_replace") == 1, plan
    # the nondeterministic pseudo-barrier is gone for good
    assert "rand(" not in plan, plan


def test_sink_counts_is_partial_final_hash_agg(spark, tmp_path):
    src = str(tmp_path / "t2")
    transcripts(spark, 500).write.parquet(src)
    tdf = spark.read.parquet(src)
    router = build_router(spark)
    out = router.execute(with_datastream(tdf))
    plan = _executed_plan(router.sink_counts(out))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "SortAggregate" not in plan


def test_scan_prunes_columns(spark, tmp_path):
    """Column pruning reaches the parquet scan for a projecting query."""
    src = str(tmp_path / "t3")
    transcripts(spark, 500).write.parquet(src)
    df = spark.read.parquet(src).select("conv_id").filter(
        F.col("conv_id") == "conv-00000000")
    plan = _executed_plan(df)
    assert "ReadSchema: struct<conv_id:string>" in plan
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id" in plan


def test_adjacent_groks_fuse_into_one_arrow_node(spark):
    """SURVEY §7.5 'fused one-UDF-per-chain': Spark's ExtractPythonUDFs
    batches independent pandas UDFs in one stage into a single
    ArrowEvalPython node — one Arrow exchange for N adjacent groks."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    reg.register("two", {"processors": [
        {"grok": {"field": "a", "patterns": ["%{INT:x:int}"],
                  "engine": "pandas", "ignore_failure": True}},
        {"grok": {"field": "b", "patterns": ["%{WORD:y}"],
                  "engine": "pandas", "ignore_failure": True}},
    ]})
    df = spark.createDataFrame([("1", "w")], "a string, b string")
    out = run_pipeline(df, "two", reg)
    assert _executed_plan(out).count("ArrowEvalPython") == 1


def test_grok_auto_engine_selects_jvm_for_safe_patterns(spark):
    """engine=auto (default): a single-pattern grok with no atomic groups /
    possessive quantifiers / backrefs lowers to rlike + regexp_extract —
    ZERO Python in the plan.  Multi-pattern groks stay on the watchdogged
    pandas engine."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    reg.register("safe", {"processors": [
        {"grok": {"field": "a", "patterns": ["%{INT:x:int} %{WORD:w}"],
                  "ignore_failure": True}}]})
    df = spark.createDataFrame([("1 w",)], "a string")
    assert "ArrowEvalPython" not in _executed_plan(
        run_pipeline(df, "safe", reg))
    reg2 = PipelineRegistry()
    reg2.register("multi", {"processors": [
        {"grok": {"field": "a", "patterns": ["%{INT:x:int}", "%{WORD:w}"],
                  "ignore_failure": True}}]})
    assert "ArrowEvalPython" in _executed_plan(
        run_pipeline(df, "multi", reg2))


def test_flagship_plan_is_python_free(spark, tmp_path):
    """The flagship parse->enrich->route plan under engine=auto: no
    ArrowEvalPython anywhere — grok lowered to the JVM, everything else
    already Column-only."""
    from logstash_filter_elastic_integration_spark.flagship import (
        run_flagship)
    from logstash_filter_elastic_integration_spark.sources.datagen import (
        transcripts)
    src = str(tmp_path / "fs")
    transcripts(spark, 200).write.parquet(src)
    df = spark.read.parquet(src)
    plan = _executed_plan(run_flagship(spark, df))
    assert "ArrowEvalPython" not in plan


def test_registered_domain_plan_broadcast_only(spark):
    """The PSL rule joins must all be broadcast hash joins: no exchange on
    the fact side regardless of rule-set size."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    reg.register("rd", {"processors": [
        {"registered_domain": {"field": "domain_field",
                               "target_field": "url"}}]})
    df = spark.range(100).selectExpr("concat('www.example', id, '.co.uk') AS domain_field")
    out = run_pipeline(df, "rd", reg)
    plan = _executed_plan(out)
    stripped = plan.replace("BroadcastExchange", "BCX")
    assert "Exchange" not in stripped
    assert plan.count("BroadcastHashJoin") >= 4  # one per PSL depth


def test_geoip_range_plan_broadcast_only(spark, tmp_path):
    """Range geoip (incl. most-specific segmentation) keeps the fact side
    exchange-free: segmentation runs dim-side at compile."""
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    dim = spark.createDataFrame(
        [(0, 100, "a"), (50, 60, "b")], "lo long, hi long, zone string")
    reg.dims["r.mmdb"] = dim
    reg.register("g", {"processors": [
        {"geoip": {"field": "ip", "database_file": "r.mmdb",
                   "range_keys": ["lo", "hi"], "target_field": "geo"}}]})
    df = spark.range(100).selectExpr("concat('10.0.0.', id % 255) AS ip")
    out = run_pipeline(df, "g", reg)
    plan = _executed_plan(out)
    stripped = plan.replace("BroadcastExchange", "BCX")
    assert "Exchange" not in stripped
    assert "BroadcastNestedLoopJoin" in plan


def test_decontaminate_plan_never_shuffles_corpus(spark):
    """Decontamination: ONE corpus pass — the exploded shingle stream
    reaches the benchmark dim through a broadcast LEFT join (no
    SortMergeJoin anywhere), and the only corpus-side exchange is the
    partial+final per-doc aggregate AFTER the join."""
    from logstash_filter_elastic_integration_spark import queries as Q
    df = Q.QUERIES["decontaminate_ngram"](spark, "/root/testdata/sf0.001")
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # single partial+final agg: exactly one doc_id-keyed exchange
    assert plan.count("Exchange hashpartitioning(doc_id#") == 1


# ------------------------------------------------- user_agent codegen ------
def _ua_pipeline(spark, rows, cfg):
    from logstash_filter_elastic_integration_spark.plans import (
        PipelineRegistry, run_pipeline)
    reg = PipelineRegistry()
    reg.register("ua", {"processors": [{"user_agent": cfg}]})
    df = spark.createDataFrame(rows, "ua string")
    return run_pipeline(df, "ua", reg)


_UA_ROWS = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; "
     "+http://www.google.com/bot.html)",),
    ("curl/8.4.0",), (None,),
]


def test_user_agent_chain_outside_wholestage_codegen(spark):
    """VERDICT r4 #1: the ~270-branch bank must NOT be inlined into a
    fused processNext() (one 47KB method -> janino failure / silent
    interpreted eval).  The chain Project runs standalone: its plan line
    has no whole-stage `*(n)` marker."""
    # dedup_parse=False pins the raw per-row chain shape (the DEFAULT
    # distinct-parse path runs the IDENTICAL chain expressions on the
    # distinct dim — see test_user_agent_default_dedup_parse below)
    out = _ua_pipeline(spark, _UA_ROWS, {"field": "ua",
                                         "dedup_parse": False})
    plan = _executed_plan(out)
    chain_lines = [ln for ln in plan.splitlines() if "coalesce(CASE WHEN" in ln]
    assert chain_lines, "UA chain Project missing from plan"
    for ln in chain_lines:
        assert not ln.lstrip("+- ").startswith("*("), (
            "UA chain fused into WholeStageCodegen:\n" + ln[:200])


def test_user_agent_default_dedup_parse_broadcasts(spark):
    """DEFAULT path: the bank runs once per DISTINCT UA (ES
    UserAgentCache parity), joined back via an AQE-decided broadcast —
    the fact side is never exchange-shuffled."""
    out = _ua_pipeline(spark, _UA_ROWS * 50, {"field": "ua"})
    rows = out.collect()                      # finalize the AQE plan
    final = _executed_plan(out).split("== Initial Plan ==")[0]
    assert "HashAggregate" in final           # the distinct dim
    assert "BroadcastHashJoin" in final
    # AQE replans the initial SMJ to broadcast; the fact side's planned
    # exchange degrades to a LOCAL shuffle read (no network movement)
    assert "SortMergeJoin" not in final
    by_ua = {r["ua"]: r for r in rows}
    assert by_ua[_UA_ROWS[0][0]]["user_agent.name"] == "Chrome"


def test_user_agent_codegen_compiles_default_bank(spark):
    """The standalone chain Project must COMPILE (branch-split small
    methods), not fall back to interpreted eval: CODEGEN_ONLY factory
    mode makes any expression-codegen failure a hard error."""
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        out = _ua_pipeline(spark, _UA_ROWS, {"field": "ua",
                                             "extract_device_type": True})
        rows = {r["ua"]: r for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    chrome = rows[_UA_ROWS[0][0]]
    assert chrome["user_agent.name"] == "Chrome"
    assert chrome["user_agent.os.name"] == "Windows"
    assert rows[_UA_ROWS[1][0]]["user_agent.name"] == "Googlebot"


def test_user_agent_codegen_compiles_full_scale_bank(spark, tmp_path):
    """A wholesale ~1200-entry regex_file bank (uap-core scale) must stay
    fully compiled too — every segment is its own small method."""
    lines = ["user_agent_parsers:"]
    for i in range(1150):
        lines.append(f"  - regex: '(SynthAgent{i:04d})/(\\d+)\\.(\\d+)'")
    lines.append("os_parsers:")
    for i in range(120):
        lines.append(f"  - regex: 'SynthOS{i:03d} (\\d+)'")
        lines.append(f"    os_replacement: 'Synth OS {i}'")
    lines.append("device_parsers:")
    for i in range(80):
        lines.append(f"  - regex: 'SynthDev{i:03d}'")
        lines.append(f"    device_replacement: 'Device {i}'")
    p = tmp_path / "big.yaml"
    p.write_text("\n".join(lines) + "\n")
    rows = [("SynthAgent1149/9.7 SynthOS119 42 SynthDev079",),
            ("SynthAgent0000/1.0",), ("nothing-matches",)]
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        out = _ua_pipeline(spark, rows, {"field": "ua",
                                         "regex_file": str(p)})
        got = {r["ua"]: r for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    last = got["SynthAgent1149/9.7 SynthOS119 42 SynthDev079"]
    assert last["user_agent.name"] == "SynthAgent1149"
    assert last["user_agent.version"] == "9.7"
    assert last["user_agent.os.name"] == "Synth OS 119"
    assert last["user_agent.device.name"] == "Device 79"
    assert got["SynthAgent0000/1.0"]["user_agent.name"] == "SynthAgent0000"
    assert got["nothing-matches"]["user_agent.name"] == "Other"
