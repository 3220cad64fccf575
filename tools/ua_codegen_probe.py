"""Dev probe: report whole-stage-codegen method sizes for the user_agent
stage, under the default curated bank and (optionally) a full uap-core
``regex_file`` bank.

Usage: python tools/ua_codegen_probe.py [regex_file.yaml]

Prints one line per WholeStageCodegen subtree:
    subtree k/N maxMethodCodeSize=NNN constPool=NNN inner=N
and FAILS (exit 1) if any subtree exceeds the 8000-byte JIT
HugeMethodLimit (above which the stage silently runs interpreted).
"""
import re
import sys
import time

sys.path.insert(0, ".")

from logstash_filter_elastic_integration_spark.session import get_spark
from logstash_filter_elastic_integration_spark.plans import (
    PipelineRegistry, run_pipeline)

UAS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
    "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 "
    "Safari/604.1",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "curl/8.4.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
]


def codegen_report(spark, df):
    """Collect WholeStageCodegenExec subtrees and compile each generated
    source with CodeGenerator to get real bytecode stats.  (debug.
    codegenString's pretty-printer crashes on regex literals whose
    braces are unbalanced — negative indent — so compile the raw
    source directly.)"""
    plan = df._jdf.queryExecution().executedPlan()
    nodes = []

    def walk(node):
        nodes.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    cg = getattr(getattr(
        spark._jvm.org.apache.spark.sql.catalyst.expressions.codegen,
        "CodeGenerator$"), "MODULE$")
    out = []
    for node in nodes:
        if not node.getClass().getName().endswith("WholeStageCodegenExec"):
            continue
        src = node.doCodeGen()._2()
        stats = cg.compile(src)._2()
        out.append({"maxMethod": stats.maxMethodCodeSize(),
                    "constPool": stats.maxConstPoolSize(),
                    "head": node.simpleString(60)})
    return out


def main():
    spark = get_spark(app_name="ua-probe", cores=8, shuffle_partitions=8)
    cfg = {"field": "ua", "extract_device_type": True}
    if len(sys.argv) > 1:
        cfg["regex_file"] = sys.argv[1]
    reg = PipelineRegistry()
    reg.register("p", {"processors": [{"user_agent": cfg}]})
    df = spark.createDataFrame([(u,) for u in UAS * 200], "ua string")
    out = run_pipeline(df, "p", reg)
    t0 = time.time()
    rows = codegen_report(spark, out)
    bad = [r for r in rows if r["maxMethod"] > 8000]
    for r in rows:
        flag = "  <-- EXCEEDS 8000 (interpreted fallback)" \
            if r["maxMethod"] > 8000 else ""
        print(f"maxMethodCodeSize={r['maxMethod']} "
              f"constPool={r['constPool']}  {r['head'][:60]}{flag}")
    print(f"subtrees={len(rows)} report_time={time.time()-t0:.1f}s")
    # hard-compile check: janino must succeed with fallback disabled
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        out2 = run_pipeline(df, "p", reg)
        n = out2.count()
        print(f"fallback=false count ok: {n}")
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
