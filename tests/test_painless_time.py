"""Painless java.time subset: ZonedDateTime / Instant / DateTimeFormatter /
ChronoUnit in BOTH engines — the Column compiler lowers to pure Catalyst
timestamp expressions (wall-clock fields answer in the parsed offset, like
Java), the interpreter executes aware-datetime objects per row."""

import pytest

from tests.conftest import run_one

from logstash_filter_elastic_integration_spark.functions.painless import (
    UnsupportedScriptError, compile_script)
from logstash_filter_elastic_integration_spark.functions.painless_exec import (
    CompiledScript)

TS = "2024-05-06T23:15:30.250+02:00"  # Monday, 21:15:30.250Z


def _resolve(path):
    from pyspark.sql import functions as F
    return F.col(path), None


def test_compiler_accepts_temporal_script(spark):
    # must lower in the COLUMN engine (no UnsupportedScriptError fallback)
    assignments = compile_script(
        "ctx.hour = ZonedDateTime.parse(ctx.ts).getHour(); "
        "ctx.ms = ZonedDateTime.parse(ctx.ts).toInstant().toEpochMilli(); "
        "ctx.d = ZonedDateTime.parse(ctx.ts).plusDays(1)"
        ".format(DateTimeFormatter.ofPattern('yyyy-MM-dd'));",
        _resolve)
    assert [p for p, _ in assignments] == ["hour", "ms", "d"]


def test_compiler_rejects_nonliteral_pattern(spark):
    with pytest.raises(UnsupportedScriptError):
        compile_script(
            "ctx.x = ZonedDateTime.parse(ctx.ts).format(ctx.fmt);", _resolve)


def test_temporal_columns_end_to_end(spark, registry):
    out = run_one(
        spark, registry,
        [{"script": {"source": """
            ctx.hour = ZonedDateTime.parse(ctx.ts).getHour();
            ctx.dow = ZonedDateTime.parse(ctx.ts).getDayOfWeek().getValue();
            ctx.ms = ZonedDateTime.parse(ctx.ts).toInstant().toEpochMilli();
            ctx.es = ZonedDateTime.parse(ctx.ts).toEpochSecond();
            ctx.tomorrow = ZonedDateTime.parse(ctx.ts).plusDays(1).format(DateTimeFormatter.ofPattern('yyyy-MM-dd'));
            ctx.late = ZonedDateTime.parse(ctx.ts).isAfter(ZonedDateTime.parse('2024-01-01T00:00:00Z'));
            ctx.utc_hour = ZonedDateTime.parse(ctx.ts).withZoneSameInstant(ZoneId.of('Z')).getHour();
        """}}],
        [(TS,)], "ts string")
    r = out[0]
    assert r["hour"] == 23          # wall clock in the ORIGINAL +02:00
    assert r["utc_hour"] == 21      # same instant viewed in UTC
    assert r["dow"] == 1            # Java: Monday=1
    assert r["ms"] == 1715030130250
    assert r["es"] == 1715030130
    assert r["tomorrow"] == "2024-05-07"
    assert r["late"] is True
    assert (r["tags"] or []) == []


def test_instant_statics_end_to_end(spark, registry):
    out = run_one(
        spark, registry,
        [{"script": {"source":
            "ctx.sec = Instant.ofEpochMilli(ctx.ms).getEpochSecond(); "
            "ctx.h = Instant.ofEpochMilli(ctx.ms).atZone(ZoneId.of('Z'))"
            ".getHour();"}}],
        [(1715030130250,)], "ms long")
    assert out[0]["sec"] == 1715030130
    assert out[0]["h"] == 21


def test_interpreter_temporal_loop():
    # a loop forces the statement interpreter; same java.time surface
    cs = CompiledScript("""
        def total = 0L;
        for (int i = 0; i < 3; i++) {
            total += ZonedDateTime.parse(ctx.ts).plusDays(i).getDayOfMonth();
        }
        ctx.sum_dom = total;
        ctx.mins = ChronoUnit.MINUTES.between(
            ZonedDateTime.parse('2024-05-06T21:00:00Z'),
            ZonedDateTime.parse(ctx.ts));
        ctx.stamp = Instant.ofEpochMilli(0);
    """)
    got = cs.run_row({"ts": TS})
    assert got["sum_dom"] == 6 + 7 + 8
    assert got["mins"] == 15
    assert got["stamp"] == "1970-01-01T00:00:00Z"  # ISO-serialized on write


def test_compiler_handles_multiline_statements(spark):
    # painless treats newlines as whitespace; a statement split across
    # lines must still take the Column fast path (not interpreter fallback)
    assignments = compile_script(
        "ctx.tomorrow = ZonedDateTime.parse(ctx.ts).plusDays(1)\n"
        "    .format(DateTimeFormatter.ofPattern('yyyy-MM-dd'));\n"
        "ctx.ok = ctx.level == 'high' &&\n    ctx.ts != null;",
        _resolve)
    assert [p for p, _ in assignments] == ["tomorrow", "ok"]


def test_interpreter_formatter_quoted_literal():
    cs = CompiledScript(
        "ctx.s = ZonedDateTime.parse(ctx.ts)"
        ".format(DateTimeFormatter.ofPattern(\"yyyy-MM-dd'T'HH:mm\"));")
    assert cs.run_row({"ts": TS}) == {"s": "2024-05-06T23:15"}
