"""Differential testing: every straight-line painless script that the
COLUMN engine accepts must produce the same values as the statement
INTERPRETER.  The reference has one engine (the bundled painless
script service) so it cannot diverge from itself; this repo has two, so
cross-engine agreement is a correctness property worth pinning over a
generated expression corpus — one Spark job evaluates the whole matrix.
"""

import math

import pytest

from logstash_filter_elastic_integration_spark.functions.painless import (
    UnsupportedScriptError, compile_script)
from logstash_filter_elastic_integration_spark.functions.painless_exec import (
    CompiledScript)
from logstash_filter_elastic_integration_spark.plans.document import (
    resolver_for)

DOC = {"i": 7, "j": -3, "d": 2.5, "s": "Hello World", "t": "abc",
       "b": True, "z": 0, "neg": -9.5, "arr": [4, 1, 3],
       "sarr": ["b", "a", "c"], "csv": "x,y,z",
       "iso": "2024-03-05T10:20:30Z", "sz": "2kb",
       "url": "a%20b%26c", "big": 9223372036854775807}
SCHEMA = ("i long, j long, d double, s string, t string, b boolean, "
          "z long, neg double, arr array<long>, sarr array<string>, "
          "csv string, iso string, sz string, url string, big long")

# operand pool: every expression references only DOC fields + literals
CORPUS = [
    # arithmetic (Java semantics: truncating division, sign of dividend)
    "ctx.r = ctx.i + ctx.j;",
    "ctx.r = ctx.i - ctx.j * 2;",
    "ctx.r = ctx.i / 2;",
    "ctx.r = ctx.j / 2;",
    "ctx.r = ctx.i % 4;",
    "ctx.r = ctx.j % 4;",
    "ctx.r = ctx.i + ctx.d;",
    "ctx.r = ctx.d * 4.0 - 1;",
    "ctx.r = -ctx.i + 100;",
    # string ops
    "ctx.r = ctx.s + '!';",
    "ctx.r = ctx.s + ctx.i;",
    "ctx.r = 'n=' + ctx.d;",
    "ctx.r = ctx.s.toLowerCase();",
    "ctx.r = ctx.s.toUpperCase();",
    "ctx.r = ctx.s.trim();",
    "ctx.r = ctx.s.substring(6);",
    "ctx.r = ctx.s.substring(0, 5);",
    "ctx.r = ctx.s.replace('l', 'L');",
    "ctx.r = ctx.s.contains('World');",
    "ctx.r = ctx.s.startsWith('He');",
    "ctx.r = ctx.s.endsWith('ld');",
    "ctx.r = ctx.s.indexOf('o');",
    "ctx.r = ctx.s.length();",
    "ctx.r = ctx.s.isEmpty();",
    # comparisons / boolean logic
    "ctx.r = ctx.i > ctx.j;",
    "ctx.r = ctx.i >= 7;",
    "ctx.r = ctx.i == 7 && ctx.b;",
    "ctx.r = ctx.i < 0 || !ctx.b;",
    "ctx.r = ctx.s == 'Hello World';",
    "ctx.r = ctx.t != 'abc';",
    # ternary / Elvis
    "ctx.r = ctx.i > 0 ? 'pos' : 'neg';",
    "ctx.r = ctx.missing ?: 'dflt';",
    "ctx.r = ctx.b ? ctx.i : ctx.j;",
    # Math statics
    "ctx.r = Math.abs(ctx.j);",
    "ctx.r = Math.max(ctx.i, ctx.z);",
    "ctx.r = Math.min(ctx.d, 1.0);",
    "ctx.r = Math.floor(ctx.neg);",
    "ctx.r = Math.ceil(ctx.d);",
    "ctx.r = Math.sqrt(16.0);",
    "ctx.r = Math.pow(2.0, 10.0);",
    # parse / render statics
    "ctx.r = Integer.parseInt('42') + ctx.i;",
    "ctx.r = Double.parseDouble('1.5') + ctx.d;",
    "ctx.r = String.valueOf(ctx.i);",
    # null handling
    "ctx.r = ctx.missing == null;",
    "ctx.r = ctx.s != null;",
    # regex operators
    "ctx.r = ctx.s =~ /World/;",
    "ctx.r = ctx.t ==~ /[a-c]+/;",
    # multi-assignment: later statements see earlier assignments
    "ctx.r = ctx.i * 2; ctx.r2 = ctx.r != null ? 'y' : 'n';",
    "ctx.r = ctx.i + 1; ctx.r2 = ctx.r + 1;",
    # arrays / lists
    "ctx.r = ctx.arr.size();",
    "ctx.r = ctx.arr.contains(3L);",
    "ctx.r = ctx.arr[0] + ctx.arr[2];",
    "ctx.r = ctx.sarr.isEmpty();",
    # streams-lite (Column engine lowers to higher-order functions)
    "ctx.r = ctx.arr.stream().map(x -> x * 2).collect(Collectors.toList());",
    "ctx.r = ctx.arr.stream().filter(x -> x > 1).count();",
    "ctx.r = ctx.sarr.stream().anyMatch(x -> x == 'a');",
    "ctx.r = String.join('-', ctx.sarr);",
    # split
    "ctx.r = ctx.csv.splitOnToken(',');",
    # Processors statics
    "ctx.r = Processors.lowercase(ctx.s);",
    "ctx.r = Processors.uppercase(ctx.t);",
    "ctx.r = Processors.bytes(ctx.sz);",
    "ctx.r = Processors.urlDecode(ctx.url);",
    # java.time (both engines)
    "ctx.r = ZonedDateTime.parse(ctx.iso).getYear();",
    "ctx.r = ZonedDateTime.parse(ctx.iso).getDayOfMonth();",
    "ctx.r = Instant.parse(ctx.iso).toEpochMilli();",
    # replaceAll with group refs (Java $N on both engines)
    "ctx.r = ctx.csv.replaceAll('([a-z])', '<$1>');",
    # Java null-rendering concat ('s=' + null -> "s=null", not null)
    "ctx.r = 's=' + ctx.missing;",
    "ctx.r = '' + ctx.b;",
    # Math.round is Java floor(x+0.5) -> long, NOT half-up-on-magnitude
    "ctx.r = Math.round(ctx.neg);",
    "ctx.r = Math.round(2.5);",
    "ctx.r = Math.signum(-2.0) + Math.abs(ctx.j);",
    # string methods newly on the fast path
    "ctx.r = ctx.s.lastIndexOf('l');",
    "ctx.r = ctx.s.lastIndexOf('zz');",
    "ctx.r = ctx.s.charAt(1);",
    "ctx.r = ctx.s.concat('!!');",
    "ctx.r = ctx.s.compareTo('World') < 0;",
    "ctx.r = Integer.toString(255, 16);",
    "ctx.r = Integer.toHexString(255);",
    # integral division: exact past 2^53 (no double round-trip),
    # truncating toward zero like Java
    "ctx.r = ctx.big / 7;",
    "ctx.r = ctx.big / ctx.i;",
    "ctx.r = ctx.j / 2;",
    # stream sum terminal
    "ctx.r = ctx.arr.stream().mapToInt(x -> x).sum();",
]


def _num(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


@pytest.fixture(scope="module")
def diff_results(spark):
    df = spark.createDataFrame([tuple(DOC.values())],
                               ", ".join(f"`{k}` {t.split()[1]}"
                                         for k, t in zip(
                                             DOC, SCHEMA.split(", "))))
    cols = {}
    expected = {}
    column_ok = []
    for idx, src in enumerate(CORPUS):
        try:
            assignments = compile_script(src, resolver_for(df))
        except UnsupportedScriptError:
            continue  # interpreter-only scripts are out of scope here
        column_ok.append(idx)
        for path, col in assignments:
            cols[f"c{idx}_{path}"] = col
        interp = CompiledScript(src).run_row(dict(DOC))
        for path, val in interp.items():
            expected[f"c{idx}_{path}"] = val
    row = df.withColumns(cols).select(*cols).collect()[0].asDict()
    return column_ok, row, expected


def test_column_engine_accepts_most_of_the_corpus(diff_results):
    column_ok, _, _ = diff_results
    # the corpus is straight-line by construction; the Column engine
    # should take nearly all of it (a falling-back corpus would make
    # this differential test vacuous)
    assert len(column_ok) >= len(CORPUS) * 8 // 10, (
        f"Column engine only accepted {len(column_ok)}/{len(CORPUS)}")


def _gen_arith_corpus():
    """Deterministic combinatorial matrix: every binop pair over mixed
    int/long/double operands, two nesting shapes — exercises Java
    numeric-promotion, truncating/integral division, and remainder-sign
    lowering agreement far beyond the hand-written cases."""
    ops = ["+", "-", "*", "/", "%"]
    operands = ["ctx.i", "ctx.j", "ctx.d", "3", "2.5"]
    corpus = []
    for k, (o1, o2) in enumerate(
            (a, b) for a in ops for b in ops):
        a = operands[k % len(operands)]
        b = operands[(k + 1) % len(operands)]
        c = operands[(k + 2) % len(operands)]
        corpus.append(f"ctx.r = ({a} {o1} {b}) {o2} {c};")
        corpus.append(f"ctx.r = {a} {o1} ({b} {o2} {c});")
    return corpus


def _gen_string_corpus():
    """Chained string-method matrix: pairs of zero-arg transforms over
    pairs of extractors, so method-on-method results (and their static
    types) agree across engines."""
    transforms = [".toLowerCase()", ".toUpperCase()", ".trim()"]
    extractors = [".substring(2)", ".substring(1, 7)",
                  ".replace('l', 'L')", ".concat('xy')",
                  ".replaceAll('[aeiou]', '_')"]
    corpus = []
    for i, t1 in enumerate(transforms):
        for j, ex in enumerate(extractors):
            corpus.append(f"ctx.r = ctx.s{t1}{ex};")
            corpus.append(f"ctx.r = ctx.s{ex}{t1};")
            t2 = transforms[(i + j + 1) % len(transforms)]
            corpus.append(f"ctx.r = ctx.s{t1}{ex}{t2}.length();")
    return corpus


@pytest.fixture(scope="module")
def string_results(spark):
    df = spark.createDataFrame([tuple(DOC.values())],
                               ", ".join(f"`{k}` {t.split()[1]}"
                                         for k, t in zip(
                                             DOC, SCHEMA.split(", "))))
    cols = {}
    expected = {}
    for idx, src in enumerate(_gen_string_corpus()):
        try:
            assignments = compile_script(src, resolver_for(df))
        except UnsupportedScriptError:
            continue
        for path, col in assignments:
            cols[f"s{idx}_{path}"] = col
        for path, val in CompiledScript(src).run_row(dict(DOC)).items():
            expected[f"s{idx}_{path}"] = val
    row = df.withColumns(cols).select(*cols).collect()[0].asDict()
    return row, expected


def test_generated_string_matrix_agrees(string_results):
    row, expected = string_results
    assert len(expected) >= 30
    errors = [f"{k}: column={row.get(k)!r} interpreter={v!r}"
              for k, v in expected.items() if row.get(k) != v]
    assert not errors, "\n".join(errors)


def _gen_bool_corpus():
    """Comparison/ternary matrix: every comparator over mixed operand
    pairs, negated and chained with &&/||, plus a ternary selecting on
    each — the full boolean lowering surface."""
    cmps = ["==", "!=", "<", "<=", ">", ">="]
    pairs = [("ctx.i", "ctx.j"), ("ctx.d", "2.5"), ("ctx.i", "7"),
             ("ctx.s", "'Hello World'"), ("ctx.z", "0")]
    corpus = []
    for k, op in enumerate(cmps):
        for a, b in pairs:
            corpus.append(f"ctx.r = {a} {op} {b};")
            corpus.append(f"ctx.r = !({a} {op} {b});")
            o2 = cmps[(k + 1) % len(cmps)]
            corpus.append(
                f"ctx.r = {a} {op} {b} && ctx.b || ctx.i {o2} 5;")
            corpus.append(f"ctx.r = {a} {op} {b} ? 'T' : 'F';")
    return corpus


@pytest.fixture(scope="module")
def bool_results(spark):
    df = spark.createDataFrame([tuple(DOC.values())],
                               ", ".join(f"`{k}` {t.split()[1]}"
                                         for k, t in zip(
                                             DOC, SCHEMA.split(", "))))
    cols = {}
    expected = {}
    for idx, src in enumerate(_gen_bool_corpus()):
        try:
            assignments = compile_script(src, resolver_for(df))
        except UnsupportedScriptError:
            continue
        for path, col in assignments:
            cols[f"b{idx}_{path}"] = col
        for path, val in CompiledScript(src).run_row(dict(DOC)).items():
            expected[f"b{idx}_{path}"] = val
    row = df.withColumns(cols).select(*cols).collect()[0].asDict()
    return row, expected


def test_generated_boolean_matrix_agrees(bool_results):
    row, expected = bool_results
    assert len(expected) >= 80
    errors = [f"{k}: column={row.get(k)!r} interpreter={v!r}"
              for k, v in expected.items() if row.get(k) != v]
    assert not errors, "\n".join(errors)


@pytest.fixture(scope="module")
def arith_results(spark):
    df = spark.createDataFrame([tuple(DOC.values())],
                               ", ".join(f"`{k}` {t.split()[1]}"
                                         for k, t in zip(
                                             DOC, SCHEMA.split(", "))))
    cols = {}
    expected = {}
    for idx, src in enumerate(_gen_arith_corpus()):
        try:
            assignments = compile_script(src, resolver_for(df))
        except UnsupportedScriptError:
            continue
        try:
            interp = CompiledScript(src).run_row(dict(DOC))
        except Exception:
            continue     # row-failing scripts (e.g. % 0) are interp-only
        for path, col in assignments:
            cols[f"g{idx}_{path}"] = col
        for path, val in interp.items():
            expected[f"g{idx}_{path}"] = val
    row = df.withColumns(cols).select(*cols).collect()[0].asDict()
    return row, expected


def test_generated_arithmetic_matrix_agrees(arith_results):
    row, expected = arith_results
    assert len(expected) >= 40    # the matrix must not silently shrink
    errors = []
    for key, want in expected.items():
        got = row.get(key)
        if isinstance(want, float) or isinstance(got, float):
            same = (got is not None and want is not None
                    and math.isclose(float(got), float(want),
                                     rel_tol=1e-9, abs_tol=1e-12))
        else:
            same = got == want
        if not same:
            errors.append(f"{key}: column={got!r} interpreter={want!r}")
    assert not errors, "\n".join(errors)


def test_engines_agree_on_every_value(diff_results):
    _, row, expected = diff_results
    errors = []
    for key, want in expected.items():
        got = row.get(key)
        if isinstance(want, float) or isinstance(got, float):
            same = (got is not None and want is not None
                    and math.isclose(float(got), float(want),
                                     rel_tol=1e-9, abs_tol=1e-12))
        else:
            same = got == want
        if not same:
            errors.append(f"{key}: column={got!r} interpreter={want!r}")
    assert not errors, "\n".join(errors)
