"""Painless interpreter breadth: realistic ingest-pipeline script
patterns (the reference executes arbitrary Painless via its bundled
script engine — docs/index.asciidoc:192, SmokeTest.java pipelines use
set/script combos).  Each case asserts Java-exact values.

Covers the round-5 transpiler additions (arbitrary typed local decls,
casts, prefix ++/--, >>>, throw/typed catch, array news, for-each `in`,
null-safe `?.`) and the stdlib additions (Map compute/merge/entrySet,
List subList/removeIf, Set, Optional, Collectors.groupingBy/joining,
Boolean/Float/Long/Objects/UUID/Duration/Collections statics,
String.format, Integer radix methods, universal toString/intValue)."""
import pytest

from logstash_filter_elastic_integration_spark.functions.painless import (
    UnsupportedScriptError)
from logstash_filter_elastic_integration_spark.functions.painless_exec \
    import CompiledScript


def run(src, doc=None):
    return CompiledScript(src).run_row(dict(doc or {}))


# ---------------------------------------------------------------- casts --

def test_cast_char_to_int_and_back():
    out = run("ctx.a = (int) ctx.msg.charAt(0); ctx.b = (char) 98;",
              {"msg": "abc"})
    assert out == {"a": 97, "b": "b"}


def test_cast_chain_truncates_toward_zero():
    out = run("ctx.a = (long)(double) ctx.x; ctx.b = (int) ctx.y;",
              {"x": 3.9, "y": -3.9})
    assert out == {"a": 3, "b": -3}


def test_cast_in_arithmetic_binds_like_java():
    # (int) 3.9 + 1 is ((int)3.9)+1 = 4, not (int)4.9
    assert run("ctx.a = (int) ctx.x + 1;", {"x": 3.9}) == {"a": 4}


def test_cast_number_box_then_value_method():
    out = run("ctx.a = ((Number) ctx.x).floatValue(); "
              "ctx.b = ctx.x.intValue();", {"x": 3.7})
    assert out == {"a": 3.7, "b": 3}


def test_cast_string_of_null_stays_null():
    assert run("ctx.a = (String) ctx.missing; ctx.b = 1;", {}) == {
        "a": None, "b": 1}


# --------------------------------------------------- typed declarations --

def test_arbitrary_typed_locals():
    out = run("""
        StringBuilder sb = new StringBuilder();
        sb.append('a'); sb.insert(0, 'b');
        Set s = new HashSet(); s.add(1); s.add(1); s.add(2);
        ctx.a = sb.toString(); ctx.b = s.size();
    """)
    assert out == {"a": "ba", "b": 2}


def test_decl_without_initializer():
    assert run("int i; if (ctx.x > 1) { i = 5; } else { i = 7; } "
               "ctx.a = i;", {"x": 2}) == {"a": 5}


def test_constructor_with_source_collection():
    out = run("def l = new ArrayList(ctx.l); l.removeIf(x -> x < 2); "
              "l.sort((a, b) -> b - a); ctx.a = l;", {"l": [1, 2, 3]})
    assert out == {"a": [3, 2]}


# ------------------------------------------------------- control flow --

def test_prefix_increment_for_loop():
    assert run("def t = 0; for (int i = 0; i < 5; ++i) { t += i; } "
               "ctx.a = t;") == {"a": 10}


def test_foreach_in_form_over_entryset():
    out = run("""
        def out = [];
        for (e in ctx.m.entrySet()) {
            out.add(e.getKey() + '=' + e.getValue());
        }
        Collections.sort(out);
        ctx.a = out;
    """, {"m": {"x": 1, "y": 2}})
    assert out["a"] == ["x=1", "y=2"]


def test_throw_and_typed_catch():
    out = run("""
        try {
            throw new IllegalArgumentException('boom');
        } catch (IllegalArgumentException e) {
            ctx.a = e.getMessage();
        }
    """)
    assert out == {"a": "boom"}


def test_typed_catch_does_not_swallow_other_types():
    # an IndexOutOfBounds must fly PAST catch(NumberFormatException)
    with pytest.raises(Exception):
        run("""
            try {
                ctx.a = ctx.l.get(99);
            } catch (NumberFormatException e) {
                ctx.a = -1;
            }
        """, {"l": [1]})


def test_catch_hierarchy_nfe_is_illegal_argument():
    # NumberFormatException extends IllegalArgumentException
    out = run("""
        try {
            ctx.a = Integer.parseInt('zz');
        } catch (IllegalArgumentException e) {
            ctx.a = -1;
        }
    """)
    assert out == {"a": -1}


# ------------------------------------------------------------- arrays --

def test_array_new_sized_and_literal():
    out = run("""
        def a = new int[3]; a[0] = 1; a[1] = 2;
        def b = new String[] {'x', 'y'};
        ctx.a = a[0] + a[1] + a[2]; ctx.b = b[1]; ctx.c = b.length;
    """)
    assert out == {"a": 3, "b": "y", "c": 2}


def test_bit_ops_including_unsigned_shift():
    out = run("ctx.a = ctx.x << 2; ctx.b = ctx.x >>> 1; "
              "ctx.c = -8 >>> 1; ctx.d = ctx.x & 5; ctx.e = ctx.x ^ 5;",
              {"x": 12})
    # Java: -8 >>> 1 at int width = 2147483644
    assert out == {"a": 48, "b": 6, "c": 2147483644, "d": 4, "e": 9}


# ------------------------------------------------------- null safety --

def test_null_safe_chain_short_circuits():
    assert run("ctx.a = ctx.m?.k?.toUpperCase(); ctx.b = 1;",
               {"m": None}) == {"a": None, "b": 1}


def test_null_safe_on_present_value():
    assert run("ctx.a = ctx.m?.k?.toUpperCase();",
               {"m": {"k": "ab"}}) == {"a": "AB"}


# ------------------------------------------------------------- maps --

def test_map_compute_merge_putifabsent():
    out = run("""
        ctx.m.compute('x', (k, v) -> v == null ? 1 : v + 1);
        ctx.m.merge('y', 5, (a, b) -> a + b);
        ctx.m.putIfAbsent('z', 9);
        ctx.m.putIfAbsent('x', 99);
        ctx.a = ctx.m.getOrDefault('w', -1);
    """, {"m": {"x": 1}})
    assert out["m"] == {"x": 2, "y": 5, "z": 9} and out["a"] == -1


def test_map_tostring_java_rendering():
    assert run("ctx.a = ctx.m.toString();", {"m": {"x": 1}}) == {
        "a": "{x=1}"}


# ------------------------------------------------------------ streams --

def test_stream_maptoint_sum_max():
    out = run("ctx.a = ctx.l.stream().mapToInt(x -> x).sum(); "
              "ctx.b = ctx.l.stream().mapToInt(x -> x).max().getAsInt();",
              {"l": [1, 2, 3]})
    assert out == {"a": 6, "b": 3}


def test_stream_optional_orelse():
    out = run("ctx.a = ctx.l.stream().filter(x -> x > 10)"
              ".findFirst().orElse(-1);", {"l": [1, 2]})
    assert out == {"a": -1}


def test_collectors_grouping_and_joining():
    out = run("""
        def g = ctx.l.stream().collect(Collectors.groupingBy(x -> x % 2));
        ctx.a = g.get(0); ctx.b = g.get(1);
        ctx.c = ctx.l.stream().map(x -> x.toString())
                     .collect(Collectors.joining(','));
    """, {"l": [1, 2, 3, 4]})
    assert out == {"a": [2, 4], "b": [1, 3], "c": "1,2,3,4"}


def test_collectors_tomap_counting():
    out = run("""
        ctx.a = ctx.l.stream().collect(
            Collectors.toMap(x -> x, x -> x * 10));
        ctx.b = ctx.l.stream().collect(Collectors.counting());
    """, {"l": [1, 2]})
    assert out == {"a": {1: 10, 2: 20}, "b": 2}


# ------------------------------------------------------------ statics --

def test_boolean_objects_statics():
    out = run("ctx.a = Boolean.parseBoolean('true'); "
              "ctx.b = Objects.equals(ctx.x, ctx.y); "
              "ctx.c = Objects.isNull(ctx.z); "
              "ctx.d = Objects.requireNonNullElse(ctx.z, 'd');",
              {"x": 1, "y": 1})
    assert out == {"a": True, "b": True, "c": True, "d": "d"}


def test_integer_long_radix_statics():
    out = run("ctx.a = Integer.toHexString(255); "
              "ctx.b = Integer.parseInt('ff', 16); "
              "ctx.c = Integer.toString(255, 16); "
              "ctx.d = Long.toHexString(255); "
              "ctx.e = Long.MAX_VALUE; ctx.f = Integer.MAX_VALUE;")
    assert out == {"a": "ff", "b": 255, "c": "ff", "d": "ff",
                   "e": 9223372036854775807, "f": 2147483647}


def test_string_format_with_array_literal():
    out = run("ctx.a = String.format('%s-%03d', new def[] {ctx.h, ctx.n});",
              {"h": "x", "n": 7})
    assert out == {"a": "x-007"}


def test_uuid_name_from_bytes_is_java_exact():
    # java.util.UUID.nameUUIDFromBytes("stable".getBytes()) reference value
    out = run("ctx.a = UUID.nameUUIDFromBytes(ctx.s.getBytes('UTF-8'))"
              ".toString();", {"s": "stable"})
    assert out == {"a": "f40faf63-84fc-35a3-bd3b-05a9d41c012b"}


def test_duration_arithmetic():
    out = run("""
        ctx.a = Duration.ofSeconds(3661).toMinutes();
        ctx.b = Duration.between(
            Instant.parse('2024-01-01T00:00:00Z'),
            Instant.parse('2024-01-01T01:30:00Z')).getSeconds();
        ctx.c = Duration.ofMillis(1500).toString();
    """)
    assert out == {"a": 61, "b": 5400, "c": "PT1.5S"}


def test_localdate_parse_with_pattern():
    out = run("""
        DateTimeFormatter f = DateTimeFormatter.ofPattern('yyyy/MM/dd');
        ctx.a = LocalDate.parse(ctx.d, f).toString();
        ctx.b = LocalDate.parse(ctx.d, f).getDayOfWeek().getValue();
    """, {"d": "2024/05/06"})
    assert out == {"a": "2024-05-06", "b": 1}  # a Monday


def test_zdt_timezone_conversion():
    out = run("""
        ZonedDateTime z = ZonedDateTime.parse(ctx.t);
        ctx.a = z.withZoneSameInstant(
            ZoneId.of('America/New_York')).getHour();
    """, {"t": "2024-03-01T12:00:00Z"})
    assert out == {"a": 7}  # EST = UTC-5


def test_universal_tostring_and_numeric_methods():
    out = run("ctx.a = ctx.n.toString(); ctx.b = true.toString(); "
              "ctx.c = ctx.l.toString();", {"n": 42, "l": [1, None]})
    assert out == {"a": "42", "b": "true", "c": "[1, null]"}


def test_math_additions():
    out = run("ctx.a = Math.log10(100.0); ctx.b = Math.signum(-3.0); "
              "ctx.c = Math.toIntExact(7);")
    assert out == {"a": 2.0, "b": -1.0, "c": 7}


def test_math_random_fails_loud():
    cs = CompiledScript("ctx.a = Math.random();")
    with pytest.raises(RuntimeError, match="nondeterministic"):
        cs.run_row({})


def test_string_breadth():
    out = run("ctx.a = ctx.s.splitOnToken(':', 2); "
              "ctx.b = ctx.s.contentEquals('a:b:c'); "
              "ctx.c = ctx.s.indexOf(':', 2); ctx.d = ctx.s.repeat(2);",
              {"s": "a:b:c"})
    assert out == {"a": ["a", "b:c"], "b": True, "c": 3,
                   "d": "a:b:ca:b:c"}


def test_set_serializes_as_array():
    out = run("Set s = new HashSet(); s.add('b'); s.add('a'); s.add('b'); "
              "ctx.tags = s;")
    assert sorted(out["tags"]) == ["a", "b"]


def test_treeset_iterates_sorted():
    out = run("Set s = new TreeSet(); s.add(3); s.add(1); s.add(2); "
              "ctx.a = new ArrayList(s);")
    assert out == {"a": [1, 2, 3]}


# ------------------------------------------- r5 functional/util breadth --

def test_lambda_stored_in_map_and_var_dispatches_java_names():
    # Function.apply on a stored lambda (maps of lambdas, typed locals)
    out = run("def m = ['a': x -> x + 1, 'b': x -> x * 2]; "
              "Function f = x -> x * 3; "
              "ctx.r = m.a.apply(4); ctx.s = m.b.apply(4); "
              "ctx.t = f.apply(5);")
    assert out == {"r": 5, "s": 8, "t": 15}


def test_functional_interfaces_full_set():
    out = run("BiFunction add = (a,b) -> a + b; "
              "Predicate big = s -> s.length() > 2; "
              "Supplier ans = () -> 42; "
              "def acc = []; Consumer c = x -> acc.add(x); c.accept(7); "
              "ctx.a = add.apply(2,3); ctx.b = big.test('abcd'); "
              "ctx.c = ans.get(); ctx.d = acc; "
              "ctx.e = Function.identity().apply(9);")
    assert out == {"a": 5, "b": True, "c": 42, "d": [7], "e": 9}


def test_function_compose_andthen_negate():
    out = run("Function f = x -> x + 1; Function g = x -> x * 10; "
              "Predicate p = s -> s.isEmpty(); "
              "ctx.a = f.andThen(g).apply(2); "
              "ctx.b = f.compose(g).apply(2); "
              "ctx.c = p.negate().test('x');")
    assert out == {"a": 30, "b": 21, "c": True}


def test_comparator_statics_and_chaining():
    out = run("def l = [['n': 2, 'm': 1], ['n': 1, 'm': 9]]; "
              "l.sort(Comparator.comparing(m -> m.n)); ctx.a = l[0].m; "
              "def k = [1, 3, 2]; "
              "k.sort(Comparator.naturalOrder().reversed()); ctx.b = k;")
    assert out == {"a": 9, "b": [3, 2, 1]}


def test_string_joiner():
    out = run("StringJoiner j = new StringJoiner(','); "
              "j.add('a'); j.add('b'); ctx.a = j.toString(); "
              "StringJoiner k = new StringJoiner(', ', '[', ']'); "
              "k.add('x'); k.add('y'); ctx.b = k.toString(); "
              "StringJoiner e = new StringJoiner('-'); "
              "e.setEmptyValue('EMPTY'); ctx.c = e.toString();")
    assert out == {"a": "a,b", "b": "[x, y]", "c": "EMPTY"}


def test_explicit_iterator():
    out = run("Iterator it = ctx.l.iterator(); int s = 0; "
              "while (it.hasNext()) { s += it.next(); } ctx.s = s;",
              {"l": [1, 2, 3]})
    assert out == {"s": 6}


def test_arraydeque_stack_and_queue():
    out = run("ArrayDeque d = new ArrayDeque(); d.push(1); d.push(2); "
              "ctx.a = d.pop(); "                  # LIFO head
              "ArrayDeque q = new ArrayDeque(); q.offer(1); q.offer(2); "
              "ctx.b = q.poll(); ctx.c = q.peek();")  # FIFO
    assert out == {"a": 2, "b": 1, "c": 2}


def test_treemap_first_last_key():
    out = run("TreeMap t = new TreeMap(); t.put('b', 2); t.put('a', 1); "
              "t.put('c', 3); ctx.a = t.firstKey(); ctx.b = t.lastKey();")
    assert out == {"a": "a", "b": "c"}


def test_locale_arg_on_case_methods():
    out = run("ctx.a = ctx.s.toLowerCase(Locale.ROOT); "
              "ctx.b = ctx.s.toLowerCase();", {"s": "ABC"})
    assert out == {"a": "abc", "b": "abc"}


def test_processors_community_id():
    # the published community-id v1 test vector (128.232.110.120:34855 ->
    # 66.35.250.204:80 tcp seed 0) — also pins parity with the
    # community_id processor's Column path (operators/net.py:883)
    out = run("ctx.cid = Processors.communityId(ctx.sip, ctx.dip, null, "
              "'tcp', ctx.sp, ctx.dp, null, null, 0);",
              {"sip": "128.232.110.120", "dip": "66.35.250.204",
               "sp": 34855, "dp": 80})
    assert out["cid"] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # 8-arg overload binds seed=0; flipped endpoints hash identically
    out2 = run("ctx.cid = Processors.communityId(ctx.sip, ctx.dip, 6, "
               "null, ctx.sp, ctx.dp, null, null);",
               {"sip": "66.35.250.204", "dip": "128.232.110.120",
                "sp": 80, "dp": 34855})
    assert out2["cid"] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="


def test_processors_community_id_icmp_one_way():
    # ICMP type 8 (echo) pairs with 0 -> bidirectional ordering; an
    # unpaired type (e.g. 3 dest-unreachable) is one-way: never flipped
    a = run("ctx.cid = Processors.communityId(ctx.s, ctx.d, null, "
            "'icmp', null, null, 8, 0, 0);",
            {"s": "10.0.0.1", "d": "10.0.0.2"})
    b = run("ctx.cid = Processors.communityId(ctx.s, ctx.d, null, "
            "'icmp', null, null, 0, 8, 0);",
            {"s": "10.0.0.2", "d": "10.0.0.1"})
    assert a["cid"] == b["cid"]
    c = run("ctx.cid = Processors.communityId(ctx.s, ctx.d, null, "
            "'icmp', null, null, 3, 1, 0);",
            {"s": "10.0.0.2", "d": "10.0.0.1"})
    assert c["cid"] != a["cid"]


def test_java9_collection_factories():
    out = run("ctx.a = Map.of('a', 1, 'b', 2); ctx.b = List.of(1, 2, 3); "
              "def s = Set.of(1, 2); ctx.c = s.contains(2); "
              "def e = Map.entry('k', 5); "
              "ctx.d = e.getKey() + ':' + e.getValue();")
    assert out == {"a": {"a": 1, "b": 2}, "b": [1, 2, 3], "c": True,
                   "d": "k:5"}


def test_stream_and_intstream_statics():
    out = run("ctx.a = Stream.of(1, 2, 3).map(x -> x + 1)"
              ".collect(Collectors.toList()); "
              "ctx.b = IntStream.range(0, 4).sum(); "
              "ctx.c = IntStream.rangeClosed(1, 4).map(x -> x * x).sum();")
    assert out == {"a": [2, 3, 4], "b": 6, "c": 30}


def test_getbytes_length_and_signed_elements():
    # Java byte[] exposes .length as a field and SIGNED elements
    out = run("def b = ctx.s.getBytes('UTF-8'); "
              "ctx.n = b.length; ctx.first = b[0];", {"s": "é"})
    assert out == {"n": 2, "first": -61}


def test_java_named_regex_groups():
    # Java (?<name>...) syntax; lookbehind (?<=...) must stay untouched
    out = run("def m = /(?<num>\\d+)/.matcher(ctx.s); "
              "if (m.find()) { ctx.r = m.group('num'); } "
              "ctx.lb = ctx.s =~ /(?<=b)1/;", {"s": "ab12"})
    assert out == {"r": "12", "lb": True}


def test_ctx_bracket_access_and_metadata_fields():
    # the reference's own spec script shape
    # (elastic_integration_spec.rb:761): bracket reads/writes incl. the
    # _index metadata field and params bracket access
    out = run_p("ctx['_index'] = ctx['lang'] + '-' + params['dataset'];",
                {"lang": "en"}, {"dataset": "web"})
    assert out == {"_index": "en-web"}
    out2 = run_p("ctx['@t2'] = ctx['ts'];", {"ts": "2024-01-01"}, None)
    assert out2 == {"@t2": "2024-01-01"}


def test_nested_map_dot_write_is_map_put():
    # `ctx.event.duration = ...` through a NESTED map must be Map.put —
    # regression pin: it previously landed as a Python instance
    # attribute and the write was silently dropped
    out = run_p("ctx.event.duration = ctx.event.end - ctx.event.start;",
                {"event": {"end": 100, "start": 40}}, None)
    assert out["event"] == {"end": 100, "start": 40, "duration": 60}


def run_p(src, doc, params):
    return CompiledScript(src, params).run_row(dict(doc or {}))


def test_stored_method_reference_dispatches_apply():
    out = run("Function f = String::valueOf; ctx.a = f.apply(3); "
              "Function up = String::toUpperCase; ctx.b = up.apply('ab');")
    assert out == {"a": "3", "b": "AB"}


def test_optional_statics():
    out = run("ctx.a = Optional.ofNullable(ctx.x).map(v -> v * 2)"
              ".orElse(-1); "
              "ctx.b = Optional.of(5).get(); "
              "ctx.c = Optional.empty().isPresent();", {"x": None})
    assert out == {"a": -1, "b": 5, "c": False}


def test_stream_iterate_takewhile_dropwhile():
    out = run("ctx.a = Stream.iterate(1, x -> x * 2).limit(4)"
              ".collect(Collectors.toList()); "
              "ctx.b = ctx.l.stream().takeWhile(x -> x < 3)"
              ".collect(Collectors.toList()); "
              "ctx.c = ctx.l.stream().dropWhile(x -> x < 3)"
              ".collect(Collectors.toList());", {"l": [1, 2, 3, 1]})
    assert out == {"a": [1, 2, 4, 8], "b": [1, 2], "c": [3, 1]}
    # the unbounded form without limit() fails loud, not hangs
    with pytest.raises(Exception, match="unbounded"):
        run("ctx.r = Stream.iterate(1, x -> x + 1).count();")


def test_string_replaceall_java_replacement_syntax():
    # String.replaceAll must honor Java's $N refs / \$ literal (the
    # Column engine gets this free via Spark's Java-regex
    # regexp_replace; the interpreter now translates)
    out = run("ctx.a = ctx.s.replaceAll('(\\\\d+)-(\\\\d+)', '$2/$1'); "
              "ctx.b = ctx.s.replaceAll('and', '\\\\$');"
              , {"s": "12-34 and 5-6"})
    assert out == {"a": "34/12 and 6/5", "b": "12-34 $ 5-6"}
    out2 = run("ctx.r = ctx.s.replaceAll('(?<d>\\\\d+)', '<${d}>');",
               {"s": "a12"})
    assert out2 == {"r": "a<12>"}


def test_ctx_whole_document_views():
    # keySet/size/isEmpty on ctx: top-level-segment view of the flat
    # model (dotted columns collapse to their first segment, like the
    # reference's nested document map); keys are Java strings
    out = run_p("ctx.n = ctx.size(); "          # BEFORE any new key
                "def ks = new ArrayList(ctx.keySet()); ks.sort(null); "
                "ctx.r = ks;",
                {"a.b": 1, "a.c": 2, "d": 3}, None)
    # live-map semantics: size() counted the just-written 'n' too
    assert out["r"] == ["a", "d", "n"] and out["n"] == 2
    # the strip-fields-by-prefix cleanup idiom
    out2 = run_p("def drop = []; for (k in ctx.keySet()) "
                 "{ if (k.startsWith('tmp')) { drop.add(k); } } "
                 "for (k in drop) { ctx.remove(k); } ctx.done = true;",
                 {"tmp_a": 1, "keep": 2}, None)
    assert out2["done"] is True and out2["tmp_a"] is None


def test_string_format_both_signatures():
    out = run_p("ctx.a = String.format('%05d-%s', ctx.i, ctx.s); "
                "ctx.b = String.format('%d', new def[]{7});",
                {"i": 42, "s": "x"}, None)
    assert out == {"a": "00042-x", "b": "7"}


def test_ctx_values_and_entryset():
    out = run_p("def v = ctx.values(); ctx.n = v.size(); "
                "def m = [:]; for (e in ctx.entrySet()) "
                "{ m[e.getKey()] = e.getValue(); } ctx.copy = m;",
                {"a": 1, "b": "x"}, None)
    # live map: the copy sees the just-written 'n' too
    assert out["n"] == 2 and out["copy"] == {"a": 1, "b": "x", "n": 2}
    # Entry.setValue writes through to the document
    out2 = run_p("for (e in ctx.entrySet()) "
                 "{ if (e.getKey() == 'a') { e.setValue(99); } }",
                 {"a": 1, "b": 2}, None)
    assert out2 == {"a": 99}
