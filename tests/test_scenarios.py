"""Realistic multi-processor scenarios from the reference's integration
spec: the tomcat grok+date+remove pipeline over real-shaped log lines
(spec/integration/elastic_integration_spec.rb:1377-1455), and the
multi-pattern grok path (vectorized pandas-UDF execution)."""

from tests.conftest import run_one


TOMCAT_LINES = [
    ("2023-03-16 16:32:37,706 +0500 | DEBUG | "
     "o.s.b.w.s.ServletContextInitializerBeans - Mapping filters: "
     "characterEncodingFilter urls=[/*] order=-2147483648",),
    ("2023-03-16 16:32:40,212 +0500 | WARN | "
     "JpaBaseConfiguration$JpaWebConfiguration - spring.jpa.open-in-view is "
     "enabled by default.",),
    ("2023-03-16 17:36:10,957 +0500 | WARN | "
     "com.zaxxer.hikari.pool.HikariPool - HikariPool-1 - Thread starvation "
     "or clock leap detected (housekeeper delta=17m631ms).",),
    # multi-line stack trace: GREEDYDATA does not cross newlines -> failure
    ("2023-03-16 18:26:33,267 +0500 | ERROR | o.a.c.c.C.DispatcherServlet - "
     "Servlet.service() threw exception\n  at uz.tatu.HotelBookingService"
     ".hotel(HotelBookingService.java:27) ~[classes/:na]",),
]

TOMCAT_PIPELINE = [
    {"grok": {"field": "message", "patterns": ["%{TOMCATLOG}"]}},
    {"date": {"field": "timestamp",
              "formats": ["yyyy-MM-dd HH:mm:ss,SSS ZZZ"]}},
    {"remove": {"field": "message"}},
]


def test_tomcat_scenario(spark, registry):
    out = run_one(spark, registry, TOMCAT_PIPELINE,
                  TOMCAT_LINES, "message string")
    ok = sorted((r for r in out if not (r["tags"] or [])),
                key=lambda r: r["timestamp"])
    # grok match is a SEARCH (unanchored, like the ES processor): the
    # multi-line stack trace matches on its first line
    assert len(ok) == 4
    r = ok[0]
    assert r["level"] == "DEBUG"
    assert r["class"] == "o.s.b.w.s.ServletContextInitializerBeans"
    assert r["timestamp"] == "2023-03-16 16:32:37,706 +0500"
    # date processor wrote @timestamp as ISO8601 from the +0500 offset
    assert r["@timestamp"].startswith("2023-03-16T11:32:37.706")
    assert r["message"] is None  # removed
    multi = ok[-1]
    assert multi["level"] == "ERROR"
    assert "\n" not in multi["logmessage"]


def test_grok_multi_pattern_pandas_path(spark, registry):
    """Two grok patterns -> the Arrow-batched pandas UDF path; first
    matching pattern wins (ES contract)."""
    out = run_one(
        spark, registry,
        [{"grok": {"field": "msg",
                   "patterns": ["^ip=%{IP:ip}$", "^host=%{HOSTNAME:host}$"]}}],
        [("ip=10.1.2.3",), ("host=example.com",), ("garbage",)],
        "msg string")
    by_msg = {r["msg"]: r for r in out}
    assert by_msg["ip=10.1.2.3"]["ip"] == "10.1.2.3"
    assert by_msg["ip=10.1.2.3"]["host"] is None
    assert by_msg["host=example.com"]["host"] == "example.com"
    assert "_ingest_pipeline_failure" in (by_msg["garbage"]["tags"] or [])


def test_grok_pattern_definitions(spark, registry):
    out = run_one(
        spark, registry,
        [{"grok": {"field": "msg", "patterns": ["%{TURNREF:turn}"],
                   "pattern_definitions": {"TURNREF": r"turn-\d+"}}}],
        [("see turn-42 above",)], "msg string")
    assert out[0]["turn"] == "turn-42"
