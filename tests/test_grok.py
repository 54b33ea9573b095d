"""Grok compilation + parse backends (U1; docs/index.asciidoc:50-52,165)."""

import pandas as pd
import pytest

from logstash_filter_aggregate_spark.functions.grok import (
    apply_grok_jvm,
    apply_grok_pandas,
    compile_grok,
)
from logstash_filter_aggregate_spark.plans.pipeline import DEFAULT_GROKS, compile_groks
from tests.conftest import make_transcript

TASK_PATTERN = r"%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid} - %{NOTSPACE:logger} - %{WORD:label}( - %{INT:duration:int})?"


def test_compile_typed_and_optional_captures():
    g = compile_grok("task", TASK_PATTERN)
    assert g.captures == ("loglevel", "taskid", "logger", "label", "duration")
    assert g.types["duration"].simpleString() == "bigint"
    # optional literal group shifts indices: duration is group 6 not 5
    assert g.group_index["duration"] == 6


def test_unknown_base_pattern():
    with pytest.raises(KeyError):
        compile_grok("bad", "%{NOPE:x}")


def test_duplicate_capture():
    with pytest.raises(ValueError, match="duplicate"):
        compile_grok("dup", "%{WORD:a} %{WORD:a}")


ROWS = [
    (0, "INFO - 12345 - TASK_START - start", 0),
    (1, "INFO - 12345 - SQL - sqlQuery1 - 12", 1),
    (2, "INFO - 12345 - Clicked One", 2),
    (3, "ERROR - 12345 - TOOL - http - E503", 3),
    (4, "freeform chatter", 4),
]


@pytest.mark.parametrize("backend", ["jvm", "pandas"])
def test_parse_captures(spark, backend):
    df = make_transcript(spark, ROWS)
    groks = compile_groks()
    fn = apply_grok_jvm if backend == "jvm" else apply_grok_pandas
    out = {r.turn_idx: r for r in fn(df, "text", groks).collect()}
    assert out[0].logger == "TASK_START" and out[0].duration is None
    assert out[1].duration == 12 and out[1].grok_pattern == "task"
    assert out[2].click_target == "One" and out[2].grok_pattern == "click"
    assert out[3].err_code == 503 and out[3].err_tool == "http"
    assert out[4].grok_pattern is None and out[4].parse_tags == ["_grokparsefailure"]


def test_backends_agree(spark):
    df = make_transcript(spark, ROWS)
    groks = compile_groks()
    a = apply_grok_jvm(df, "text", groks).orderBy("turn_idx").toPandas()
    b = apply_grok_pandas(df, "text", groks).orderBy("turn_idx").toPandas()[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_default_dictionary_order_specific_first():
    names = [n for n, _ in DEFAULT_GROKS]
    assert names.index("click") < names.index("task")
    assert names.index("error") < names.index("task")


def test_custom_pattern_dictionary(spark):
    # logstash patterns_dir analog: custom entries may reference others
    g = compile_grok(
        "sess", "%{SESSIONID:sid} %{WORD:verb}",
        extra_patterns={"SESSIONID": r"S-%{INT}-%{WORD}"},
    )
    df = make_transcript(spark, [(0, "S-42-abc GET", 0)])
    from logstash_filter_aggregate_spark.functions.grok import apply_grok_jvm
    r = apply_grok_jvm(df, "text", [g]).first()
    assert r.sid == "S-42-abc" and r.verb == "GET"


SAMPLE_LINES = {
    "HOSTNAME": ("%{HOSTNAME:h}", "api-01.prod.example.com", "h", "api-01.prod.example.com"),
    "IPORHOST_ip": ("%{IPORHOST:h}", "10.0.42.1", "h", "10.0.42.1"),
    "IPV6": ("%{IPV6:h}", "2001:db8:0:1:1:1:1:1", "h", "2001:db8:0:1:1:1:1:1"),
    "HTTPDATE": (r"\[%{HTTPDATE:t}\]", "[10/Oct/2000:13:55:36 -0700]", "t", "10/Oct/2000:13:55:36 -0700"),
    "SYSLOGTIMESTAMP": ("%{SYSLOGTIMESTAMP:t} x", "Oct  1 13:55:36 x", "t", "Oct  1 13:55:36"),
    "QS": ("%{QS:q}", '"hello \\"quoted\\" world"', "q", '"hello \\"quoted\\" world"'),
    "UNIXPATH": ("%{PATH:p} end", "/var/log/app-1.2/x.log end", "p", "/var/log/app-1.2/x.log"),
    "URIPATH": ("%{URIPATH:p}", "/a/b_c/d-1", "p", "/a/b_c/d-1"),
    "EMAILADDRESS": ("%{EMAILADDRESS:e}", "dev.ops+x@mail.example.org", "e", "dev.ops+x@mail.example.org"),
    "SYSLOGPROG": ("%{SYSLOGPROG:p}: y", "sshd[4123]: y", "p", "sshd[4123]"),
    "TIMESTAMP_ISO8601": ("%{TIMESTAMP_ISO8601:t} x", "2024-03-07T09:15:02.250+01:00 x", "t", "2024-03-07T09:15:02.250+01:00"),
    "DATESTAMP": ("%{DATESTAMP:t}", "03/07/2024 09:15:02", "t", "03/07/2024 09:15:02"),
    "DATE_EU": ("%{DATE_EU:d}", "7.3.2024", "d", "7.3.2024"),
    "DATESTAMP_RFC2822": ("%{DATESTAMP_RFC2822:t}", "Thu, 07 Mar 2024 09:15:02 +0000", "t", "Thu, 07 Mar 2024 09:15:02 +0000"),
    "DATESTAMP_EVENTLOG": ("%{DATESTAMP_EVENTLOG:t}", "20240307091502", "t", "20240307091502"),
    "MAC_common": ("%{MAC:m}", "aa:bb:cc:00:11:22", "m", "aa:bb:cc:00:11:22"),
    "MAC_cisco": ("%{MAC:m}", "aabb.cc00.1122", "m", "aabb.cc00.1122"),
    "URI": ("%{URI:u}", "https://user@api.example.com:8443/v1/items?id=3&x=y", "u", "https://user@api.example.com:8443/v1/items?id=3&x=y"),
    "BASE16NUM": ("addr=%{BASE16NUM:a}", "addr=0xDEADbeef", "a", "0xDEADbeef"),
    "SYSLOGFACILITY": ("%{SYSLOGFACILITY:f}x", "<13.2>x", "f", "<13.2>"),
    "JAVACLASS": ("at %{JAVACLASS:c}\\.%{JAVAMETHOD:m}\\(%{JAVAFILE:f}:%{INT:l:int}\\)", "at org.example.Foo$Bar.run(Foo.java:42)", "c", "org.example.Foo$Bar"),
}


@pytest.mark.parametrize("case", sorted(SAMPLE_LINES))
def test_core_pattern_breadth(spark, case):
    pattern, line, cap, expect = SAMPLE_LINES[case]
    g = compile_grok(case, pattern)
    df = make_transcript(spark, [(0, line, 0)])
    r = apply_grok_jvm(df, "text", [g]).first()
    assert r.parse_tags == []
    assert getattr(r, cap) == expect


def test_group_index_counting_matches_python_re():
    # the JVM path addresses groups by NUMBER ($N back-references and the
    # extract fallback), so compile_grok's group-index counter must agree
    # with the regex engine exactly — including escaped \( literals, (
    # inside character classes, plain user groups, and lookarounds
    import re as _re

    g = compile_grok(
        "tricky",
        r"\(%{WORD:a}\) [()x]+ (?=u)(u(?:v)?)%{INT:b:int}(?<!y) %{WORD:c}",
        anchored=False,
    )
    compiled = _re.compile(g.regex.replace("(?<", "(?P<").replace("(?P<=", "(?<=").replace("(?P<!", "(?<!"))
    # python's numbering of the named groups must equal ours
    py_index = {g.alias[name]: idx for name, idx in compiled.groupindex.items()}
    assert py_index == g.group_index
    m = compiled.search("(hello) ()x uv42 world")
    assert m and m.group(g.group_index["a"]) == "hello"
    assert m.group(g.group_index["b"]) == "42"
    assert m.group(g.group_index["c"]) == "world"


def test_unanchored_grok_mid_string_match_extracts_correctly(spark):
    # an UNANCHORED grok matching mid-string must not take the single-pass
    # replace+split path: a single mid-string replace would glue the
    # unmatched prefix/suffix onto the first/last groups without changing
    # the split count (undetectable by the size check)
    g = compile_grok("kv", r"%{WORD:k}=%{INT:v:int}", anchored=False)
    df = make_transcript(spark, [(0, "x k=5 y", 0)])
    r = apply_grok_jvm(df, "text", [g]).first()
    assert r.parse_tags == []
    assert r.k == "k" and r.v == 5


def test_delimiter_byte_in_captured_value_falls_back(spark):
    # the single-pass replace+split extraction joins groups on \x01; a
    # matched line CONTAINING \x01 inside a capture must still extract
    # correctly via the per-capture regexp_extract fallback
    g = compile_grok("kv", r"%{WORD:k}=%{GREEDYDATA:v}")
    df = make_transcript(spark, [(0, "key=a\x01b\x01c", 0), (1, "key2=plain", 0)])
    rows = {r.k: r.v for r in apply_grok_jvm(df, "text", [g]).collect()}
    assert rows == {"key": "a\x01b\x01c", "key2": "plain"}


def test_every_base_pattern_compiles_both_dialects():
    # every dictionary entry must be valid in BOTH regex dialects the two
    # backends use: Python re (pandas backend) and, structurally, Java —
    # approximated by rejecting Python-only constructs ((?P<, (?#, \A..)
    import re as _re

    from logstash_filter_aggregate_spark.functions.grok import BASE_PATTERNS

    for name, rx in BASE_PATTERNS.items():
        _re.compile(rx)  # python dialect
        assert "(?P<" not in rx and "(?#" not in rx, name


def test_syslogbase_composite(spark):
    from logstash_filter_aggregate_spark.functions.grok import SYSLOGBASE_GROK

    g = compile_grok("syslog", SYSLOGBASE_GROK + " %{GREEDYDATA:msg}")
    df = make_transcript(
        spark, [(0, "Oct  1 13:55:36 web-01.example.com sshd[4123]: accepted", 0)]
    )
    r = apply_grok_jvm(df, "text", [g]).first()
    assert r.parse_tags == []
    assert r.timestamp == "Oct  1 13:55:36"
    assert r.logsource == "web-01.example.com"
    assert r.program == "sshd[4123]"
    assert r.msg == "accepted"


def test_common_apache_log_composite(spark):
    from logstash_filter_aggregate_spark.functions.grok import COMBINEDAPACHELOG_GROK

    line = (
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"'
    )
    g = compile_grok("combined", COMBINEDAPACHELOG_GROK)
    df = make_transcript(spark, [(0, line, 0)])
    r = apply_grok_jvm(df, "text", [g]).first()
    assert r.clientip == "127.0.0.1" and r.auth == "frank"
    assert r.verb == "GET" and r.request == "/apache_pb.gif"
    assert r.response == 200 and r.bytes == 2326
    assert r.referrer == '"http://www.example.com/start.html"'
    # pandas backend parses the same line identically
    p = apply_grok_pandas(df, "text", [g]).first()
    assert (p.clientip, p.verb, p.response, p.bytes) == (r.clientip, r.verb, r.response, r.bytes)


def test_combined_alternation_equivalence(spark):
    """The single-regex-run combined path (multi-pattern anchored lists)
    must match the per-pattern path and the pandas backend row for row,
    including the fallback rows (delimiter byte in a capture, empty text,
    NULL text, no-match with many delimiter bytes)."""
    from logstash_filter_aggregate_spark.functions import grok as G

    groks = compile_groks()
    assert G._combined_alternation(groks) is not None
    rows = [
        (0, "INFO - t1 - TASK_START - begin", 0),
        (1, "INFO - t1 - SQL - query - 42", 0),
        (2, "WARN - t2 - TOOL - bash - E17", 0),
        (3, "INFO - u9 - Clicked checkout", 0),
        (4, "garbage line", 0),
        (5, "", 0),
        (6, None, 0),
        (7, "INFO - t\x013 - SQL - q - 1", 0),   # delimiter inside taskid
        (8, "INFO - t1 - SQL - query", 0),        # optional capture absent
        (9, "\x01\x01" * 20, 0),                  # many delimiters, no match
    ]
    df = make_transcript(spark, rows)
    combined = apply_grok_jvm(df, "text", groks).toPandas().sort_values("turn_idx")
    orig = G._combined_alternation
    G._combined_alternation = lambda g: None
    try:
        legacy = apply_grok_jvm(df, "text", groks).toPandas().sort_values("turn_idx")
    finally:
        G._combined_alternation = orig
    pandas_b = apply_grok_pandas(df, "text", groks).toPandas().sort_values("turn_idx")

    def canon(d):
        d = d[sorted(d.columns)]
        return [tuple(str(v) for v in r) for r in d.itertuples(index=False)]

    assert canon(combined) == canon(legacy)
    assert canon(combined) == canon(pandas_b)


def test_combined_alternation_ineligible_lists():
    """Unanchored patterns, empty-matchable patterns and backreferences
    must decline the combined path (they fall back per-pattern)."""
    from logstash_filter_aggregate_spark.functions import grok as G

    anchored = compile_grok("a", r"%{INT:x}")
    unanchored = compile_grok("u", r"%{INT:y}", anchored=False)
    empty_ok = compile_grok("e", r"%{DATA:z}")  # matches ""
    assert G._combined_alternation([anchored]) is None          # single pattern
    assert G._combined_alternation([anchored, unanchored]) is None
    assert G._combined_alternation([anchored, empty_ok]) is None
    assert G._combined_alternation([anchored, compile_grok("b", r"%{WORD:w}")]) is not None
