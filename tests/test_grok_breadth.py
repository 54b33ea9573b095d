"""Grok dictionary breadth (VERDICT r2 item 6): every BASE_PATTERNS name
must (a) appear with a sample line here, (b) compile through
``compile_grok`` in both regex dialects, and (c) round-trip its sample —
Python ``fullmatch`` AND a JVM ``regexp_extract`` recover the sample
exactly. A parity list pins coverage of the full public base grok
pattern-file name set (the names every logstash-core user can assume).
"""

import re

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.functions.grok import BASE_PATTERNS, compile_grok

# one full-match sample line per dictionary name
SAMPLES: dict[str, str] = {
    "WORD": "hello",
    "NOTSPACE": "a-b/c:9",
    "SPACE": " ",
    "DATA": "abc def",
    "GREEDYDATA": "a b c - anything",
    "INT": "-42",
    "NUMBER": "3.14",
    "BASE10NUM": ".5",
    "POSINT": "7",
    "NONNEGINT": "0",
    "LOGLEVEL": "WARNING",
    "USERNAME": "john.doe-1",
    "USER": "svc_user",
    "EMAILLOCALPART": "john_doe+tag",
    "EMAILADDRESS": "a.b@ex-ample.co.uk",
    "HTTPDUSER": "a@b.com",
    "UUID": "123e4567-e89b-12d3-a456-426614174000",
    "IP": "192.168.0.1",
    "IPV4": "10.0.0.255",
    "IPV6": "2001:0db8:0000:0000:0000:0000:0000:0001",
    "HOSTNAME": "example.com",
    "IPORHOST": "sub.example.com",
    "HOSTPORT": "example.com:8080",
    "MONTH": "Oct",
    "MONTHDAY": "31",
    "MONTHNUM": "12",
    "MONTHNUM2": "09",
    "YEAR": "2026",
    "DAY": "Tue",
    "TIME": "13:55:36.123",
    "HOUR": "23",
    "MINUTE": "59",
    "SECOND": "60.5",
    "HTTPDATE": "10/Oct/2000:13:55:36 -0700",
    "SYSLOGTIMESTAMP": "Oct  1 13:55:36",
    "SYSLOGHOST": "host1.example.com",
    "PROG": "sshd",
    "SYSLOGPROG": "sshd[123]",
    "QUOTEDSTRING": '"hi there"',
    "QS": "'x y'",
    "UNIXPATH": "/var/log/syslog",
    "WINPATH": "C:\\Users\\test\\file.txt",
    "PATH": "/usr/bin/env",
    "TTY": "/dev/tty0",
    "URIPROTO": "https",
    "URIHOST": "example.com:443",
    "URIPATH": "/a/b.c",
    "URIPARAM": "?k=v&x=1",
    "URIPATHPARAM": "/a?b=1",
    "URI": "https://user@example.com:8080/path",
    "DATE_US": "10/31/2026",
    "DATE_EU": "31.10.2026",
    "DATE": "10/31/2026",
    "DATESTAMP": "10/31/2026 13:55",
    "TZ": "UTC",
    "ISO8601_TIMEZONE": "+02:00",
    "ISO8601_SECOND": "59.9",
    "TIMESTAMP_ISO8601": "2026-08-17T00:30:01.123Z",
    "DATESTAMP_RFC822": "Tue Aug 17 2026 13:55:36 UTC",
    "DATESTAMP_RFC2822": "Tue, 17 Aug 2026 13:55:36 +02:00",
    "DATESTAMP_OTHER": "Tue Aug 17 13:55:36 UTC 2026",
    "DATESTAMP_EVENTLOG": "20260817135536",
    "CISCOTIMESTAMP": "Aug 17 13:55:36",
    "HTTPDERROR_DATE": "Tue Aug 17 13:55:36 2026",
    "BASE16NUM": "0xDEADbeef",
    "BASE16FLOAT": "0x1A.F",
    "COMMONMAC": "aa:bb:cc:dd:ee:ff",
    "WINDOWSMAC": "aa-bb-cc-dd-ee-ff",
    "CISCOMAC": "aabb.ccdd.eeff",
    "MAC": "aa:bb:cc:dd:ee:ff",
    "SYSLOGFACILITY": "<13.2>",
    "JAVACLASS": "org.example.Foo",
    "JAVAFILE": "Foo.java",
    "JAVAMETHOD": "<init>",
    "BOOLEAN": "true",
    "URN": "urn:isbn:0451450523",
    "JAVATHREAD": "XX-Processor12",
    "JAVALOGMESSAGE": "something failed badly",
    "JAVASTACKTRACEPART": "    at org.example.Foo.bar(Foo.java:42)",
    "CATALINA_DATESTAMP": "Aug 17, 2026 1:55:36 PM",
    "TOMCAT_DATESTAMP": "2026-08-17 13:55:36,123 +0200",
    "SYSLOG5424PRI": "<34>",
    "SYSLOG5424SD": "[exampleSDID@32473]",
    "CRON_ACTION": "CMD",
    "RUBY_LOGLEVEL": "FATAL",
    "NAGIOSTIME": "[1234567890]",
}

# the complete name set of the public BASE grok pattern file — the core
# dictionary every grok user can assume; BASE_PATTERNS must cover it all
PUBLIC_BASE_FILE_NAMES = {
    "USERNAME", "USER", "EMAILLOCALPART", "EMAILADDRESS", "HTTPDUSER",
    "INT", "BASE10NUM", "NUMBER", "BASE16NUM", "BASE16FLOAT",
    "POSINT", "NONNEGINT", "WORD", "NOTSPACE", "SPACE", "DATA",
    "GREEDYDATA", "QUOTEDSTRING", "QS", "BOOLEAN", "UUID", "URN",
    "MAC", "CISCOMAC", "WINDOWSMAC", "COMMONMAC",
    "IP", "IPV4", "IPV6", "IPORHOST", "HOSTNAME", "HOSTPORT",
    "PATH", "UNIXPATH", "WINPATH", "TTY",
    "URIPROTO", "URIHOST", "URIPATH", "URIPARAM", "URIPATHPARAM", "URI",
    "MONTH", "MONTHNUM", "MONTHNUM2", "MONTHDAY", "DAY", "YEAR",
    "HOUR", "MINUTE", "SECOND", "TIME",
    "DATE_US", "DATE_EU", "ISO8601_TIMEZONE", "ISO8601_SECOND",
    "TIMESTAMP_ISO8601", "DATE", "DATESTAMP", "TZ",
    "DATESTAMP_RFC822", "DATESTAMP_RFC2822", "DATESTAMP_OTHER",
    "DATESTAMP_EVENTLOG", "HTTPDERROR_DATE",
    "SYSLOGTIMESTAMP", "PROG", "SYSLOGPROG", "SYSLOGHOST",
    "SYSLOGFACILITY", "HTTPDATE", "LOGLEVEL",
}


def test_public_base_file_parity():
    missing = PUBLIC_BASE_FILE_NAMES - set(BASE_PATTERNS)
    assert not missing, f"base grok names missing from the dictionary: {sorted(missing)}"


def test_every_name_has_a_sample():
    missing = set(BASE_PATTERNS) - set(SAMPLES)
    assert not missing, f"dictionary names without a breadth sample: {sorted(missing)}"


def _python_dialect(java_regex: str) -> str:
    # (?<name>…) -> (?P<name>…); lookbehinds (?<= (?<! are untouched
    return re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", java_regex)


@pytest.mark.parametrize("name", sorted(SAMPLES))
def test_name_compiles_and_fullmatches_python(name):
    g = compile_grok(name.lower(), f"%{{{name}:x}}")
    rx = re.compile(_python_dialect(g.regex))  # g.regex is ^…$-anchored
    m = rx.match(SAMPLES[name])
    assert m is not None, (name, g.regex, SAMPLES[name])
    assert m.group(0) == SAMPLES[name], (name, m.group(0))


def test_all_names_roundtrip_jvm(spark):
    # ONE job: every pattern extracted from its sample via the Java
    # regex engine; each must recover the sample exactly
    cols = []
    for name, sample in sorted(SAMPLES.items()):
        g = compile_grok(name.lower(), f"%{{{name}:x}}")
        cols.append(
            F.regexp_extract(F.lit(sample), g.regex, g.group_index["x"]).alias(name)
        )
    row = spark.range(1).select(*cols).first()
    bad = {n: row[n] for n in SAMPLES if row[n] != SAMPLES[n]}
    assert not bad, bad
