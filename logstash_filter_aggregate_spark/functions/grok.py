"""Grok-style pattern dictionary compiled to regexes (SURVEY.md §2.2 U1).

The reference's docs always pair the aggregate filter with a grok parse
(``docs/index.asciidoc:50-52``: ``%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid}
- %{NOTSPACE:logger} - %{WORD:label}( - %{INT:duration:int})?``). Here a
grok expression compiles to a plain regex with named captures and typed
casts, applied either:

- ``backend="jvm"`` (default): one ``F.regexp_extract`` per capture —
  stays inside whole-stage codegen, no Python in the hot path at all; or
- ``backend="pandas"``: a single Arrow-vectorized pandas UDF doing
  ``Series.str.extract`` once per pattern — one pass over the text, used
  when Python-only regex features are needed.

Both produce identical columns; tests assert equivalence. Rows matching
no pattern get a ``_grokparsefailure`` tag (logstash grok convention)
and NULL captures — they flow through un-extracted (FIXTURES.md
"freeform" kind).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Base pattern dictionary — the public grok core pattern NAMES, each
# re-derived from scratch as a plain regex valid in both the Java and
# Python dialects (no atomic groups, no possessive quantifiers). Composites
# are built by f-string composition below, never by copying a patterns file.
_IPV4 = r"(?:\d{1,3}\.){3}\d{1,3}"
_IPV6 = r"(?:[0-9A-Fa-f]{1,4}:){1,7}(?::|[0-9A-Fa-f]{1,4})(?:%\w+)?|::(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4})*)?"
_HOSTNAME = r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b"
_IPORHOST = rf"(?:{_IPV4}|{_IPV6}|{_HOSTNAME})"
_USERNAME = r"[a-zA-Z0-9._-]+"
_EMAIL = r"[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+(?:\.[a-zA-Z0-9-]+)+"
_MONTH = r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b"
_MONTHDAY = r"(?:0[1-9]|[12]\d|3[01]|[1-9])"
_YEAR = r"\d{2}(?:\d{2})?"
_TIME = r"\d{1,2}:\d{2}(?::\d{2}(?:\.\d+)?)?"
_UNIXPATH = r"(?:/[\w@.,:%+~-]*)+"
_WINPATH = r"(?:[A-Za-z]:|\\)(?:\\[^\\?*\s]*)+"
_PROG = r"[\w._/%-]+"
_DAY = r"\b(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)\b"
_MONTHNUM = r"(?:0?[1-9]|1[0-2])"
_MONTHNUM2 = r"(?:0[1-9]|1[0-2])"
_DATE_US = rf"{_MONTHNUM}[/-](?:0[1-9]|[12]\d|3[01]|[1-9])[/-]{_YEAR}"
_DATE_EU = rf"(?:0[1-9]|[12]\d|3[01]|[1-9])[./-]{_MONTHNUM}[./-]{_YEAR}"
_TZ = r"(?:UTC|GMT|[APMCE][SD]T)"
_ISO8601_TIMEZONE = r"(?:Z|[+-]\d{2}(?::?\d{2})?)"
_TIMESTAMP_ISO8601 = (
    rf"\d{{4}}-{_MONTHNUM2}-(?:0[1-9]|[12]\d|3[01])[T ]"
    rf"(?:2[0123]|[01]\d):(?:[0-5]\d)(?::(?:[0-5]\d|60)(?:\.\d+)?)?{_ISO8601_TIMEZONE}?"
)
_COMMONMAC = r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}"
_WINDOWSMAC = r"(?:[0-9A-Fa-f]{2}-){5}[0-9A-Fa-f]{2}"
_CISCOMAC = r"(?:[0-9A-Fa-f]{4}\.){2}[0-9A-Fa-f]{4}"
_URIPATH = r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_-]*)+"
_URIPARAM = r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*"
_URIPATHPARAM = rf"{_URIPATH}(?:{_URIPARAM})?"

BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "LOGLEVEL": r"(?:ALERT|TRACE|DEBUG|NOTICE|INFO|WARN(?:ING)?|ERR(?:OR)?|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)",
    "USERNAME": _USERNAME,
    "USER": _USERNAME,
    "EMAILADDRESS": _EMAIL,
    "HTTPDUSER": rf"(?:{_EMAIL}|{_USERNAME})",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IP": _IPV4,
    "IPV4": _IPV4,
    "IPV6": _IPV6,
    "HOSTNAME": _HOSTNAME,
    "IPORHOST": _IPORHOST,
    "HOSTPORT": rf"{_IPORHOST}:\d+",
    "MONTH": _MONTH,
    "MONTHDAY": _MONTHDAY,
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "YEAR": _YEAR,
    "TIME": _TIME,
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]\d|60)(?:\.\d+)?",
    # 10/Oct/2000:13:55:36 -0700
    "HTTPDATE": rf"{_MONTHDAY}/{_MONTH}/{_YEAR}:{_TIME} [+-]\d{{4}}",
    # Oct  1 13:55:36
    "SYSLOGTIMESTAMP": rf"{_MONTH} +{_MONTHDAY} {_TIME}",
    "SYSLOGHOST": _IPORHOST,
    "PROG": _PROG,
    "SYSLOGPROG": rf"{_PROG}(?:\[\d+\])?",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "QS": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "UNIXPATH": _UNIXPATH,
    "WINPATH": _WINPATH,
    "PATH": rf"(?:{_UNIXPATH}|{_WINPATH})",
    "TTY": r"/dev/(?:pts|tty[pq]?)\w*",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+.-]+)",
    "URIHOST": rf"{_IPORHOST}(?::\d{{1,5}})?",
    "URIPATH": _URIPATH,
    "URIPARAM": _URIPARAM,
    "URIPATHPARAM": _URIPATHPARAM,
    "URI": rf"[A-Za-z][A-Za-z0-9+.-]+://(?:{_USERNAME}(?::[^@]*)?@)?{_IPORHOST}(?::\d{{1,5}})?(?:{_URIPATHPARAM})?",
    # date/time family
    "DAY": _DAY,
    "MONTHNUM2": _MONTHNUM2,
    "DATE_US": _DATE_US,
    "DATE_EU": _DATE_EU,
    "DATE": rf"(?:{_DATE_US}|{_DATE_EU})",
    "DATESTAMP": rf"(?:{_DATE_US}|{_DATE_EU})[- ]{_TIME}",
    "TZ": _TZ,
    "ISO8601_TIMEZONE": _ISO8601_TIMEZONE,
    "ISO8601_SECOND": r"(?:[0-5]\d|60)(?:\.\d+)?",
    "TIMESTAMP_ISO8601": _TIMESTAMP_ISO8601,
    "DATESTAMP_RFC822": rf"{_DAY} {_MONTH} {_MONTHDAY} {_YEAR} {_TIME} {_TZ}",
    "DATESTAMP_RFC2822": rf"{_DAY}, {_MONTHDAY} {_MONTH} {_YEAR} {_TIME} {_ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": rf"{_DAY} {_MONTH} {_MONTHDAY} {_TIME} {_TZ} {_YEAR}",
    "DATESTAMP_EVENTLOG": rf"\d{{4}}{_MONTHNUM2}(?:0[1-9]|[12]\d|3[01])(?:2[0123]|[01]\d)(?:[0-5]\d)(?:[0-5]\d)",
    "CISCOTIMESTAMP": rf"{_MONTH} +{_MONTHDAY} {_TIME}",
    "HTTPDERROR_DATE": rf"{_DAY} {_MONTH} {_MONTHDAY} {_TIME} {_YEAR}",
    # number / identifier extras
    "BASE16NUM": r"[+-]?(?:0[xX])?[0-9A-Fa-f]+",
    "BASE16FLOAT": r"[+-]?(?:0[xX])?[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?",
    "EMAILLOCALPART": r"[a-zA-Z0-9_.+-]+",
    # MAC addresses
    "COMMONMAC": _COMMONMAC,
    "WINDOWSMAC": _WINDOWSMAC,
    "CISCOMAC": _CISCOMAC,
    "MAC": rf"(?:{_CISCOMAC}|{_WINDOWSMAC}|{_COMMONMAC})",
    # syslog / java extras
    "SYSLOGFACILITY": r"<\d+(?:\.\d+)?>",
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"[A-Za-z0-9_. -]+",
    "JAVAMETHOD": r"(?:<(?:cl)?init>|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    # base-dictionary completion (the remaining public base-file names)
    # upstream grok-patterns BOOLEAN is fully case-insensitive
    # ((?i)true|false); scoped (?i:...) works in both regex dialects
    "BOOLEAN": r"(?i:true|false)",
    "URN": r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:(?:%[0-9A-Fa-f]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+",
    # java family long tail
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor\d+)",
    "JAVALOGMESSAGE": r".*",
    "JAVASTACKTRACEPART": (
        r"\s+at (?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*"
        r"\.(?:<(?:cl)?init>|[a-zA-Z$_][a-zA-Z$_0-9]*)\([A-Za-z0-9_. -]+(?::\d+)?\)"
    ),
    "CATALINA_DATESTAMP": rf"{_MONTH} {_MONTHDAY}, \d{{4}} \d{{1,2}}:[0-5]\d:[0-5]\d (?:AM|PM)",
    "TOMCAT_DATESTAMP": (
        rf"\d{{4}}-{_MONTHNUM2}-(?:0[1-9]|[12]\d|3[01]) "
        rf"(?:2[0123]|[01]\d):[0-5]\d:[0-5]\d(?:[.,]\d+)? {_ISO8601_TIMEZONE}"
    ),
    # syslog RFC5424 pieces + cron / ruby / nagios odds and ends
    "SYSLOG5424PRI": r"<\d{1,5}>",
    "SYSLOG5424SD": r"(?:\[.*?\]+|-)",
    "CRON_ACTION": r"[A-Z ]+",
    "RUBY_LOGLEVEL": r"(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "NAGIOSTIME": r"\[\d+\]",
}

# Composite grok EXPRESSIONS (with capture semantics) for the classic
# access-log formats — pass to compile_grok as the pattern argument.
COMMONAPACHELOG_GROK = (
    r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
    r'\[%{HTTPDATE:timestamp}\] "%{WORD:verb} %{NOTSPACE:request}'
    r'(?: HTTP/%{NUMBER:httpversion})?" %{NUMBER:response:int} (?:%{NUMBER:bytes:int}|-)'
)
COMBINEDAPACHELOG_GROK = (
    COMMONAPACHELOG_GROK + r' %{QS:referrer} %{QS:agent}'
)
SYSLOGBASE_GROK = (
    r'%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?'
    r'%{SYSLOGHOST:logsource} %{SYSLOGPROG:program}:'
)

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

_TYPE_MAP: dict[str, T.DataType] = {
    "int": T.LongType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
}


@dataclass(frozen=True)
class CompiledGrok:
    """A grok expression compiled to one regex with ordered named captures.

    Group names inside ``regex`` are sanitized to ``[A-Za-z][A-Za-z0-9]*``
    (Java named-group rules, stricter than Python's); ``alias`` maps the
    sanitized name back to the user's capture name.
    """

    name: str
    regex: str                      # named-group regex (valid for both Java and Python)
    captures: tuple[str, ...]       # capture names in group order
    types: dict[str, T.DataType]    # capture -> Spark type
    group_index: dict[str, int]     # capture -> 1-based regex group index
    alias: dict[str, str]           # sanitized group name -> capture name
    anchored: bool = True           # ^...$ wrapped (single-pass extraction eligible)


def compile_grok(
    name: str,
    pattern: str,
    anchored: bool = True,
    extra_patterns: dict[str, str] | None = None,
) -> CompiledGrok:
    """Expand ``%{SYNTAX:semantic:type}`` references into named groups.

    Unnamed references (``%{LOGLEVEL}``) expand to non-capturing groups.
    Literal text between references is regex-escaped only if it is not
    already regex (we treat the pattern text outside ``%{}`` as regex,
    matching grok semantics — e.g. ``( - %{INT:duration:int})?``).
    ``extra_patterns`` adds/overrides base-dictionary entries, like
    logstash's ``patterns_dir`` custom pattern files; entries may
    themselves reference other patterns (one level of recursion per pass,
    resolved to a fixpoint).
    """
    if extra_patterns:
        dictionary = dict(BASE_PATTERNS, **extra_patterns)
        # resolve %{REF} inside custom definitions (unnamed only)
        for _ in range(5):
            changed = False
            for k, v in dictionary.items():
                def _res(m: re.Match[str]) -> str:
                    base = dictionary.get(m.group(1))
                    if base is None:
                        raise KeyError(f"unknown grok base pattern %{{{m.group(1)}}}")
                    return f"(?:{base})"
                nv = re.sub(r"%\{(\w+)\}", _res, v)
                if nv != v:
                    dictionary[k], changed = nv, True
            if not changed:
                break
    else:
        dictionary = BASE_PATTERNS
    captures: list[str] = []
    types: dict[str, T.DataType] = {}
    alias: dict[str, str] = {}

    def _sanitize(semantic: str) -> str:
        # Java group names must be [A-Za-z][A-Za-z0-9]* (no underscore).
        s = re.sub(r"[^A-Za-z0-9]", "", semantic) or "g"
        if not s[0].isalpha():
            s = "g" + s
        base_s = s
        i = 0
        while s in alias:
            i += 1
            s = f"{base_s}{i}"
        return s

    def _sub(m: re.Match[str]) -> str:
        syntax, semantic, typ = m.group(1), m.group(2), m.group(3)
        base = dictionary.get(syntax)
        if base is None:
            raise KeyError(f"unknown grok base pattern %{{{syntax}}}")
        if semantic is None:
            return f"(?:{base})"
        if semantic in types:
            raise ValueError(f"duplicate capture name {semantic!r} in grok {name!r}")
        captures.append(semantic)
        types[semantic] = _TYPE_MAP.get(typ or "string", T.StringType())
        g = _sanitize(semantic)
        alias[g] = semantic
        return f"(?<{g}>{base})"

    regex = _GROK_REF.sub(_sub, pattern)
    if anchored:
        regex = f"^{regex}$"
    # Group indexes: count '(' that open capturing groups, in order,
    # exactly as the Java engine will — skipping escaped \( and ( inside
    # character classes, and (?: (?= (?! (?<= (?<! non-capturing opens.
    group_index: dict[str, int] = {}
    idx = 0
    i, n, in_class = 0, len(regex), False
    while i < n:
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            rest = regex[i + 1 : i + 4]
            named = re.match(r"\?<(\w+)>", regex[i + 1 :])
            if named:
                idx += 1
                group_index[alias[named.group(1)]] = idx
            elif not rest.startswith("?"):
                idx += 1  # plain user-written capturing group
            # (?:…) (?=…) (?!…) (?<=…) (?<!…) open no group
        i += 1
    return CompiledGrok(
        name=name, regex=regex, captures=tuple(captures), types=types,
        group_index=group_index, alias=alias, anchored=anchored,
    )


def _cast(col: Column, dtype: T.DataType) -> Column:
    return col.cast(dtype) if not isinstance(dtype, T.StringType) else col


def _group_indices(regex: str) -> tuple[int, dict[str, int]]:
    """Total capturing-group count and named-group -> 1-based index for a
    regex, counted exactly as the Java engine numbers them (same scanner
    as compile_grok: skips escapes, character classes, and (?: (?= (?!
    (?<= (?<! non-capturing opens)."""
    named: dict[str, int] = {}
    idx = 0
    i, n, in_class = 0, len(regex), False
    while i < n:
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            m = re.match(r"\?<(\w+)>", regex[i + 1 :])
            if m:
                idx += 1
                named[m.group(1)] = idx
            elif not regex[i + 1 : i + 2] == "?":
                idx += 1
        i += 1
    return idx, named


def _combined_alternation(groks: list[CompiledGrok]):
    """Compile the whole first-match-wins pattern LIST into ONE anchored
    alternation regex, so matching + extraction for every pattern run in
    a single regex execution per row (the engine stops at the first
    matching branch — grok break_on_match for free). Returns
    ``(combined_regex, total_groups, wrapper_idx[i], cap_idx[(i, cap)])``
    or ``None`` when ineligible:

    - every pattern must be anchored (the single-pass replace+split is
      only sound anchored — see apply_grok_jvm);
    - no pattern may match the empty string (a matched branch is then
      detected by its wrapper group equalling the full line, which the
      empty match would make ambiguous with "no match").

    Branch wrapper groups are named ``w<i>``; pattern-local named groups
    are uniquified with a ``q<i>`` prefix (Java requires unique names in
    one regex). Alternation order = list order, and Java alternation
    prefers the leftmost matching branch, which is exactly
    break_on_match."""
    if len(groks) < 2 or not all(g.anchored for g in groks):
        return None
    bodies: list[str] = []
    for pi, g in enumerate(groks):
        body = g.regex[1:-1]  # strip the ^...$ wrap
        if re.search(r"\\\d|\\k<", body):
            return None  # backreferences would renumber — per-pattern path
        py = re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", body)
        try:
            if re.fullmatch(py, "") is not None:
                return None
        except re.error:
            return None
        bodies.append(re.sub(r"\(\?<([A-Za-z])", rf"(?<q{pi}\1", body))
    combined = "^(?:" + "|".join(f"(?<w{pi}>{b})" for pi, b in enumerate(bodies)) + ")$"
    total, named = _group_indices(combined)
    wrapper_idx: list[int] = []
    cap_idx: dict[tuple[int, str], int] = {}
    for pi, g in enumerate(groks):
        if f"w{pi}" not in named:
            return None  # name mangling failed — use the per-pattern path
        wrapper_idx.append(named[f"w{pi}"])
        for sanitized, cap in g.alias.items():
            key = f"q{pi}{sanitized}"
            if key not in named:
                return None
            cap_idx[(pi, cap)] = named[key]
    return combined, total, wrapper_idx, cap_idx


def _all_caps_typed(groks: list[CompiledGrok]) -> dict[str, T.DataType]:
    all_caps: dict[str, T.DataType] = {}
    for g in groks:
        for c in g.captures:
            prev = all_caps.get(c)
            if prev is not None and prev != g.types[c]:
                raise ValueError(f"capture {c!r} has conflicting types across patterns")
            all_caps.setdefault(c, g.types[c])
    return all_caps


def _apply_grok_jvm_combined(
    df: DataFrame, text_col: str, groks: list[CompiledGrok], comb
) -> DataFrame:
    """Single-regex-run fast path for an anchored multi-pattern list: one
    ``regexp_replace`` over the combined alternation rewrites the row into
    a ``\\x01``-joined list of EVERY pattern's capture groups (the engine
    stops at the first matching branch, so a row costs only the failed
    prefixes plus its winner — vs. the per-pattern path's P ``rlike``
    full runs PLUS a winner re-run). Then:

    - match detection: the split count equals the combined group count
      (a no-match replace returns the input line unchanged);
    - winner: the branch whose wrapper slot equals the whole line
      (non-winning branch groups substitute ``''``; a pathological
      non-matching line containing exactly the right number of ``\\x01``
      bytes can never have a split PIECE equal to the WHOLE line, so it
      safely reads as no-match);
    - rows whose captured values legitimately contain ``\\x01`` (split
      count disagrees) fall back to per-capture ``regexp_extract`` +
      ``rlike`` winner flags, evaluated lazily only on those rows.

    '' captures become true NULLs (``nullif``), covering both empty
    optional groups and unmatched branches — identical to the
    per-pattern path; tests pin equivalence on all three backends."""
    regex, total, wrapper_idx, cap_idx = comb
    DELIM = "\x01"
    text = F.col(text_col)
    rep = DELIM.join(f"${i}" for i in range(1, total + 1))
    # shuffle() on a 1-element array: the same optimizer barrier as the
    # per-pattern path (see apply_grok_jvm) — without it the expensive
    # extraction is inlined into every downstream consumer
    ca_expr = F.element_at(
        F.shuffle(F.array(F.split(F.regexp_replace(text, regex, rep), DELIM, -1))), 1
    )
    df = df.select("*", ca_expr.alias("_ca"))
    ca = F.col("_ca")
    clean = F.size(ca) == F.lit(total)

    winner_cols: list[Column] = []
    no_earlier: Column = F.lit(True)
    for pi, g in enumerate(groks):
        fallback = text.rlike(g.regex) & no_earlier
        no_earlier = no_earlier & ~text.rlike(g.regex)
        winner_cols.append(
            F.when(clean, F.element_at(ca, wrapper_idx[pi]) == text)
            .otherwise(fallback)
            .alias(f"_w_{g.name}")
        )
    df = df.select("*", *winner_cols)

    all_caps = _all_caps_typed(groks)
    cap_cols: list[Column] = []
    for cap, dtype in all_caps.items():
        expr: Column = F.lit(None).cast(dtype)
        for pi in reversed(range(len(groks))):  # earlier patterns win
            g = groks[pi]
            if cap not in g.captures:
                continue
            raw = F.when(clean, F.element_at(ca, cap_idx[(pi, cap)])).otherwise(
                F.regexp_extract(text, g.regex, g.group_index[cap])
            )
            val = _cast(F.nullif(raw, F.lit("")), dtype)
            expr = F.when(F.col(f"_w_{g.name}"), val).otherwise(expr)
        cap_cols.append(expr.alias(cap))

    matched_name = F.lit(None).cast(T.StringType())
    for g in reversed(groks):
        matched_name = F.when(F.col(f"_w_{g.name}"), F.lit(g.name)).otherwise(matched_name)

    return df.select(
        *[c for c in df.columns if not c.startswith("_w_") and c != "_ca"],
        *cap_cols,
        matched_name.alias("grok_pattern"),
        F.when(matched_name.isNull(), F.array(F.lit("_grokparsefailure")))
        .otherwise(F.array().cast(T.ArrayType(T.StringType())))
        .alias("parse_tags"),
    )


def apply_grok_jvm(df: DataFrame, text_col: str, groks: list[CompiledGrok]) -> DataFrame:
    """First-match-wins over the pattern list; all captures become columns.

    JVM-side, zero Python, whole-stage codegen throughout. The winning
    pattern's groups are all extracted in a SINGLE regex execution: an
    anchored ``regexp_replace`` rewrites the matched line into a
    ``\\x01``-joined list of its capture groups (``$1..$N`` Java
    back-references — unmatched optional groups substitute ''), then one
    ``split`` + ``element_at`` per capture. That is 1 regex run per row
    for extraction instead of one ``regexp_extract`` (= one full match)
    per capture — on the canonical 5-capture task pattern the parse
    stage drops from ~8 to ~4 regex executions per row.

    Captures are gated behind winner flags (``rlike`` match minus any
    earlier pattern's match — grok break_on_match), so only the winning
    pattern pays its replace. '' captures become true NULLs (``nullif``),
    covering both empty optional groups and no-match. If a matched line
    legitimately contains the \\x01 delimiter byte inside a captured
    value, the split count disagrees with the group count and that row
    falls back to per-capture ``regexp_extract`` — correct on any input,
    fast on the 100%-of-real-logs path.
    """
    comb = _combined_alternation(groks)
    if comb is not None:
        # anchored multi-pattern list: one combined-alternation regex run
        # per row replaces P rlikes + a winner replace (guide §1.2 "per-
        # task work"); ineligible lists (unanchored, empty-matchable,
        # backreferences) keep the per-pattern path below
        return _apply_grok_jvm_combined(df, text_col, groks, comb)

    DELIM = "\x01"
    text = F.col(text_col)
    match_flags = [text.rlike(g.regex).alias(f"_m_{g.name}") for g in groks]

    # winner flag per pattern: matched AND no earlier pattern matched
    winner_flags: list[Column] = []
    no_earlier: Column = F.lit(True)
    for g in groks:
        winner_flags.append((F.col(f"_m_{g.name}") & no_earlier).alias(f"_w_{g.name}"))
        no_earlier = no_earlier & ~F.col(f"_m_{g.name}")

    # highest named-group index per pattern (groups past it are never read)
    max_idx = {g.name: (max(g.group_index.values()) if g.group_index else 0) for g in groks}
    arr_cols: list[Column] = []
    for g in groks:
        # the replace+split single pass is only sound for ANCHORED groks:
        # an unanchored mid-string match would glue the unmatched prefix/
        # suffix onto the first/last capture without changing the split
        # count, so the fallback check could not detect it — unanchored
        # patterns use per-capture regexp_extract (correct for substrings)
        if max_idx[g.name] == 0 or not g.anchored:
            continue
        rep = DELIM.join(f"${i}" for i in range(1, max_idx[g.name] + 1))
        # shuffle() on a 1-element array is a semantic identity but is
        # marked non-deterministic, so Catalyst's CollapseProject /
        # predicate pushdown do NOT inline this expensive extraction into
        # every downstream consumer (observed without the barrier: 51
        # textual copies of the regexp_replace in the executed correlation
        # plan, tripling the stage — the whole point of the single-pass
        # extraction is ONE regex run per row; a plain rand()>-1 guard gets
        # constant-folded away). Retries recompute identical values.
        extracted = F.when(
            F.col(f"_w_{g.name}"),
            F.split(F.regexp_replace(text, g.regex, rep), DELIM, -1),
        )
        arr_cols.append(
            F.element_at(F.shuffle(F.array(extracted)), 1).alias(f"_a_{g.name}")
        )

    df = df.select("*", *match_flags)
    df = df.select("*", *winner_flags, *arr_cols)

    all_caps: dict[str, T.DataType] = {}
    for g in groks:
        for c in g.captures:
            prev = all_caps.get(c)
            if prev is not None and prev != g.types[c]:
                raise ValueError(f"capture {c!r} has conflicting types across patterns")
            all_caps.setdefault(c, g.types[c])

    cap_cols: list[Column] = []
    for cap, dtype in all_caps.items():
        expr: Column = F.lit(None).cast(dtype)
        # reversed: earlier patterns win (grok break_on_match)
        for g in reversed(groks):
            if cap not in g.captures:
                continue
            idx = g.group_index[cap]
            if g.anchored:
                arr = F.col(f"_a_{g.name}")
                raw = F.when(
                    F.size(arr) == max_idx[g.name], F.element_at(arr, idx)
                ).otherwise(F.regexp_extract(text, g.regex, idx))
            else:
                raw = F.regexp_extract(text, g.regex, idx)
            val = _cast(F.nullif(raw, F.lit("")), dtype)
            expr = F.when(F.col(f"_w_{g.name}"), val).otherwise(expr)
        cap_cols.append(expr.alias(cap))

    matched_name = F.lit(None).cast(T.StringType())
    for g in reversed(groks):
        matched_name = F.when(F.col(f"_m_{g.name}"), F.lit(g.name)).otherwise(matched_name)

    out = df.select(
        *[c for c in df.columns if not c.startswith(("_m_", "_w_", "_a_"))],
        *cap_cols,
        matched_name.alias("grok_pattern"),
        F.when(matched_name.isNull(), F.array(F.lit("_grokparsefailure")))
        .otherwise(F.array().cast(T.ArrayType(T.StringType())))
        .alias("parse_tags"),
    )
    return out


def apply_grok_pandas(df: DataFrame, text_col: str, groks: list[CompiledGrok]) -> DataFrame:
    """Same semantics via one Arrow-vectorized pandas UDF returning a
    struct of all captures + matched pattern name — a single pass over
    the text per pattern (``Series.str.extract``), never per-row Python.
    """
    all_caps: dict[str, T.DataType] = {}
    for g in groks:
        for c in g.captures:
            all_caps.setdefault(c, g.types[c])
    fields = [T.StructField(c, dt, True) for c, dt in all_caps.items()]
    fields.append(T.StructField("grok_pattern", T.StringType(), True))
    out_type = T.StructType(fields)
    # pre-serialize for closure capture
    # Java uses (?<name>...), Python (?P<name>...) — translate (leaving
    # lookbehinds (?<= / (?<! untouched).
    compiled = [
        (g.name, re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", g.regex), list(g.captures),
         dict(g.alias), {c: all_caps[c].simpleString() for c in g.captures})
        for g in groks
    ]

    @pandas_udf(out_type)
    def grok_extract(texts: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(index=texts.index)
        for cap in all_caps:
            out[cap] = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        out["grok_pattern"] = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        unmatched = pd.Series(True, index=texts.index)
        for name, rx, caps, alias_map, cap_types in compiled:
            if not unmatched.any():
                break
            sub = texts[unmatched]
            hit = sub.str.match(rx, na=False)
            hit_idx = sub.index[hit]
            ext = sub.str.extract(rx, expand=True).rename(columns=alias_map) if caps else None
            for cap in caps:
                vals = ext.loc[hit_idx, cap]
                tname = cap_types[cap]
                if tname in ("bigint", "int"):
                    vals = pd.to_numeric(vals, errors="coerce").astype("Int64")
                elif tname == "double":
                    vals = pd.to_numeric(vals, errors="coerce")
                out.loc[hit_idx, cap] = vals
            out.loc[hit_idx, "grok_pattern"] = name
            unmatched.loc[hit_idx] = False
        # normalize numeric dtypes for Arrow
        for cap, dt in all_caps.items():
            if isinstance(dt, T.LongType):
                out[cap] = pd.to_numeric(out[cap], errors="coerce").astype("Int64")
            elif isinstance(dt, T.DoubleType):
                out[cap] = pd.to_numeric(out[cap], errors="coerce").astype("float64")
        return out

    struct = grok_extract(F.col(text_col)).alias("_grok")
    df = df.select("*", struct)
    caps = [F.col(f"_grok.{c}").alias(c) for c in all_caps]
    out = df.select(
        *[c for c in df.columns if c != "_grok"],
        *caps,
        F.col("_grok.grok_pattern").alias("grok_pattern"),
        F.when(F.col("_grok.grok_pattern").isNull(), F.array(F.lit("_grokparsefailure")))
        .otherwise(F.array().cast(T.ArrayType(T.StringType())))
        .alias("parse_tags"),
    )
    return out
