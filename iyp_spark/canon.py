"""Property canonicalization — the single source of truth for key formatting.

Reference: ``format_properties`` (iyp/__init__.py:18-60) canonicalizes every
property before it hits the graph: ASN → int, IP/prefix → ``.compressed``
form, country code → upper. Because our node ids are ``xxhash64(label, key)``
(no Neo4j elementId), canonicalization MUST happen before id computation —
identically in every crawler — so it lives here and nowhere else.

All heavy lifting is vectorized: ``ipaddress`` runs inside Arrow pandas UDFs
(series → series, no per-row Python in the plan: shows as ArrowEvalPython,
never BatchEvalPython); cheap canon (trim/upper/cast) is native Catalyst.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def compress_prefix(s: pd.Series) -> pd.Series:
    """Normalize a CIDR prefix to compressed form; None if malformed.

    Ref: ip_network(x).compressed with invalid-row skip
    (iyp/crawlers/bgpkit/pfx2asn.py:33-37, iyp/__init__.py:21-22).
    """

    def one(x):
        if x is None:
            return None
        try:
            return ipaddress.ip_network(x.strip()).compressed
        except ValueError:
            return None

    return s.map(one)


@F.pandas_udf(T.StringType())
def compress_ip(s: pd.Series) -> pd.Series:
    """Normalize an IP address to compressed form; None if malformed.

    Ref: ip_address(x).compressed (iyp/crawlers/openintel/__init__.py:295-303).
    """

    def one(x):
        if x is None:
            return None
        try:
            return ipaddress.ip_address(x.strip()).compressed
        except ValueError:
            return None

    return s.map(one)


@F.pandas_udf(T.StringType())
def compress_global_ip(s: pd.Series) -> pd.Series:
    """Compressed form of a *globally routable* IP; None if malformed or
    non-global (private/link-local/multicast...).

    Ref: the OONI resolver/DNS-answer filters —
    iyp/crawlers/ooni/__init__.py:80-85 (resolver_ip.is_global) and
    :196-210 (answer ip.is_global).
    """

    def one(x):
        if x is None:
            return None
        try:
            ip = ipaddress.ip_address(x.strip())
            return ip.compressed if ip.is_global else None
        except ValueError:
            return None

    return s.map(one)


@F.pandas_udf(T.ArrayType(T.StringType()))
def decompose_range_to_cidrs(start: pd.Series, count: pd.Series) -> pd.Series:
    """IPv4 (start, address-count) range → list of covering CIDR prefixes.

    Ref: lowest-set-bit + log2 decomposition in
    iyp/crawlers/nro/delegated_stats.py:27-53 and
    summarize_address_range in iyp/crawlers/ipinfo/ip_country.py:43-48.
    """

    def one(s, n):
        if s is None or n is None:
            return None
        try:
            first = ipaddress.ip_address(s)
            last = first + int(n) - 1
            return [
                net.compressed
                for net in ipaddress.summarize_address_range(first, last)
            ]
        except ValueError:
            return None

    return pd.Series([one(s, n) for s, n in zip(start, count)])


@F.pandas_udf(T.ArrayType(T.StringType()))
def summarize_range(start_ip: pd.Series, end_ip: pd.Series) -> pd.Series:
    """(first IP, last IP) inclusive range → covering CIDR list — the
    summarize_address_range in iyp/crawlers/ipinfo/ip_country.py:43-48.
    v4 and v6; invalid / crossed bounds → null."""

    def one(s, e):
        if s is None or e is None:
            return None
        try:
            return [
                net.compressed
                for net in ipaddress.summarize_address_range(
                    ipaddress.ip_address(s), ipaddress.ip_address(e)
                )
            ]
        except ValueError:
            return None

    return pd.Series([one(s, e) for s, e in zip(start_ip, end_ip)])


@F.pandas_udf(T.StructType([
    T.StructField("start", T.StringType(), True),
    T.StructField("end", T.StringType(), True),
    T.StructField("prefixlen", T.IntegerType(), True),
    T.StructField("af", T.IntegerType(), True),
]))
def prefix_bounds(s: pd.Series) -> pd.DataFrame:
    """CIDR prefix → fixed-width hex [start, end] bounds for interval/LPM
    joins: 8 hex chars for v4, 32 for v6, so lexicographic string compare
    equals numeric compare within an address family.

    Replaces the reference's radix tree (iyp/post/ip2prefix.py:37-72). Hex
    strings instead of decimal(38,0): 128-bit IPv6 integers need 39 decimal
    digits, one more than Spark/Arrow's max decimal precision — fe80::,
    ff00::/8 or ::/0 end bounds would overflow decimal(38,0) at runtime.
    """
    starts, ends, lens, afs = [], [], [], []
    for x in s:
        try:
            net = ipaddress.ip_network(x)
            w = 8 if net.version == 4 else 32
            starts.append(format(int(net.network_address), f"0{w}x"))
            ends.append(format(int(net.broadcast_address), f"0{w}x"))
            lens.append(net.prefixlen)
            afs.append(net.version)
        except (ValueError, TypeError):
            starts.append(None), ends.append(None), lens.append(None), afs.append(None)
    return pd.DataFrame({"start": starts, "end": ends, "prefixlen": lens, "af": afs})


@F.pandas_udf(T.StringType())
def ip_to_hex(s: pd.Series) -> pd.Series:
    """IP string → fixed-width hex (LPM join probes; width matches
    prefix_bounds so string compare is numeric compare)."""

    def one(x):
        try:
            ip = ipaddress.ip_address(x)
            return format(int(ip), "08x" if ip.version == 4 else "032x")
        except (ValueError, TypeError):
            return None

    return s.map(one)


# ISO 3166-1 alpha-2 assigned codes (public standard). The reference
# validates countries with the iso3166 package (peeringdb/org.py:74,
# ooni/__init__.py:92-97); here it is a broadcast-joined literal dimension.
ISO3166_ALPHA2 = set("""
AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE BF BG BH BI BJ BL
BM BN BO BQ BR BS BT BV BW BY BZ CA CC CD CF CG CH CI CK CL CM CN CO CR CU CV
CW CX CY CZ DE DJ DK DM DO DZ EC EE EG EH ER ES ET FI FJ FK FM FO FR GA GB GD
GE GF GG GH GI GL GM GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU ID IE IL IM
IN IO IQ IR IS IT JE JM JO JP KE KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK
LR LS LT LU LV LY MA MC MD ME MF MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW
MX MY MZ NA NC NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR
PS PT PW PY QA RE RO RS RU RW SA SB SC SD SE SG SH SI SJ SK SL SM SN SO SR SS
ST SV SX SY SZ TC TD TF TG TH TJ TK TL TM TN TO TR TT TV TW TZ UA UG UM US UY
UZ VA VC VE VG VI VN VU WF WS YE YT ZA ZM ZW
""".split())


def is_valid_cc(col: Column) -> Column:
    return col.isin(sorted(ISO3166_ALPHA2))


def canon_cc(col: Column) -> Column:
    """Country code → upper (ref iyp/__init__.py:24)."""
    return F.upper(F.trim(col))


def canon_asn(col: Column) -> Column:
    """ASN → long, tolerating an 'AS' prefix (ref iyp/__init__.py:18-25,
    removeprefix('AS') in ripe/roa.py:70, bgptools/tags.py:83)."""
    return F.regexp_replace(F.trim(col.cast("string")), r"^[aA][sS]", "").try_cast("long")


def strip_root_dot(col: Column) -> Column:
    """DNS name minus trailing root dot, lower-cased
    (ref openintel/__init__.py:279-282,461-464)."""
    return F.lower(F.regexp_replace(F.trim(col), r"\.$", ""))


def af_of_key(col: Column) -> Column:
    """Address family from textual IP/prefix: ':' → 6 else '.' → 4.

    Ref: post/address_family.py:14-27 (Cypher CONTAINS ':').
    """
    return (
        F.when(col.contains(":"), F.lit(6))
        .when(col.contains("."), F.lit(4))
        .otherwise(F.lit(None).cast("int"))
    )


def parse_rfc3339_nano(col: Column) -> Column:
    """RFC3339 timestamp with VARIABLE-precision fractional seconds (the
    Go-style nanosecond stamps Alice-LG emits, which datetime.fromisoformat
    rejects) → timestamp, null when malformed.

    Ref: the pad-or-truncate-to-6-digits fixup in
    iyp/crawlers/alice_lg/__init__.py:213-238 — pure column expressions:
    normalize Z→+00:00, split off the fraction, right-pad/truncate it to
    microseconds, and try_to_timestamp. A stamp with a fraction but no
    timezone suffix fails the extract and yields null (the reference
    raises + warns there); a tz-LESS stamp WITHOUT a fraction parses as
    UTC — the reference's datetime.fromisoformat accepts that naive form
    (its fixup only rejects missing-tz when a fraction is present)."""
    norm = F.regexp_replace(F.trim(col), "Z$", "+00:00")
    pat = r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(\d+))?([+-]\d{2}:\d{2})?$"
    base = F.regexp_extract(norm, pat, 1)
    frac = F.regexp_extract(norm, pat, 2)
    tz = F.regexp_extract(norm, pat, 3)
    fixed = F.concat(
        base, F.lit("."), F.rpad(F.substring(frac, 1, 6), 6, "0"),
        F.when(tz != "", tz).otherwise(F.lit("+00:00")),
    )
    return F.when(
        (base != "") & ((tz != "") | (frac == "")),
        F.try_to_timestamp(fixed, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
    )


def parse_http_last_modified(col: Column) -> Column:
    """HTTP Last-Modified header (RFC 7231 IMF-fixdate,
    'Mon, 15 Aug 2022 10:00:00 GMT') → timestamp, null when malformed —
    the P9 residual: ref iyp/__init__.py:93-107
    (set_modification_time_from_last_modified_header, strptime
    '%a, %d %b %Y %H:%M:%S %Z'; all HTTP dates are UTC per RFC 2616
    §3.3.1, so the zone token is validated then discarded)."""
    pat = r"^\w{3}, (\d{2} \w{3} \d{4} \d{2}:\d{2}:\d{2}) (GMT|UTC)$"
    base = F.regexp_extract(F.trim(col), pat, 1)
    return F.when(
        base != "",
        F.try_to_timestamp(base, F.lit("dd MMM yyyy HH:mm:ss")),
    )


def node_id(label: Column | str, key: Column) -> Column:
    """Deterministic node id: xxhash64(primary label, canonical key).

    Replaces Neo4j elementId (SURVEY.md §1.1) — cluster-safe, no id service.
    """
    lab = F.lit(label) if isinstance(label, str) else label
    return F.xxhash64(lab, key.cast("string"))
