"""Network / URL / hashing processors: bytes, urldecode, uri_parts,
html_strip, user_agent, network_direction, registered_domain, community_id,
fingerprint.  All pure JVM Column expressions — including community_id's
packed-tuple SHA-1, built from hex-string assembly + unhex + sha1.

Reference contracts (spec/integration/elastic_integration_spec.rb):
bytes :154-175, urldecode :960-981, uri_parts :932-958, html_strip :496-517,
user_agent :983-1006, network_direction :616-638, registered_domain
:668-693, community_id :177-199, fingerprint :393-414.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from ..plans.document import fcol, field_type, guarded
from .common import str_targets

# ---------------------------------------------------------------- bytes ----
_BYTES_UNITS = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3,
                "tb": 1024**4, "pb": 1024**5}


def p_bytes(df, spec, ctx):
    cfg = spec.config
    f_name = cfg["field"]
    dst = cfg.get("target_field", f_name)
    active = ctx.active(df, spec)
    if f_name not in df.columns:
        if not cfg.get("ignore_missing", False):
            df = ctx.fail(df, active, spec,
                          f"field [{f_name}] not present as part of path [{f_name}]")
        return df
    src = F.trim(fcol(f_name).cast("string"))
    num = F.regexp_extract(src, r"(?i)^([0-9]*\.?[0-9]+)\s*(b|kb|mb|gb|tb|pb)?$", 1)
    unit = F.lower(F.regexp_extract(src, r"(?i)^([0-9]*\.?[0-9]+)\s*(b|kb|mb|gb|tb|pb)?$", 2))
    mult = F.coalesce(
        F.element_at(F.create_map(
            *[x for k, v in _BYTES_UNITS.items() for x in (F.lit(k), F.lit(v))]), unit),
        F.lit(1))
    value = (num.try_cast("double") * mult).cast("long")
    df = ctx.fail(df, active & src.isNotNull() & value.isNull(), spec,
                  f"failed to parse setting [{f_name}] with value [?] as a size in bytes")
    return guarded(df, active & value.isNotNull(), {dst: value})


# ------------------------------------------------------------ urldecode ----
def p_urldecode(df, spec, ctx):
    return str_targets(df, spec, ctx, F.url_decode)


# ------------------------------------------------------------ uri_parts ----
def p_uri_parts(df, spec, ctx):
    cfg = spec.config
    f_name = cfg["field"]
    target = cfg.get("target_field", "url")
    active = ctx.active(df, spec)
    if f_name not in df.columns:
        if not cfg.get("ignore_missing", False):
            df = ctx.fail(df, active, spec,
                          f"field [{f_name}] not present as part of path [{f_name}]")
        return df
    src = fcol(f_name).cast("string")
    userinfo = F.parse_url(src, F.lit("USERINFO"))
    authority = F.parse_url(src, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1).try_cast("int")
    path = F.parse_url(src, F.lit("PATH"))
    updates = {
        f"{target}.scheme": F.lower(F.parse_url(src, F.lit("PROTOCOL"))),
        f"{target}.domain": F.parse_url(src, F.lit("HOST")),
        f"{target}.port": port,
        f"{target}.path": path,
        f"{target}.query": F.parse_url(src, F.lit("QUERY")),
        f"{target}.fragment": F.parse_url(src, F.lit("REF")),
        f"{target}.user_info": userinfo,
        f"{target}.username": F.regexp_extract(userinfo, r"^([^:]*)", 1),
        f"{target}.password": F.regexp_extract(userinfo, r":(.*)$", 1),
        f"{target}.extension": F.regexp_extract(path, r"\.([^./]+)$", 1),
    }
    if cfg.get("keep_original", True):
        updates[f"{target}.original"] = src
    ok = F.parse_url(src, F.lit("HOST")).isNotNull()
    df = ctx.fail(df, active & src.isNotNull() & ~ok, spec,
                  f"unable to parse URI [{f_name}]")
    df = guarded(df, active & ok, updates)
    if cfg.get("remove_if_successful", False) and f_name not in (target,):
        df = guarded(df, active & ok,
                     {f_name: F.lit(None).cast(field_type(df, f_name))})
    return df


# ------------------------------------------------------------ html_strip ---
_BLOCK_TAGS = ("h1|h2|h3|h4|h5|h6|p|div|br|hr|li|ul|ol|table|tr|td|th|"
               "blockquote|pre|section|article|header|footer")


def p_html_strip(df, spec, ctx):
    """Lucene HTMLStripCharFilter semantics (golden :496-517):
    block-level tags become \\n, inline tags are removed outright —
    '<p> <em> x </em> </p>' -> '\\n  x  \\n'."""
    def fn(c):
        c = F.regexp_replace(c, r"(?i)</?(?:" + _BLOCK_TAGS + r")\b[^>]*>", "\n")
        return F.regexp_replace(c, r"<[^>]*>", "")
    return str_targets(df, spec, ctx, fn)


# ------------------------------------------------------------ user_agent ---
# Curated subset of the public ua-parser core regexes (uap-core, public
# domain data): enough for mainstream browsers/bots; unknown -> "Other"
# (mirrors the ES processor's default-regex behavior at a reduced vocab —
# our transcript tool/agent vocabulary is bounded).
_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/(\d+)\.(\d+)\.?(\d+)?"),
    ("Chrome Mobile", r"CriOS/(\d+)\.(\d+)\.(\d+)"),
    ("Chrome", r"Chrome/(\d+)\.(\d+)\.(\d+)(?:\.(\d+))?"),
    ("Firefox", r"Firefox/(\d+)\.(\d+)(?:\.(\d+))?"),
    ("Safari", r"Version/(\d+)\.(\d+)(?:\.(\d+))? .*Safari/"),
    ("IE", r"MSIE (\d+)\.(\d+)"),
    ("curl", r"curl/(\d+)\.(\d+)\.?(\d+)?"),
    ("Python Requests", r"python-requests/(\d+)\.(\d+)"),
    ("Googlebot", r"Googlebot/(\d+)\.(\d+)"),
]
_UA_OS = [
    ("Mac OS X", r"Mac OS X (\d+)[_.](\d+)(?:[_.](\d+))?"),
    ("iOS", r"iPhone OS (\d+)_(\d+)"),
    ("Android", r"Android (\d+)\.?(\d+)?"),
    ("Windows", r"Windows NT (\d+)\.(\d+)"),
    ("Linux", r"Linux"),
]


def p_user_agent(df, spec, ctx):
    cfg = spec.config
    f_name = cfg["field"]
    target = cfg.get("target_field", "user_agent")
    active = ctx.active(df, spec)
    if f_name not in df.columns:
        if not cfg.get("ignore_missing", False):
            df = ctx.fail(df, active, spec,
                          f"field [{f_name}] not present as part of path [{f_name}]")
        return df
    ua = fcol(f_name).cast("string")

    name = F.lit("Other")
    version = F.lit(None).cast("string")
    for bname, rx in reversed(_UA_BROWSERS):
        hit = ua.rlike(rx)
        n_groups = rx.count("(") - rx.count("(?:")
        ver_parts = [F.regexp_extract(ua, rx, i)
                     for i in range(1, n_groups + 1)]
        ver = F.concat_ws(".", *[F.when(p != "", p) for p in ver_parts])
        name = F.when(hit, F.lit(bname)).otherwise(name)
        version = F.when(hit, ver).otherwise(version)

    os_name = F.lit("Other")
    os_version = F.lit(None).cast("string")
    for oname, rx in reversed(_UA_OS):
        hit = ua.rlike(rx)
        ver_parts = [F.regexp_extract(ua, rx, i) for i in (1, 2)] if "(" in rx else []
        ver = (F.concat_ws(".", *[F.when(p != "", p) for p in ver_parts])
               if ver_parts else F.lit(None).cast("string"))
        os_name = F.when(hit, F.lit(oname)).otherwise(os_name)
        os_version = F.when(hit, ver).otherwise(os_version)

    device = (F.when(ua.rlike(r"iPhone"), "iPhone")
              .when(ua.rlike(r"iPad"), "iPad")
              .when(ua.rlike(r"Macintosh"), "Mac")
              .when(ua.rlike(r"Android"), "Generic Smartphone")
              .when(ua.rlike(r"(?i)bot|spider|crawler"), "Spider")
              .otherwise("Other"))
    updates = {
        f"{target}.name": name,
        f"{target}.version": version,
        f"{target}.os.name": os_name,
        f"{target}.os.version": os_version,
        f"{target}.os.full": F.when(os_version.isNotNull(),
                                    F.concat(os_name, F.lit(" "), os_version))
                              .otherwise(os_name),
        f"{target}.device.name": device,
        f"{target}.original": ua,
    }
    return guarded(df, active & ua.isNotNull(), updates)


# ----------------------------------------------------- network_direction ---
_NAMED_RANGES = {
    "private": [("10.0.0.0", 8), ("172.16.0.0", 12), ("192.168.0.0", 16)],
    "loopback": [("127.0.0.0", 8)],
    "link_local_unicast": [("169.254.0.0", 16)],
    "multicast": [("224.0.0.0", 4)],
    "unspecified": [("0.0.0.0", 32)],
}


def _ip4_to_long(col: Column) -> Column:
    oct_ = F.split(col, r"\.")
    return (oct_[0].cast("long") * 16777216 + oct_[1].cast("long") * 65536
            + oct_[2].cast("long") * 256 + oct_[3].cast("long"))


def _ip4_literal(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def _in_cidrs(ip_long: Column, cidrs: list[tuple[str, int]]) -> Column:
    cond = F.lit(False)
    for net, prefix in cidrs:
        mask = ((1 << 32) - 1) ^ ((1 << (32 - prefix)) - 1)
        cond = cond | (ip_long.bitwiseAND(F.lit(mask)) == (_ip4_literal(net) & mask))
    return cond


def p_network_direction(df, spec, ctx):
    cfg = spec.config
    networks = cfg.get("internal_networks", [])
    src_f = cfg.get("source_ip", "source.ip")
    dst_f = cfg.get("destination_ip", "destination.ip")
    target = cfg.get("target_field", "network.direction")
    active = ctx.active(df, spec)
    cidrs: list[tuple[str, int]] = []
    for n in networks:
        if n in _NAMED_RANGES:
            cidrs.extend(_NAMED_RANGES[n])
        elif "/" in n:
            net, p = n.split("/")
            cidrs.append((net, int(p)))
        else:
            cidrs.append((n, 32))
    src = fcol(src_f).cast("string") if src_f in df.columns else F.lit(None).cast("string")
    dst = fcol(dst_f).cast("string") if dst_f in df.columns else F.lit(None).cast("string")
    src_in = _in_cidrs(_ip4_to_long(src), cidrs)
    dst_in = _in_cidrs(_ip4_to_long(dst), cidrs)
    direction = (F.when(src_in & dst_in, "internal")
                 .when(src_in, "outbound")
                 .when(dst_in, "inbound")
                 .otherwise("external"))
    ok = src.isNotNull() & dst.isNotNull()
    if not cfg.get("ignore_missing", True):
        df = ctx.fail(df, active & ~ok, spec, "missing source/destination ip")
    return guarded(df, active & ok, {target: direction})


# ---------------------------------------------------- registered_domain ----
# Compact public-suffix set (subset of the public PSL) — when-chain, longest
# suffix first; bounded vocab keeps this JVM-side.
_PUBLIC_SUFFIXES = [
    "ac.uk", "co.uk", "gov.uk", "org.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "dev", "app",
    "co", "ai", "uk", "de", "fr", "jp", "cn", "au", "br", "in", "nl", "se",
    "no", "es", "it", "ru", "ch", "at", "be", "dk", "fi", "pl", "nz", "za",
    "mx", "ar", "tv", "me", "cc", "us", "ca", "eu", "info", "biz", "name",
]


def p_registered_domain(df, spec, ctx):
    cfg = spec.config
    f_name = cfg["field"]
    target = cfg.get("target_field", "")
    tprefix = f"{target}." if target else ""
    active = ctx.active(df, spec)
    if f_name not in df.columns:
        if not cfg.get("ignore_missing", False):
            df = ctx.fail(df, active, spec,
                          f"field [{f_name}] not present as part of path [{f_name}]")
        return df
    domain_expr = F.lower(fcol(f_name).cast("string"))
    # coalesce (not a nested when-chain: that copies the tree exponentially)
    # longest-suffix-first over the bounded PSL subset
    df = df.withColumn("__rd_domain", domain_expr)
    domain = fcol("__rd_domain")
    tld_expr = F.coalesce(*[
        F.when(domain.endswith("." + sfx) | (domain == sfx), F.lit(sfx))
        for sfx in sorted(_PUBLIC_SUFFIXES, key=lambda s: (-s.count("."), s))])
    df = df.withColumn("__rd_tld", tld_expr)
    tld = fcol("__rd_tld")
    stem = domain.substr(F.lit(1), F.length(domain) - F.length(tld) - F.lit(1))
    last_label = F.element_at(F.split(stem, r"\."), -1)
    registered_expr = F.when(tld.isNotNull() & (F.length(stem) > 0),
                             F.concat(last_label, F.lit("."), tld))
    df = df.withColumn("__rd_reg", registered_expr)
    registered = fcol("__rd_reg")
    subdomain = F.when(
        registered.isNotNull() & (F.length(domain) > F.length(registered)),
        domain.substr(F.lit(1),
                      F.length(domain) - F.length(registered) - F.lit(1)))
    updates = {
        f"{tprefix}domain": domain,
        f"{tprefix}registered_domain": registered,
        f"{tprefix}top_level_domain": tld,
        f"{tprefix}subdomain": subdomain,
    }
    df = guarded(df, active & domain.isNotNull() & tld.isNotNull(), updates)
    return df.drop("__rd_domain", "__rd_tld", "__rd_reg")


# -------------------------------------------------------- community_id -----
_PROTO_NUM = {"icmp": 1, "igmp": 2, "tcp": 6, "udp": 17, "gre": 47,
              "icmpv6": 58, "sctp": 132}


def _ip4_hex(col: Column) -> Column:
    """dotted-quad -> 8 hex chars (4 bytes)."""
    oct_ = F.split(col, r"\.")
    return F.concat(*[F.lpad(F.hex(oct_[i].cast("int")), 2, "0") for i in range(4)])


def _port_hex(col: Column) -> Column:
    return F.lpad(F.hex(col.cast("int")), 4, "0")


def p_community_id(df, spec, ctx):
    """RFC draft Community ID flow hash: seed(2B) + src_ip + dst_ip +
    proto(1B) + pad(1B) + src_port(2B) + dst_port(2B), tuple-ordered, SHA-1,
    base64, prefixed '1:'.  Assembled as a hex string and hashed JVM-side
    via unhex+sha1 — no UDF."""
    cfg = spec.config
    seed = int(cfg.get("seed", 0))
    target = cfg.get("target_field", "network.community_id")
    active = ctx.active(df, spec)

    def col_or_null(name):
        return fcol(name).cast("string") if name in df.columns else F.lit(None).cast("string")

    src_ip = col_or_null(cfg.get("source_ip", "source.ip"))
    dst_ip = col_or_null(cfg.get("destination_ip", "destination.ip"))
    src_port = col_or_null(cfg.get("source_port", "source.port")).cast("int")
    dst_port = col_or_null(cfg.get("destination_port", "destination.port")).cast("int")
    transport = F.lower(col_or_null(cfg.get("transport", "network.transport")))
    proto = F.element_at(
        F.create_map(*[x for k, v in _PROTO_NUM.items()
                       for x in (F.lit(k), F.lit(v))]), transport)

    # canonical ordering: smaller (ip, port) endpoint first
    src_long = _ip4_to_long(src_ip)
    dst_long = _ip4_to_long(dst_ip)
    flip = (src_long > dst_long) | ((src_long == dst_long) & (src_port > dst_port))
    ip1 = F.when(flip, dst_ip).otherwise(src_ip)
    ip2 = F.when(flip, src_ip).otherwise(dst_ip)
    p1 = F.when(flip, dst_port).otherwise(src_port)
    p2 = F.when(flip, src_port).otherwise(dst_port)

    hexstr = F.concat(
        F.lit(f"{seed:04x}"),
        _ip4_hex(ip1), _ip4_hex(ip2),
        F.lpad(F.hex(proto), 2, "0"), F.lit("00"),
        _port_hex(p1), _port_hex(p2))
    # sha1 returns hex; unhex back to raw bytes before base64
    cid = F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(F.unhex(hexstr)))))
    ok = (src_ip.isNotNull() & dst_ip.isNotNull() & proto.isNotNull()
          & src_port.isNotNull() & dst_port.isNotNull())
    df = ctx.fail(df, active & ~ok, spec,
                  "unable to compute community id: missing required fields")
    return guarded(df, active & ok, {target: cid})


# ---------------------------------------------------------- fingerprint ----
_FP_METHODS = {"MD5": F.md5, "SHA-1": F.sha1,
               "SHA-256": lambda c: F.sha2(c, 256),
               "SHA-512": lambda c: F.sha2(c, 512)}


def p_fingerprint(df, spec, ctx):
    """Stable hash of selected fields (reference golden :393-414).

    KNOWN GAP: ES's exact canonical byte serialization of nested values is
    not reproduced (its byte format isn't observable from the reference
    repo); we define an explicit canonical form instead — fields sorted,
    each contributing ``name|value`` with struct/map/array values rendered
    via to_json — and hash that.  Deterministic, collision-safe, documented.
    """
    cfg = spec.config
    fields = sorted(cfg["fields"])
    target = cfg.get("target_field", "fingerprint")
    method = cfg.get("method", "SHA-1")
    salt = cfg.get("salt", "")
    active = ctx.active(df, spec)
    parts: list[Column] = [F.lit(salt)] if salt else []
    present = F.lit(False)
    for f_name in fields:
        dt = field_type(df, f_name)
        if dt is None:
            continue
        col = fcol(f_name)
        present = present | col.isNotNull()
        if isinstance(dt, (T.StructType, T.MapType, T.ArrayType)):
            rendered = F.to_json(col)
        else:
            rendered = col.cast("string")
        parts.append(F.concat_ws("|", F.lit(f_name), F.coalesce(rendered, F.lit(""))))
    if not parts:
        if not cfg.get("ignore_missing", False):
            return ctx.fail(df, active, spec, "no fields to fingerprint")
        return df
    canonical = F.concat_ws("\x00", *parts)
    hex_hash = _FP_METHODS[method](canonical)
    value = F.base64(F.unhex(hex_hash))
    return guarded(df, active & present, {target: value})
