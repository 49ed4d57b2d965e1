"""URL structure analysis + canonicalization over web-crawl tables.

The corpus key column is `url` (BASELINE.json input_hint); these are
the standard first-pass operators over it: split a URL into its
structural parts (scheme/host/port/registrable domain/subdomain/tld/
path depth/query arity) for per-site accounting and crawl-frontier
policies, and canonicalize URLs so url-level dedup keys on the page,
not on byte noise (default ports, fragments, query-param order).

Everything is pure built-in expressions (regexp_extract /
substring_index / array ops — whole-stage codegen, zero shuffle,
scan-speed at 10^12 rows) and deliberately avoids java.net.URI
(`F.parse_url`): hand-rolled RFC-3986-shaped regexes behave
identically in a second engine, which is what makes the operators
SQL-oracle-checkable, and they never throw on the malformed URLs a
real crawl is full of — unparseable parts come back null/empty.

Registrable-domain note: the real rule is the Public Suffix List
(publicsuffix.org); embedding the full PSL (~10k rules) is out of
scope, so `_MULTI_SUFFIXES` is a documented snapshot of the most
common two-label suffixes and the rule is: host's last TWO labels if
their join is not in the set, last THREE if it is.  Swap the set for
the full PSL (broadcast) in production without touching the plan
shape.

Reference parity: no counterpart — the C# library has no analysis
layer; this extends the engine's webtext mission (north_star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Snapshot sample of two-label public suffixes (see module docstring).
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "co.za", "com.mx", "com.ar", "com.tr",
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80,
                  "wss": 443}


def _parts(url: Column) -> dict[str, Column]:
    """Shared decomposition: scheme, host, port, path, query, fragment.
    Accepts any absolute URL; parts that don't parse are ''/null."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host_port = F.substring_index(auth, "@", -1)          # strip userinfo
    host = F.lower(F.substring_index(host_port, ":", 1))
    port_s = F.regexp_extract(host_port, r":(\d+)$", 1)
    port = F.when(port_s != "", port_s.cast("int"))       # else null
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    nofrag = F.substring_index(url, "#", 1)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    frag = F.when(url.contains("#"),
                  F.substring_index(url, "#", -1))
    return {"scheme": scheme, "host": host, "port": port, "path": path,
            "query": query, "frag": frag}


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds scheme, host, port (int, null when absent),
    registered_domain, subdomain, tld, path_depth (non-empty path
    segments), n_params (query k=v terms), has_fragment."""
    url = F.col(url_col)
    p = _parts(url)
    labels = F.split(p["host"], r"\.")
    nl = F.size(labels)
    suffix2 = F.when(nl >= 2, F.concat(F.element_at(labels, -2),
                                       F.lit("."),
                                       F.element_at(labels, -1)))
    is_multi = F.coalesce(
        suffix2.isin(*_MULTI_SUFFIXES), F.lit(False))
    reg_n = F.when(is_multi, 3).otherwise(2)   # labels in the reg domain
    reg = F.when(nl <= reg_n, p["host"]).otherwise(
        F.array_join(F.slice(labels, nl - reg_n + 1, reg_n), "."))
    sub = F.when(nl > reg_n,
                 F.array_join(F.slice(labels, 1, nl - reg_n), ".")
                 ).otherwise(F.lit(""))
    path_depth = F.size(F.filter(F.split(p["path"], "/"),
                                 lambda s: s != ""))
    n_params = F.size(F.filter(F.split(p["query"], "&"),
                               lambda s: s != ""))
    return (df
            .withColumn("scheme", p["scheme"])
            .withColumn("host", p["host"])
            .withColumn("port", p["port"])
            .withColumn("registered_domain", reg)
            .withColumn("subdomain", sub)
            .withColumn("tld", F.element_at(labels, -1))
            .withColumn("path_depth", path_depth)
            .withColumn("n_params", n_params)
            .withColumn("has_fragment", url.contains("#")))


def canonicalize_url(df: DataFrame, url_col: str = "url",
                     out_col: str = "url_canon") -> DataFrame:
    """Dedup-grade canonical form: lowercase scheme+host, strip the
    scheme's default port, drop the fragment, sort query params
    byte-wise, normalize an empty path to '/'.  Two URLs naming the
    same page under these transformations collide on one key, so
    url-level exact dedup (groupBy url_canon) stops splitting on
    byte noise.  Pure codegen; unparseable URLs pass through
    unchanged (a crawl must never lose rows to a canonicalizer)."""
    url = F.col(url_col)
    p = _parts(url)
    default_port = F.lit(None).cast("int")
    for s, dp in _DEFAULT_PORTS.items():
        default_port = F.when(p["scheme"] == s, dp).otherwise(default_port)
    keep_port = p["port"].isNotNull() & (
        default_port.isNull() | (p["port"] != default_port))
    port_part = F.when(keep_port,
                       F.concat(F.lit(":"), p["port"].cast("string"))
                       ).otherwise(F.lit(""))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(p["query"], "&"),
                              lambda s: s != "")), "&")
    q_part = F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)
                    ).otherwise(F.lit(""))
    canon = F.concat(p["scheme"], F.lit("://"), p["host"], port_part,
                     path, q_part)
    return df.withColumn(
        out_col,
        F.when(p["scheme"] == "", url).otherwise(canon))
