"""URL parsing / canonicalization kernels (Arrow-vectorized).

Crawl curation needs URL surgery constantly — dedup by canonical URL,
group by registered domain, strip tracking params before hashing.
Everything here is batch-Arrow: ONE RE2 ``extract_regex`` per batch
splits the URL into components; host/domain math runs on the flat
values+offsets arrays of a single ``split_pattern`` call; only rows
that actually carry a query string take the per-row param-sort path
(the selective-repair shape of ``textkit.extract_text_arrow``).

Reference analog: the granule-id/url builders in FILDA_IO.py:120-160
parse structured names with one compiled pattern per file list — same
contract (pure function of the string column, QA null for unparsable
rows), batch-vectorized here.

Canonicalization contract (documented, tested, SQL-oracled):
- scheme and host lowercased
- default ports stripped (http:80, https:443); others kept
- empty path becomes "/"
- fragment dropped
- tracking params removed: keys starting ``utm_`` and keys in
  {gclid, fbclid, msclkid}
- surviving ``k=v`` tokens sorted lexicographically (full token)
- registered domain: last two host labels, or last three when the
  second-to-last is a known second-level label (co/com/org/net/ac/
  gov/edu) under a ccTLD of <= 3 chars (the public-suffix-list
  heuristic subset; a full PSL drops in here unchanged)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]*)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)

DEFAULT_PORTS = {"http": 80, "https": 443}
TRACKING_KEYS = {"gclid", "fbclid", "msclkid"}
SECOND_LEVEL = {"co", "com", "org", "net", "ac", "gov", "edu"}


def _canon_query(q: str) -> str:
    """Strip tracking params, sort surviving k=v tokens."""
    toks = [
        t for t in q.split("&")
        if t and not t.startswith("utm_")
        and t.split("=", 1)[0] not in TRACKING_KEYS
    ]
    toks.sort()
    return "&".join(toks)


def parse_urls(urls) -> pa.Table:
    """String column -> components table (one RE2 pass).

    Columns: scheme (lowered), host (lowered), port (int32; default
    ports stripped, null when absent), path ('/' when empty), query
    (canonicalized: tracking params dropped, tokens sorted; '' when
    none), n_params (int32, surviving count), ok (bool; False rows
    have null components — unparsable URLs are a QA condition, not an
    error, per the crawl-robustness convention).
    """
    urls = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    st = pc.extract_regex(urls, URL_RE)
    ok = pc.is_valid(st)
    scheme = pc.ascii_lower(pc.struct_field(st, "scheme"))
    host = pc.ascii_lower(pc.struct_field(st, "host"))
    port_s = pc.struct_field(st, "port")
    path = pc.struct_field(st, "path")
    query = pc.struct_field(st, "query")

    # ports: '' -> null, default-for-scheme -> null, else int
    port = pc.cast(pc.replace_substring_regex(port_s, "^$", "-1"), pa.int32())
    port_np = port.to_numpy(zero_copy_only=False).astype(np.float64)
    scheme_np = scheme.to_numpy(zero_copy_only=False)
    defaults = np.array([DEFAULT_PORTS.get(s, -2) for s in scheme_np], dtype=np.float64)
    absent = (port_np == -1) | (port_np == defaults) | np.isnan(port_np)
    port = pa.array(np.where(absent, 0, port_np).astype(np.int32),
                    pa.int32(), mask=absent)

    path = pc.replace_substring_regex(path, "^$", "/")

    # query canonicalization: per-row Python ONLY for rows with a query
    qnp = query.to_numpy(zero_copy_only=False)
    has_q = np.array([bool(s) for s in qnp], dtype=bool)
    canon = np.array([""] * len(qnp), dtype=object)
    nparams = np.zeros(len(qnp), dtype=np.int32)
    for i in np.flatnonzero(has_q):
        c = _canon_query(qnp[i])
        canon[i] = c
        nparams[i] = 0 if not c else c.count("&") + 1

    okm = ok.to_numpy(zero_copy_only=False)
    tbl = pa.table({
        "scheme": scheme, "host": host, "port": port,
        "path": path,
        "query_canon": pa.array(canon, pa.string()),
        "n_params": pa.array(nparams),
        "ok": ok,
    })
    if not okm.all():
        # null out components of unparsable rows (extract gave '')
        keep = pa.array(okm)
        cols = [pc.if_else(keep, tbl.column(c), pa.scalar(None, tbl.column(c).type))
                if c != "ok" else tbl.column(c) for c in tbl.column_names]
        tbl = pa.table(dict(zip(tbl.column_names, cols)))
    return tbl


def registered_domain(host) -> pa.Array:
    """Host column -> eTLD+1 via offsets math on ONE split_pattern
    call: last two labels, or three under the SECOND_LEVEL/ccTLD
    heuristic.  Null/empty hosts -> null."""
    host = host.combine_chunks() if isinstance(host, pa.ChunkedArray) else host
    n = len(host)
    if n == 0:
        return pa.array([], pa.string())
    parts = pc.split_pattern(host, ".")
    # flat label values + per-row offsets (zero-copy list internals)
    flat = parts.values.to_numpy(zero_copy_only=False)
    offs = parts.offsets.to_numpy()
    counts = offs[1:] - offs[:-1]
    valid = pc.is_valid(parts).to_numpy(zero_copy_only=False) & (counts >= 2)
    end = offs[1:]
    last = np.where(valid, flat[np.clip(end - 1, 0, None)], "")
    second = np.where(valid, flat[np.clip(end - 2, 0, None)], "")
    has3 = valid & (counts >= 3)
    third = np.where(has3, flat[np.clip(end - 3, 0, None)], "")
    last_len = np.array([len(s) for s in last])
    take3 = has3 & np.isin(second, list(SECOND_LEVEL)) & (last_len <= 3)
    out = np.where(
        take3,
        np.char.add(np.char.add(third.astype(str), "."),
                    np.char.add(np.char.add(second.astype(str), "."), last.astype(str))),
        np.char.add(np.char.add(second.astype(str), "."), last.astype(str)),
    )
    return pa.array(np.where(valid, out, None).tolist(), pa.string())


def canonical_url(parsed: pa.Table) -> pa.Array:
    """Reassemble the canonical URL string from ``parse_urls`` output
    (fragment already dropped; Arrow binary_join_element_wise)."""
    port = parsed.column("port")
    port_str = pc.if_else(
        pc.is_valid(port),
        pc.binary_join_element_wise(":", pc.cast(port, pa.string()), ""),
        pa.scalar("", pa.string()),
    )
    q = parsed.column("query_canon")
    q_str = pc.if_else(
        pc.not_equal(pc.coalesce(q, ""), ""),
        pc.binary_join_element_wise("?", pc.coalesce(q, ""), ""),
        pa.scalar("", pa.string()),
    )
    out = pc.binary_join_element_wise(
        parsed.column("scheme"), "://", parsed.column("host"),
        port_str, parsed.column("path"), q_str, "")
    return pc.if_else(parsed.column("ok"), out, pa.scalar(None, pa.string()))
