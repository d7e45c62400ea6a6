"""Text kernels: extraction, tokenization, language ID, quality
scores, fingerprints, MinHash / SimHash signatures.

The per-row invariant of the build (BASELINE.json input_hint) is
*byte-identical extracted text per url*: ``extract_text`` is fully
deterministic and versioned (EXTRACTOR_VERSION bumps on any change;
goldens are pinned against it in tests).

Regexes are compiled once at module import (amortized per worker
process — same effect as actor __init__ state for stateless tasks).
"""

from __future__ import annotations

import re

import numpy as np

EXTRACTOR_VERSION = 1

_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.S)
_TAG_RE = re.compile(rb"<[^>]*>")
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

# tiny per-language stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists; engine addition for the
# training-data pipeline ops)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "una", "por", "con"},
    "it": {"il", "di", "che", "la", "per", "una", "sono", "con", "non", "del"},
    "pt": {"o", "de", "que", "e", "em", "um", "uma", "para", "com", "os"},
}


def extract_text(html_values) -> np.ndarray:
    """Deterministic html -> text extraction (bytes in, str out).

    Takes the content between <body> and </body>, strips all tags,
    decodes UTF-8.  Must reproduce the source text byte-for-byte for
    pages produced by ``sources.pages.render_html`` (the per-row
    invariant); returns '' when no body is found.
    """
    out = np.empty(len(html_values), dtype=object)
    for i, h in enumerate(html_values):
        if h is None:
            out[i] = ""
            continue
        if isinstance(h, str):
            h = h.encode("utf-8")
        m = _BODY_RE.search(h)
        body = m.group(1) if m else b""
        out[i] = _TAG_RE.sub(b"", body).decode("utf-8", errors="replace")
    return out


_ARROW_BODY_PAT = r"(?s)<body[^>]*>(?P<body>.*?)</body>"
_ARROW_TAG_PAT = r"<[^>]*>"


def _utf8_invalid_rows(arr) -> np.ndarray:
    """Indices of rows that fail the validating binary->string cast,
    found by BISECTION over zero-copy slices — never a per-row Python
    decode.  Cost ~ 2x one full cast plus O(bad x log n) small casts.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    bad = []
    stack = [(0, len(arr))]
    while stack:
        s, e = stack.pop()
        if s >= e:
            continue
        try:
            pc.cast(arr.slice(s, e - s), pa.string())
        except pa.ArrowInvalid:
            if e - s == 1:
                bad.append(s)
            else:
                m = (s + e) // 2
                stack.append((s, m))
                stack.append((m, e))
    return np.array(sorted(bad), dtype=np.int64)


def extract_text_arrow(html):
    """Vectorized Arrow twin of ``extract_text`` (same semantics,
    same EXTRACTOR_VERSION): RE2 kernels instead of a Python loop.
    Equivalence is pinned by tests; the hot path uses this one.

    Invalid UTF-8 (routine in Common-Crawl-style input) would make the
    validating binary->string cast raise and kill the job.  Repair is
    PER ROW: the invalid rows are located by bisection, only they take
    the scalar errors='replace' kernel, and the valid 99% stay on the
    Arrow path — output is byte-identical between paths by
    construction, reassembled in original order with one Arrow take.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        hs = pc.cast(html, pa.string())
    except pa.ArrowInvalid:
        arr = html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html
        bad_idx = _utf8_invalid_rows(arr)
        good_idx = np.setdiff1d(np.arange(len(arr), dtype=np.int64), bad_idx,
                                assume_unique=True)
        good_out = extract_text_arrow(arr.take(pa.array(good_idx)))
        if isinstance(good_out, pa.ChunkedArray):
            good_out = good_out.combine_chunks()
        bad_out = pa.array(extract_text(arr.take(pa.array(bad_idx)).to_pylist()),
                           pa.string())
        inv = np.empty(len(arr), dtype=np.int64)
        inv[np.concatenate([good_idx, bad_idx])] = np.arange(len(arr))
        return pa.concat_arrays([good_out, bad_out]).take(pa.array(inv))
    # NOTE(perf, measured): a multi-pass numpy byte scanner for the
    # body capture is ~1.8x faster single-threaded but 2-3x SLOWER in
    # aggregate at 32-way concurrency (memory-bandwidth bound; RE2's
    # single pass is cache-friendly) — see BASELINE.md round-2 notes.
    # The RE2 kernel stays.
    body = pc.struct_field(pc.extract_regex(hs, _ARROW_BODY_PAT), "body")
    out = pc.replace_substring_regex(body, _ARROW_TAG_PAT, "")
    return pc.fill_null(out, "")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def _as_string_array(texts):
    """list/ndarray/Arrow column -> non-null pa.string() array (one C
    conversion; the RE2 kernels below never see Python rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(texts, pa.string())
    if pa.types.is_large_string(texts.type) or pa.types.is_binary(texts.type) \
            or pa.types.is_large_binary(texts.type):
        texts = texts.cast(pa.string())
    return pc.fill_null(texts, "")


def token_counts(texts) -> np.ndarray:
    """Whitespace/alnum token count per document (int64).

    One RE2 run-count over the batch (the gopher_stats pattern) — no
    per-row findall.  SQL mirror on space-separated corpora:
    ``array_length(string_split(text, ' '))``.
    """
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    return pc.count_substring_regex(arr, r"[A-Za-z0-9]+").to_numpy(
        zero_copy_only=False).astype(np.int64)


def _explode_tokens(texts, *, lower: bool = False):
    """Batch tokenizer: ONE Arrow regex split over all texts.

    Returns ``(uniq, codes, counts)`` — the distinct token strings (an
    Arrow string array; ``.to_pylist()`` it only when the strings are
    actually needed), the factorized flat token ids in document order,
    and tokens-per-row.  Tokens are the ``[A-Za-z0-9]+`` runs (the
    ``_TOKEN_RE.findall`` contract); null/empty rows contribute zero
    tokens.  The factorize is Arrow ``dictionary_encode`` — token
    strings never materialize as Python objects — so downstream
    per-token digests (blake2b) run once per DISTINCT token, not once
    per occurrence: the Zipf win that makes batch fingerprinting cheap."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    if lower:
        arr = pc.utf8_lower(arr)
    lists = pc.split_pattern_regex(arr, "[^A-Za-z0-9]+")
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # regex split emits "" artifacts where a text starts/ends with a
    # delimiter (and for empty texts); drop them and fix the counts
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        counts = np.bincount(row[keep_np], minlength=len(counts))
        flat = flat.filter(keep)
    enc = flat.dictionary_encode()
    # indices stay int32 (zero-copy); arithmetic upcasts where needed
    return enc.dictionary, enc.indices.to_numpy(zero_copy_only=False), counts


def _ascii_byte_count(arr, lo: int, hi: int) -> np.ndarray:
    """Per-row count of bytes in [lo, hi] straight off the Arrow UTF-8
    data buffer (one numpy compare + cumsum + offsets gather).  Valid
    for any ASCII byte range even on multi-byte UTF-8 text: UTF-8
    continuation/lead bytes are all >= 0x80, so they can never alias
    an ASCII target.  ~20x faster than an RE2 single-char-class count
    (which walks match-by-match through millions of hits)."""
    import pyarrow as pa

    assert isinstance(arr, pa.Array) and pa.types.is_string(arr.type)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    hit = (buf >= lo) & (buf <= hi)
    cum = np.r_[0, np.cumsum(hit, dtype=np.int64)]
    return cum[off[1:]] - cum[off[:-1]]


def quality_features(texts):
    """dict of vectorized quality columns per document.

    Engine addition (training-data quality scoring): n_chars, n_tokens,
    mean token length, digit ratio, space ratio, distinct-token ratio.
    All are SQL-expressible for oracle checks.

    Vectorized (no Python row loop): ONE ``_explode_tokens`` pass gives
    token counts, per-token lengths (utf8_length over the DICTIONARY,
    gathered by code), and distinct-token counts (np.unique over
    (row, token-code) pairs); digit/space counts are one RE2/substring
    count each.  Digits are ASCII ``[0-9]`` — the SQL mirror's
    definition.  ``_quality_features_ref`` is the scalar twin tests
    pin against (bit-identical outputs).
    """
    import pyarrow.compute as pc

    arr = _as_string_array(texts)
    n = len(arr)
    n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    digits = _ascii_byte_count(arr, 0x30, 0x39)   # '0'..'9'
    spaces = _ascii_byte_count(arr, 0x20, 0x20)   # ' '

    uniq, codes, counts = _explode_tokens(texts)
    n_tokens = counts
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(codes):
        # alnum chars per row = segmented sum of token lengths; lengths
        # computed once per DISTINCT token and gathered by code
        tok_len = pc.utf8_length(uniq).to_numpy(
            zero_copy_only=False).astype(np.int64)[codes]
        offsets = np.r_[0, np.cumsum(counts)]
        has = counts > 0
        alnum_chars = np.zeros(n, dtype=np.int64)
        alnum_chars[has] = np.add.reduceat(tok_len, offsets[:-1][has])
        # distinct (row, token) pairs in one hashtable pass (pd.unique
        # is O(N); np.unique would pay a full sort)
        import pandas as pd

        upairs = pd.unique(row * np.int64(len(uniq) + 1) + codes)
        n_distinct = np.bincount(upairs // np.int64(len(uniq) + 1),
                                 minlength=n)
    else:
        alnum_chars = np.zeros(n, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)

    nt = np.where(n_tokens > 0, n_tokens, 1).astype(np.float64)
    nc = np.where(n_chars > 0, n_chars, 1).astype(np.float64)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": np.where(n_tokens > 0, alnum_chars / nt, 0.0),
        "digit_ratio": np.where(n_chars > 0, digits / nc, 0.0),
        "space_ratio": np.where(n_chars > 0, spaces / nc, 0.0),
        "distinct_ratio": np.where(n_tokens > 0, n_distinct / nt, 0.0),
    }


def _quality_features_ref(texts):
    """Scalar reference twin of ``quality_features`` (per-row loop) —
    kept ONLY for tests to pin the vectorized kernel against."""
    n = len(texts)
    out = {k: np.zeros(n, d) for k, d in (
        ("n_chars", np.int64), ("n_tokens", np.int64),
        ("mean_token_len", np.float64), ("digit_ratio", np.float64),
        ("space_ratio", np.float64), ("distinct_ratio", np.float64))}
    for i, t in enumerate(texts):
        if not t:
            continue
        out["n_chars"][i] = len(t)
        toks = _TOKEN_RE.findall(t)
        out["n_tokens"][i] = len(toks)
        if toks:
            out["mean_token_len"][i] = sum(len(w) for w in toks) / len(toks)
            out["distinct_ratio"][i] = len(set(toks)) / len(toks)
        out["digit_ratio"][i] = sum(c in "0123456789" for c in t) / len(t)
        out["space_ratio"][i] = t.count(" ") / len(t)
    return out


def line_stats(texts):
    """Per-document line-repetition metrics (boilerplate detector for
    training-data curation; no reference analog — engine addition):
    (n_lines, n_distinct_lines, max_line_occurrences) per text.

    Vectorized: ONE Arrow split over the whole batch, then pandas
    C-hashtable groupbys over the flattened (row, line) pairs — exact
    string equality, no hash-collision caveat.  Null texts yield
    (-1, -1, -1) sentinels (callers filter or null them out).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, pa.string()) if not isinstance(
        texts, (pa.Array, pa.ChunkedArray)) else texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    lists = pc.split_pattern(arr, "\n")
    valid = arr.is_valid().to_numpy(zero_copy_only=False)
    cnt = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), cnt)
    flat = lists.flatten().to_pandas().to_numpy()
    df = pd.DataFrame({"row": row_ids, "line": flat})
    per_pair = df.groupby(["row", "line"], sort=False).size()
    per_row = per_pair.groupby(level=0)
    nun = per_row.size()
    mx = per_row.max()
    n_lines = np.full(n, -1, dtype=np.int64)
    n_distinct = np.full(n, -1, dtype=np.int64)
    max_occ = np.full(n, -1, dtype=np.int64)
    n_lines[valid] = cnt[valid]
    if len(nun):
        n_distinct[nun.index.to_numpy()] = nun.to_numpy()
        max_occ[mx.index.to_numpy()] = mx.to_numpy()
    return n_lines, n_distinct, max_occ


def json_extract_int(col, key: str):
    """Integer field extraction from a JSON-string column (web-event
    props payloads).  Fast path: ONE RE2 ``"key"\\s*:\\s*(-?\\d+)``
    extract over the batch — correct for flat objects with scalar
    values.  Rows the regex misses but that still mention the key
    (nested/escaped/spacey JSON) take a per-row ``json.loads``
    fallback — the selective-repair shape again, so well-formed flat
    rows (the web norm) never leave Arrow.  Returns int64 with nulls
    for absent/non-integer/invalid rows.
    """
    import json
    import re as _re

    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col, pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat = rf'"{_re.escape(key)}"\s*:\s*(?P<v>-?\d+)[,}}\s]'
    hit = pc.extract_regex(col, pattern=pat)
    vals = pc.struct_field(hit, "v").cast(pa.int64())
    mention = pc.fill_null(pc.match_substring(col, f'"{key}"'), False)
    # nested objects would let the regex match a non-top-level key:
    # any row with >1 '{' goes to the exact parser
    nested = pc.greater(pc.count_substring(col, "{"), 1)
    need_fix = pc.and_(mention, pc.or_(
        pc.is_null(vals), pc.fill_null(nested, False)))
    if pc.any(need_fix).as_py():
        out = vals.to_numpy(zero_copy_only=False).astype(object)
        idx = np.flatnonzero(need_fix.to_numpy(zero_copy_only=False)
                             .astype(bool))
        raw = col.take(pa.array(idx)).to_pylist()
        for j, s in zip(idx, raw):
            try:
                v = json.loads(s).get(key)
                out[j] = int(v) if isinstance(v, (int, np.integer)) and not isinstance(v, bool) else None
            except (ValueError, TypeError, AttributeError):
                out[j] = None
        clean = [None if (x is None or (isinstance(x, float) and np.isnan(x)))
                 else int(x) for x in out]
        return pa.array(clean, pa.int64())
    return vals


def lang_id(texts) -> np.ndarray:
    """Stopword-profile language guess ('und' when no evidence).

    Deterministic tie-break: highest hit count, then alphabetical.

    Vectorized (the gopher_stats one-RE2-count-per-signal pattern):
    each stopword is ONE token-boundary presence test over the
    lowercased batch — `(^|[^a-z0-9])word([^a-z0-9]|$)`, equivalent to
    membership in the `[A-Za-z0-9]+` token set — giving a (docs x
    langs) distinct-hit matrix; argmax over alphabetically ordered
    languages reproduces the reference tie-break exactly."""
    import pyarrow.compute as pc

    arr = pc.utf8_lower(_as_string_array(texts))
    langs = sorted(_LANG_PROFILES)
    hits = np.zeros((len(arr), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        for w in _LANG_PROFILES[lang]:
            pat = rf"(^|[^a-z0-9]){re.escape(w)}([^a-z0-9]|$)"
            present = pc.greater(pc.count_substring_regex(arr, pat), 0)
            hits[:, j] += present.to_numpy(zero_copy_only=False)
    best = np.argmax(hits, axis=1)
    out = np.asarray(langs, dtype=object)[best]
    out[hits.max(axis=1) == 0] = "und"
    return out


# ---------------------------------------------------------------------------
# Fingerprints / near-dup signatures
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)        # FNV prime as rolling base
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


_FP_OFFSET = np.uint64(14695981039346656037)  # FNV-1a 64-bit offset basis


def fingerprint64(texts) -> np.ndarray:
    """Order-sensitive rolling token hash (document fingerprint).

    h = fold(h * base + token_hash) over tokens, in uint64 arithmetic.

    Vectorized, bit-identical to ``_fingerprint64_ref``: the rolling
    fold has the closed form h = OFFSET*B^n + sum_i th_i * B^(n-1-i)
    (mod 2^64), so one batch-wide tokenize (``_explode_tokens``), one
    blake2b pass over DISTINCT tokens only, a power table to the max
    doc length, and one np.add.reduceat over the per-row segments
    replace the per-row/per-token Python loops."""
    from .hashing import content_hash64

    import pyarrow.compute as pc

    uniq, codes, counts = _explode_tokens(texts)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    # empty/None texts stay 0; tokenless non-empty texts get OFFSET
    nonempty = pc.greater(pc.utf8_length(_as_string_array(texts)), 0).to_numpy(
        zero_copy_only=False)
    out[nonempty] = _FP_OFFSET
    if len(codes) == 0:
        return out
    th = content_hash64(uniq.to_pylist())[codes]
    with np.errstate(over="ignore"):
        pow_b = np.empty(int(counts.max()) + 1, dtype=np.uint64)
        pow_b[0] = np.uint64(1)
        np.multiply.accumulate(np.full(len(pow_b) - 1, _FP_BASE), out=pow_b[1:])
        offsets = np.r_[0, np.cumsum(counts)]
        local = np.arange(len(codes), dtype=np.int64) - np.repeat(offsets[:-1], counts)
        exp = np.repeat(counts, counts) - 1 - local
        terms = th * pow_b[exp]
        has = counts > 0
        sums = np.add.reduceat(terms, offsets[:-1][has])
        out[has] = _FP_OFFSET * pow_b[counts[has]] + sums
    return out


def _fingerprint64_ref(texts) -> np.ndarray:
    """Scalar reference twin (per-row/per-token rolling fold) — kept
    ONLY for tests to pin the vectorized kernel against."""
    from .hashing import content_hash64

    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = _TOKEN_RE.findall(t)
        th = content_hash64(toks)
        h = _FP_OFFSET
        with np.errstate(over="ignore"):
            for x in th:
                h = h * _FP_BASE + x
        out[i] = h
    return out


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """uint64 hashes of w-token shingles (sorted-unique).

    Vectorized: per-token hashes once, then a rolling hash_combine of
    w consecutive token hashes (no Python string joins per shingle).
    """
    from .hashing import content_hash64, hash_combine

    toks = _TOKEN_RE.findall(text.lower()) if text else []
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = content_hash64(toks)
    if len(toks) < w:
        h = th[:1]
        for k in range(1, len(toks)):
            h = hash_combine(h, th[k:k + 1])
        return h
    h = th[: len(toks) - w + 1].copy()
    for k in range(1, w):
        h = hash_combine(h, th[k: len(toks) - w + 1 + k])
    return np.unique(h)


def shingle_hashes_batch(texts, w: int = 3):
    """Batched ``shingle_hashes`` over a whole column: returns
    ``(flat, offsets)`` where ``flat[offsets[i]:offsets[i+1]]`` is
    BIT-identical to ``shingle_hashes(texts[i], w)``.

    One Arrow tokenize for the batch (``_explode_tokens``), blake2b
    once per DISTINCT token, the w-wide rolling ``hash_combine`` over
    flat positions (shingle starts never cross row boundaries), and
    per-row sorted-unique via one lexsort — the per-document Python
    loop of the scalar twin disappears, which is the hot cost of the
    MinHash signature and Jaccard-verify stages."""
    from .hashing import content_hash64, hash_combine

    uniq, codes, counts = _explode_tokens(texts, lower=True)
    th = content_hash64(uniq.to_pylist())[codes]
    n = len(counts)
    offsets = np.r_[0, np.cumsum(counts)]
    out_counts = np.zeros(n, dtype=np.int64)

    # rows shorter than w fold ALL their tokens into one hash
    short = (counts > 0) & (counts < w)
    hs = np.empty(0, dtype=np.uint64)
    if short.any():
        off_s = offsets[:-1][short]
        l_s = counts[short]
        hs = th[off_s].copy()
        for k in range(1, w):
            msk = l_s > k
            if msk.any():
                hs[msk] = hash_combine(hs[msk], th[off_s[msk] + k])
        out_counts[short] = 1

    # rows with >= w tokens: every start position, rolled w-wide
    long = counts >= w
    rr = hh = np.empty(0, dtype=np.uint64)
    if long.any():
        m = counts[long] - w + 1
        base = np.repeat(offsets[:-1][long], m)
        within = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(m) - m, m)
        starts = base + within
        h = th[starts].copy()
        for k in range(1, w):
            h = hash_combine(h, th[starts + k])
        row_g = np.repeat(np.flatnonzero(long), m)
        order = np.lexsort((h, row_g))
        h, row_g = h[order], row_g[order]
        keep = np.r_[True, (h[1:] != h[:-1]) | (row_g[1:] != row_g[:-1])]
        hh, rr = h[keep], row_g[keep]
        out_counts[long] = np.bincount(rr, minlength=n)[long]

    out_off = np.r_[0, np.cumsum(out_counts)]
    flat = np.empty(int(out_counts.sum()), dtype=np.uint64)
    if short.any():
        flat[out_off[:-1][short]] = hs
    if len(hh):
        seg = np.flatnonzero(np.r_[True, rr[1:] != rr[:-1]])
        rank = np.arange(len(rr), dtype=np.int64) - np.repeat(
            seg, np.diff(np.r_[seg, len(rr)]))
        flat[out_off[rr] + rank] = hh
    return flat, out_off


def minhash_signature_matrix(flat: np.ndarray, offsets: np.ndarray,
                             a: np.ndarray, b: np.ndarray,
                             perm_chunk: int = 32) -> np.ndarray:
    """(rows, num_perm) MinHash signatures over per-row shingle-hash
    segments — BIT-identical to stacking ``minhash_signature`` per
    row.  The (perm x shingle) affine map runs in perm chunks (bounded
    memory) with one ``np.minimum.reduceat`` per chunk for the per-row
    mins; empty rows get the scalar code's all-ones sentinel."""
    num_perm = a.shape[0]
    n = len(offsets) - 1
    out = np.full((n, num_perm), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    counts = np.diff(offsets)
    has = counts > 0
    if not has.any():
        return out
    starts = offsets[:-1][has]
    # affine-map DISTINCT shingle hashes only, then gather per
    # occurrence: template/boilerplate corpora (the adversarial
    # near-dup shape) share most shingles across documents, so the
    # expensive permutation arithmetic shrinks by the duplication
    # factor while the reduceat still sees every occurrence
    uh, inv = np.unique(flat, return_inverse=True)
    if len(uh) > (2 * len(flat)) // 3:
        uh, inv = flat, None   # low duplication: gather would be pure loss
    h = (uh & _MERSENNE61).astype(np.uint64)
    lo = (h & np.uint64((1 << 30) - 1))[None, :]
    hi = (h >> np.uint64(30))[None, :]
    mask31 = np.uint64((1 << 31) - 1)
    for p0 in range(0, num_perm, perm_chunk):
        ak = a[p0:p0 + perm_chunk, None]
        bk = b[p0:p0 + perm_chunk, None]
        u = ak * hi
        t1 = ((u & mask31) << np.uint64(30)) + (u >> np.uint64(31))
        t1 = np.where(t1 >= _MERSENNE61, t1 - _MERSENNE61, t1)
        v = t1 + ak * lo + bk                      # < 2^63
        # v mod (2^61-1) via the Mersenne fold (2^61 == 1 mod M61):
        # exactly equal to the scalar twin's generic % but ~4 cheap ops
        v = (v & _MERSENNE61) + (v >> np.uint64(61))
        v = np.where(v >= _MERSENNE61, v - _MERSENNE61, v)
        vv = v if inv is None else v[:, inv]
        out[np.ix_(has, range(p0, min(p0 + perm_chunk, num_perm)))] = \
            np.minimum.reduceat(vv, starts, axis=1).T
    return out


_MERSENNE61 = np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 1):
    """(a, b) arrays for the affine permutations h -> (a*h + b) mod p.

    ``a`` is kept below 2^30 so the vectorized 61-bit modular multiply
    in ``minhash_signature`` never overflows uint64."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 30) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (num_perm,) of a shingle-hash set.

    Exact (a*h + b) mod 2^61-1 arithmetic (a < 2^30), fully vectorized
    as one (num_perm x n_shingles) matrix op with overflow-free 61-bit
    folding: a*h = a*hi*2^30 + a*lo where h = hi*2^30 + lo, and
    x*2^30 mod (2^61-1) folds as ((x & (2^31-1)) << 30) + (x >> 31).
    """
    if hashes.size == 0:
        return np.full(a.shape[0], np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    h = (hashes & _MERSENNE61).astype(np.uint64)
    lo = (h & np.uint64((1 << 30) - 1))[None, :]
    hi = (h >> np.uint64(30))[None, :]
    ak = a[:, None]
    mask31 = np.uint64((1 << 31) - 1)
    u = ak * hi                                   # < 2^61, no overflow
    t1 = ((u & mask31) << np.uint64(30)) + (u >> np.uint64(31))  # u*2^30 mod fold, < 2^61+2^30
    t1 = np.where(t1 >= _MERSENNE61, t1 - _MERSENNE61, t1)
    t2 = ak * lo                                  # < 2^60
    v = (t1 + t2 + b[:, None]) % _MERSENNE61      # sum < 2^63
    return v.min(axis=1)


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """uint64 hash per LSH band (rows = num_perm / num_bands)."""
    return minhash_bands_matrix(sig[None, :], num_bands)[0]


def minhash_bands_matrix(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(docs, num_perm) signatures -> (docs, num_bands) band hashes,
    vectorized: fold hash_combine across the rows of each band."""
    from .hashing import hash_combine

    docs, num_perm = sigs.shape
    rows = num_perm // num_bands
    chunks = sigs[:, : num_bands * rows].reshape(docs, num_bands, rows)
    h = np.broadcast_to(
        (np.arange(num_bands, dtype=np.uint64) + np.uint64(1))[None, :], (docs, num_bands)
    ).copy()
    for r in range(rows):
        h = hash_combine(h.ravel(), chunks[:, :, r].ravel()).reshape(docs, num_bands)
    return h


def jaccard(h1: np.ndarray, h2: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique hash sets."""
    if h1.size == 0 and h2.size == 0:
        return 1.0
    inter = np.intersect1d(h1, h2, assume_unique=True).size
    union = h1.size + h2.size - inter
    return inter / union if union else 0.0


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over token hashes (unweighted).

    Vectorized, bit-identical to ``_simhash64_ref``: one batch-wide
    lowercased tokenize, blake2b over DISTINCT tokens only, then per
    bit one segmented np.add.reduceat vote over the per-row token
    runs — 64 vectorized passes total, no per-row Python."""
    from .hashing import content_hash64

    uniq, codes, counts = _explode_tokens(texts, lower=True)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    if len(codes) == 0:
        return out
    th = content_hash64(uniq.to_pylist())[codes]
    offsets = np.r_[0, np.cumsum(counts)]
    has = counts > 0
    starts = offsets[:-1][has]
    nh = counts[has]
    acc = np.zeros(len(starts), dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat(
            ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64), starts)
        acc |= (2 * ones - nh > 0).astype(np.uint64) << np.uint64(b)
    out[has] = acc
    return out


def _simhash64_ref(texts) -> np.ndarray:
    """Scalar reference twin (per-row bit matrix) — kept ONLY for
    tests to pin the vectorized kernel against."""
    from .hashing import content_hash64

    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t.lower()) if t else []
        if not toks:
            continue
        th = content_hash64(toks)
        bitmat = ((th[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        score = bitmat.sum(axis=0) * 2 - len(toks)  # (+1/-1 votes)
        out[i] = np.uint64(((score > 0).astype(np.uint64) << bits).sum(dtype=np.uint64))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def levenshtein_batch(a_texts, b_texts) -> np.ndarray:
    """Exact Levenshtein (unit-cost edit) distance for MANY string
    pairs at once, vectorized ACROSS the pairs.

    The textbook DP is O(|a|x|b|) per pair with a data dependence
    along each row (the insertion term D[i][j-1]+1).  That dependence
    has a closed form: with c[j] = min(D[i-1][j]+1, D[i-1][j-1]+sub_j)
    (deletion/substitution only), D[i][j] = min_{k<=j} (c[k] + (j-k))
    — a prefix-minimum of (c[k]-k) plus j.  So each DP row for ALL
    pairs is one (P, Lb) numpy step: a broadcast compare for sub, two
    elementwise mins, and np.minimum.accumulate along axis 1.  Total
    work is max|a| vectorized row steps regardless of pair count.

    Distances are over Unicode CODE POINTS (strings decoded via
    utf-32), matching DuckDB's levenshtein() on ASCII and on any
    corpus without combining sequences.  None compares as "".
    """
    pa_ = [("" if t is None else t) for t in a_texts]
    pb_ = [("" if t is None else t) for t in b_texts]
    n = len(pa_)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.array([len(t) for t in pa_], dtype=np.int64)
    lb = np.array([len(t) for t in pb_], dtype=np.int64)
    la_max, lb_max = int(la.max()), int(lb.max())
    out = np.empty(n, dtype=np.int64)
    if lb_max == 0:
        return la.copy()
    # codepoint matrices, zero-padded (pad never matches: NUL stripped
    # from inputs is not expected; even if present, answers are read
    # at each pair's true lengths so pad columns/rows are inert)
    A = np.zeros((n, max(la_max, 1)), dtype=np.uint32)
    B = np.zeros((n, lb_max), dtype=np.uint32)
    for i, t in enumerate(pa_):
        if t:
            A[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    for i, t in enumerate(pb_):
        if t:
            B[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    j_idx = np.arange(lb_max + 1, dtype=np.int64)
    row = np.broadcast_to(j_idx, (n, lb_max + 1)).copy()  # D[0][j] = j
    out[la == 0] = lb[la == 0]
    for i in range(1, la_max + 1):
        sub = (A[:, i - 1 : i] != B).astype(np.int64)       # (n, lb_max)
        c = np.empty((n, lb_max + 1), dtype=np.int64)
        c[:, 0] = i
        np.minimum(row[:, 1:] + 1, row[:, :-1] + sub, out=c[:, 1:])
        np.minimum.accumulate(c - j_idx, axis=1, out=c)
        row = c + j_idx
        hit = la == i
        if hit.any():
            out[hit] = row[hit, lb[hit]]
    return out


# Gopher-style document quality rules (Rae et al. 2021, public) — the
# subset whose signals are computable with one RE2 count per pattern.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD = 3.0
GOPHER_MAX_MEAN_WORD = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS_RE = r"\b(the|be|to|of|and|that|have|with|a|in)\b"


def gopher_stats(col):
    """Arrow string column -> dict of vectorized Gopher-rule signals +
    keep/reasons.  Every signal is ONE pyarrow.compute RE2 count over
    the batch — no Python row loop anywhere:

    - n_words (`\\S+` runs), mean word length ((chars - whitespace) /
      words), symbol-to-word ratio (# and ... occurrences / words),
      bullet-line and ellipsis-line fractions ((?m) anchors), fraction
      of words containing a letter, stopword hits.
    - reasons: bitmask of failed rules (bit i = rule i below);
      keep = reasons == 0.  Null texts -> keep false, reasons null.

    Rules (documented thresholds above): 0 word count in
    [50, 100k]; 1 mean word length in [3, 10]; 2 symbol ratio < 0.1;
    3 bullet-start lines <= 90%; 4 ellipsis-end lines < 30%;
    5 alpha-word fraction > 80%; 6 >= 2 stopword hits.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())

    def cnt(pat):
        return pc.count_substring_regex(col, pat).to_numpy(zero_copy_only=False).astype(np.float64)

    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n_words = cnt(r"\S+")
    n_ws = cnt(r"\s")
    n_alpha_words = cnt(r"\S*[A-Za-z]\S*")
    n_stop = cnt(GOPHER_STOPWORDS_RE)
    n_lines = cnt(r"\n") + 1.0
    n_ellipsis_lines = cnt(r"(?m)\.\.\.$")
    n_bullet_lines = cnt(r"(?m)^[-*]")
    n_symbols = cnt(r"#|\.\.\.")

    valid = ~np.isnan(n_words)
    nw = np.where(n_words > 0, n_words, 1.0)
    mean_word = np.where(n_words > 0, (n_chars - n_ws) / nw, 0.0)
    symbol_ratio = np.where(n_words > 0, n_symbols / nw, 0.0)
    alpha_frac = np.where(n_words > 0, n_alpha_words / nw, 0.0)
    bullet_frac = n_bullet_lines / n_lines
    ellipsis_frac = n_ellipsis_lines / n_lines

    reasons = np.zeros(len(n_chars), dtype=np.int64)
    reasons |= ((n_words < GOPHER_MIN_WORDS) | (n_words > GOPHER_MAX_WORDS)) << 0
    reasons |= ((mean_word < GOPHER_MIN_MEAN_WORD) | (mean_word > GOPHER_MAX_MEAN_WORD)) << 1
    reasons |= (symbol_ratio >= GOPHER_MAX_SYMBOL_RATIO) << 2
    reasons |= (bullet_frac > GOPHER_MAX_BULLET_FRAC) << 3
    reasons |= (ellipsis_frac >= GOPHER_MAX_ELLIPSIS_FRAC) << 4
    reasons |= (alpha_frac <= GOPHER_MIN_ALPHA_FRAC) << 5
    reasons |= (n_stop < GOPHER_MIN_STOPWORDS) << 6

    return {
        "n_words": pa.array(np.where(valid, n_words, 0).astype(np.int64), mask=~valid),
        "mean_word_len": pa.array(mean_word, mask=~valid),
        "symbol_ratio": pa.array(symbol_ratio, mask=~valid),
        "bullet_frac": pa.array(bullet_frac, mask=~valid),
        "ellipsis_frac": pa.array(ellipsis_frac, mask=~valid),
        "alpha_frac": pa.array(alpha_frac, mask=~valid),
        "n_stopwords": pa.array(np.where(valid, n_stop, 0).astype(np.int64), mask=~valid),
        "gopher_reasons": pa.array(reasons, mask=~valid),
        "gopher_keep": pa.array(np.where(valid, reasons == 0, False)),
    }


def compression_stats(texts):
    """zlib compression ratio per document — the classic low-entropy /
    template-spam curation signal (highly repetitive pages compress
    far below natural prose).  Returns (raw_bytes, zlib_bytes, ratio)
    int64/int64/float64 arrays; empty/null texts get ratio NaN.

    Per-row C zlib calls (no vectorized form exists); level 6 is the
    standard speed/size tradeoff.
    """
    import zlib

    n = len(texts)
    raw = np.zeros(n, dtype=np.int64)
    comp = np.zeros(n, dtype=np.int64)
    ratio = np.full(n, np.nan)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = t.encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, 6))
        ratio[i] = comp[i] / raw[i]
    return raw, comp, ratio


def char_entropy(texts) -> np.ndarray:
    """Shannon entropy (bits) of the character distribution per
    document — complements the zlib ratio with an exactly
    SQL-expressible entropy (DuckDB can mirror it via char unnest +
    -sum(p*log2(p))).  Empty/null -> NaN.

    Vector path: one np.unique over the concatenated codepoint array
    with per-doc segment offsets — no per-row Python beyond the
    unavoidable str->codepoints conversion.
    """
    n = len(texts)
    out = np.full(n, np.nan)
    codes = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
             if t else np.array([], np.uint32) for t in texts]
    lens = np.array([c.size for c in codes], dtype=np.int64)
    if not lens.sum():
        return out
    flat = np.concatenate([c for c in codes if c.size])
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    # counts per (row, char) via lexsort + run lengths
    order = np.lexsort((flat, row))
    r, c = row[order], flat[order]
    new = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, r.size])
    rr = r[starts]
    p = counts / lens[rr]
    term = -p * np.log2(p)
    ent = np.zeros(n)
    np.add.at(ent, rr, term)
    out[lens > 0] = ent[lens > 0]
    return out
