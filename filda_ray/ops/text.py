"""Text-processing stages over the pages table.

Reference analog: the per-granule derive/projection stages (get_bt
M3, QA decode M22) — stateless vectorized map_batches.  Engine
additions per the training-data-pipeline requirement: extraction,
token counting, quality scoring, language ID, fingerprints.
"""

from __future__ import annotations

import numpy as np

from filda_ray.ops import shuffle_partitions
import pyarrow as pa

from ..kernels import textkit


def extract_stage(batch: pa.Table) -> pa.Table:
    """html -> extracted_text (+ match flag vs the shipped text column
    when present; byte-identical is the per-row invariant).

    Uses the vectorized Arrow extractor; ``textkit.extract_text`` is
    the scalar reference implementation the tests pin it against."""
    import pyarrow.compute as pc

    ext = textkit.extract_text_arrow(batch.column("html"))
    out = batch.append_column("extracted_text", ext)
    if "text" in batch.column_names:
        match = pc.equal(ext, pc.fill_null(batch.column("text").cast(pa.string()), ""))
        out = out.append_column("text_match", match)
    return out


def extract_text_op(ds):
    return ds.map_batches(extract_stage, batch_format="pyarrow")


def quality_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    feats = textkit.quality_features(batch.column(text_col))
    out = batch
    for name, arr in feats.items():
        out = out.append_column(name, pa.array(arr))
    return out


def quality_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: quality_stage(b, text_col), batch_format="pyarrow")


def repetition_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Line-repetition metrics per document (duplicate-line fraction
    is the classic boilerplate signal in web-corpus curation)."""
    n_lines, n_distinct, max_occ = textkit.line_stats(batch.column(text_col))
    with np.errstate(invalid="ignore", divide="ignore"):
        frac = np.where(n_lines > 0,
                        1.0 - n_distinct / n_lines.astype(np.float64), np.nan)
    return (batch.append_column("n_lines", pa.array(n_lines))
                 .append_column("n_distinct_lines", pa.array(n_distinct))
                 .append_column("max_line_occ", pa.array(max_occ))
                 .append_column("dup_line_frac", pa.array(frac)))


def repetition_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: repetition_stage(b, text_col),
                          batch_format="pyarrow")


def normalize_stage(batch: pa.Table, text_col: str = "text",
                    out_col: str = "norm_text") -> pa.Table:
    """Curation-grade text normalization, fully on Arrow kernels:
    Unicode NFC, lowercase, whitespace runs collapsed to one space,
    ends trimmed.  The regex engine is RE2 — same engine DuckDB uses —
    so `regexp_replace(.., '\\s+', ' ', 'g')` is semantics-identical
    and the stage is SQL-oracle-checkable.

    Scale note: the Python-NFC repair costs ~1 row/µs ONLY on rows
    containing non-ASCII; a mostly-CJK corpus pays it on every row
    (inherent — no vectorized composing NFC exists in-sandbox), but
    the stage stays embarrassingly parallel either way."""
    import unicodedata

    import pyarrow.compute as pc

    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    # NFC: pyarrow's utf8_normalize(form="NFC") does NOT compose
    # (utf8proc leaves e+COMBINING ACUTE decomposed, 16.1.0), so true
    # NFC comes from Python — but ONLY for rows containing non-ASCII
    # (NFC is identity on ASCII); the common rows never leave Arrow.
    # Same selective-repair shape as textkit.extract_text_arrow.
    m = pc.match_substring_regex(t, r"[^\x00-\x7F]")
    if pc.any(m).as_py():
        vals = t.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(m.to_numpy(zero_copy_only=False))
        for i in idx:
            if vals[i] is not None:
                vals[i] = unicodedata.normalize("NFC", vals[i])
        t = pa.array(vals, pa.string())
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    # trim ' ' only (all ASCII whitespace is now ' '): DuckDB's trim()
    # is space-only, utf8_trim_whitespace would also strip NBSP etc.
    t = pc.utf8_trim(t, " ")
    out = batch.append_column(out_col, t)
    return out.append_column(
        "n_chars_norm", pc.utf8_length(t).cast(pa.int64()))


def normalize_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: normalize_stage(b, text_col),
                          batch_format="pyarrow")


def langid_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    guess = textkit.lang_id(batch.column(text_col))
    return batch.append_column("lang_guess", pa.array(guess, pa.string()))


def langid_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: langid_stage(b, text_col), batch_format="pyarrow")


def _space_token_codes(col):
    """Batch space-split tokenizer for the vocab/df partials: ONE
    Arrow split + dictionary_encode over the whole batch (token
    strings never materialize as Python objects).  Empty/null texts
    contribute no tokens — matching the scalar partials' ``if not t:
    continue``.  Returns (dictionary, codes, row)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    col = pc.fill_null(col, "")
    valid = pc.greater(pc.utf8_length(col), 0).to_numpy(zero_copy_only=False)
    lists = pc.split_pattern(col, " ")
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    row = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    keep = valid[row]
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        row = row[keep]
    enc = flat.dictionary_encode()
    return enc.dictionary, enc.indices.to_numpy(zero_copy_only=False), row


def vocab_count(ds, text_col: str = "text", *, top_k: int | None = None):
    """Corpus vocabulary counts (training-data op): per-batch token
    count partials (one row per distinct token per batch — the
    pre-aggregate-before-shuffle pattern) -> merge -> optional top-k.

    Tokenization = single-space split (SQL mirror: unnest(string_split)).
    Returns Dataset(token, n) sorted by (-n, token) when top_k is set.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        uniq, codes, _row = _space_token_codes(batch.column(text_col))
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"token": uniq, "n": pa.array(n)})

    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=HIST_BATCH_ROWS).groupby("token", num_partitions=shuffle_partitions()).aggregate(
        Sum("n", alias_name="n")
    )

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"token": b.column("token"),
                         "n": b.column("n").cast(pa.int64())})

    merged = merged.map_batches(clean, batch_format="pyarrow")
    if top_k is None:
        return merged
    # streaming top-k: block-local partial top-k by the exact final
    # criterion (n desc, token asc), so the driver merges <= k rows
    # per block instead of the whole vocabulary
    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n", "token"], ascending=[False, True],
                                       kind="mergesort").head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    df = merged.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(top_k)
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False))


def fingerprint_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col)
    fp = textkit.fingerprint64(texts)
    sh = textkit.simhash64(texts)
    return (
        batch.append_column("fingerprint", pa.array(fp, pa.uint64()))
        .append_column("simhash", pa.array(sh, pa.uint64()))
    )


def fingerprint_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: fingerprint_stage(b, text_col), batch_format="pyarrow")


def document_frequency(ds, doc_col: str = "doc_id", text_col: str = "text"):
    """(token, df) over the corpus: per-batch partials count each
    token once per document (set semantics), then one bounded groupby
    sum — same pre-aggregate-before-shuffle shape as vocab_count.
    Tokenization = single-space split (SQL mirror: string_split)."""
    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        uniq, codes, row = _space_token_codes(batch.column(text_col))
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        # distinct (doc, token) pairs (set semantics) in one hashtable
        # pass, then df per token code
        nu = np.int64(len(uniq))
        upairs = pd.unique(row * nu + codes)
        df = np.bincount(upairs % nu, minlength=len(uniq)).astype(np.int64)
        return pa.table({"token": uniq, "df": pa.array(df)})

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=HIST_BATCH_ROWS).groupby(
        "token", num_partitions=shuffle_partitions()
    ).aggregate(Sum("df", alias_name="df"))

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({"token": b.column("token"),
                         "df": b.column("df").cast(pa.int64())})

    return merged.map_batches(clean, batch_format="pyarrow")


def tfidf_top_terms(ds, doc_col: str = "doc_id", text_col: str = "text", *,
                    vocab_size: int = 5000, per_doc: int = 3,
                    round_decimals: int = 6):
    """Per-document top TF-IDF terms over a bounded vocabulary.

    Scale design: the vocabulary is capped at the ``vocab_size``
    highest-DF tokens (the standard bounded-vocab trick — an
    unbounded idf table cannot be broadcast at web scale), selected
    with the same streaming block-local top-k merge as vocab_count so
    the driver sees ≤ vocab_size rows per block.  The scoring pass is
    a single broadcast-lookup map over the corpus: no shuffle of
    doc-term pairs at all; each batch emits at most ``per_doc`` rows
    per document.

    score = tf * ln(N / df), rounded half-up to ``round_decimals`` so
    the value AND the per-doc ranking are reproducible bit-for-bit
    against a SQL oracle (ordering by the rounded score, then token).
    """
    import ray

    from .workercache import worker_state

    n_docs = ds.count()

    # ---- bounded vocabulary: top-V by (df desc, token asc) ----
    dfreq = document_frequency(ds, doc_col, text_col)

    def partial_topv(b: pa.Table) -> pa.Table:
        d = b.to_pandas().sort_values(["df", "token"], ascending=[False, True],
                                      kind="mergesort").head(vocab_size)
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    vocab = dfreq.map_batches(partial_topv, batch_format="pyarrow").to_pandas()
    vocab = vocab.sort_values(["df", "token"], ascending=[False, True],
                              kind="mergesort").head(vocab_size)
    tokens = vocab["token"].to_numpy(dtype=object)
    order = np.argsort(tokens)
    sorted_tokens = tokens[order]
    idf = np.log(float(n_docs) / vocab["df"].to_numpy(dtype=np.float64))[order]
    ref = ray.put((sorted_tokens, idf))
    scale = 10.0 ** round_decimals

    def score(batch: pa.Table) -> pa.Table:
        """Vectorized per-doc tf + vocab lookup + top-k: ONE Arrow
        space-split over the batch, per-(row, token) counts from one
        np.unique pass, vocab probed once per DISTINCT token, and the
        per-doc (-score, token) top-k via a single lexsort + segmented
        rank (token order == vocab-position order since the broadcast
        vocab is alphabetically sorted) — no per-row Python."""
        import pyarrow.compute as pc

        toks, idfs = worker_state(ref, lambda: ray.get(ref))
        ids = batch.column(doc_col)
        empty = pa.table({doc_col: pa.array([], ids.type),
                          "token": pa.array([], pa.string()),
                          "tfidf": pa.array([], pa.float64())})
        dictionary, codes, row = _space_token_codes(batch.column(text_col))
        if len(row) == 0:
            return empty
        codes = codes.astype(np.int64)
        uniq = np.asarray(dictionary.to_pylist(), dtype=object)
        pos_u = np.clip(np.searchsorted(toks, uniq), 0, len(toks) - 1)
        hit_u = toks[pos_u] == uniq
        nu = np.int64(len(uniq))
        ukey, tf = np.unique(row * nu + codes, return_counts=True)
        urow, ucode = ukey // nu, ukey % nu
        m = hit_u[ucode]
        if not m.any():
            return empty
        urow, tf, pz = urow[m], tf[m], pos_u[ucode[m]]
        sc = np.floor(tf.astype(np.float64) * idfs[pz] * scale + 0.5) / scale
        order = np.lexsort((pz, -sc, urow))
        urow, pz, sc = urow[order], pz[order], sc[order]
        starts = np.flatnonzero(np.r_[True, urow[1:] != urow[:-1]])
        seg = np.diff(np.r_[starts, len(urow)])
        rank = np.arange(len(urow), dtype=np.int64) - np.repeat(starts, seg)
        sel = rank < per_doc
        return pa.table({
            doc_col: ids.take(pa.array(urow[sel])),
            "token": pa.array(toks[pz[sel]], pa.string()),
            "tfidf": pa.array(sc[sel], pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# PII-style scrub patterns: RE2 syntax, applied in ORDER (emails
# before numbers so an address's digits don't half-match).  The engine
# runs them through pyarrow.compute.replace_substring_regex — the same
# RE2 engine DuckDB's regexp_replace uses, so the SQL oracle is
# bit-identical by construction.
SCRUB_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\d{7,}", "<NUM>"),
)


def scrub_stage(batch: pa.Table, text_col: str = "text",
                patterns=SCRUB_PATTERNS) -> pa.Table:
    """Curation scrub: mask email addresses, IPv4 literals, and long
    digit runs with fixed tokens — one vectorized RE2 pass per
    pattern, no Python row loop."""
    import pyarrow.compute as pc

    col = batch.column(text_col)
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    for pat, rep in patterns:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
    return batch.set_column(batch.schema.get_field_index(text_col),
                            "scrubbed_" + text_col, col)


def scrub_op(ds, text_col: str = "text", patterns=SCRUB_PATTERNS):
    return ds.map_batches(lambda b: scrub_stage(b, text_col, patterns),
                          batch_format="pyarrow")


def url_parse_stage(batch: pa.Table, url_col: str = "url",
                    keep: tuple = ()) -> pa.Table:
    """Parse + canonicalize a URL column (kernels.urlkit): appends
    scheme/host/port/path/query_canon/n_params/reg_domain/url_canon
    plus an ok QA flag.  One RE2 pass + offsets math per batch; only
    rows carrying a query string take the per-row param-sort path."""
    from ..kernels import urlkit as U

    parsed = U.parse_urls(batch.column(url_col))
    out = batch.select(list(keep) or [c for c in batch.column_names if c != url_col])
    for c in ("scheme", "host", "port", "path", "query_canon", "n_params"):
        out = out.append_column(c, parsed.column(c))
    out = out.append_column("reg_domain", U.registered_domain(parsed.column("host")))
    out = out.append_column("url_canon", U.canonical_url(parsed))
    return out.append_column("url_ok", parsed.column("ok"))


def url_parse_op(ds, url_col: str = "url", keep: tuple = ()):
    return ds.map_batches(lambda b: url_parse_stage(b, url_col, keep),
                          batch_format="pyarrow")


def gopher_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-rule quality signals + keep/reasons per document
    (kernels.textkit.gopher_stats — one RE2 count per signal, no
    Python row loop)."""
    from ..kernels.textkit import gopher_stats

    for name, arr in gopher_stats(batch.column(text_col)).items():
        batch = batch.append_column(name, arr)
    return batch


def gopher_filter_op(ds, text_col: str = "text", *, keep_only: bool = False):
    out = ds.map_batches(lambda b: gopher_stage(b, text_col),
                         batch_format="pyarrow")
    if keep_only:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda b: b.filter(pc.equal(b.column("gopher_keep"), True)),
            batch_format="pyarrow")
    return out


def _split_segments(col, delimiter: str):
    """Vectorized segment split of a string column: returns
    (flat StringArray of all segments, int64 row offsets, per-row
    counts).  Nulls split as empty text (one empty segment), matching
    SQL string_split(coalesce(text,'')) semantics."""
    import pyarrow.compute as pc

    lst = pc.split_pattern(pc.fill_null(col.cast(pa.string()), ""), delimiter)
    counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = np.r_[0, np.cumsum(counts)]
    return flat, offsets, counts


def segment_df(ds, *, text_col: str = "text", delimiter: str = "\n",
               emit_total: bool = False):
    """Document frequency per SEGMENT (line/paragraph/token): the
    number of DISTINCT documents containing each segment.  One narrow
    pass emits per-block (seg_hash, df_partial) rows over within-doc-
    distinct segments (a document is one row, so per-block distinct is
    globally exact); a bounded groupby sums partials.  Returns a
    Dataset of (seg_hash uint64, df int64) — segments themselves never
    shuffle.

    ``emit_total=True`` adds an ``is_total`` int8 column and one
    flagged row carrying the total document count, folded through the
    SAME pass/shuffle — callers needing a df *fraction* threshold
    (remove_frequent_segments) avoid a second full read of the corpus.
    """
    from ..kernels.hashing import col_hash64
    from .background import HIST_BATCH_ROWS

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets, counts = _split_segments(batch.column(text_col), delimiter)
        h = col_hash64(flat)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        # within-doc distinct (row, hash) pairs
        order = np.lexsort((h, row))
        rs, hs = row[order], h[order]
        keep = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
        seg, df = np.unique(hs[keep], return_counts=True)
        out = {"seg_hash": pa.array(seg, pa.uint64()),
               "df": pa.array(df.astype(np.int64))}
        if emit_total:
            out["seg_hash"] = pa.array(np.r_[seg, np.uint64(0)], pa.uint64())
            out["df"] = pa.array(np.r_[df.astype(np.int64), len(batch)])
            out["is_total"] = pa.array(
                np.r_[np.zeros(len(seg), np.int8), np.int8(1)])
        return pa.table(out)

    # bounded-bucket merge: ONE vectorized reduceat per bucket group
    # instead of a Python pandas call per distinct segment (measured:
    # the per-key map_groups burned ~17 s on a 500-doc corpus purely
    # in per-group dispatch).  Bucket ids oversample partitions 16x so
    # hash partitions stay non-empty (the _window_buckets trick).
    from ..kernels.hashing import splitmix64
    from . import pd_table

    nb = shuffle_partitions()

    def add_bucket(b: pa.Table) -> pa.Table:
        h = b.column("seg_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(h) % np.uint64(16 * nb)).astype(np.int64)
        return b.append_column("bk", pa.array(bk))

    def merge_bucket(g):
        import pandas as pd

        h = g["seg_hash"].to_numpy().astype(np.uint64)
        d = g["df"].to_numpy().astype(np.int64)
        if emit_total:
            t = g["is_total"].to_numpy().astype(np.int8)
            order = np.lexsort((h, t))
            h, d, t = h[order], d[order], t[order]
            starts = np.flatnonzero(
                np.r_[True, (h[1:] != h[:-1]) | (t[1:] != t[:-1])])
            out = {"seg_hash": h[starts],
                   "df": np.add.reduceat(d, starts),
                   "is_total": t[starts]}
        else:
            order = np.argsort(h, kind="mergesort")
            h, d = h[order], d[order]
            starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
            out = {"seg_hash": h[starts], "df": np.add.reduceat(d, starts)}
        return pd_table(pd.DataFrame(out))

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=HIST_BATCH_ROWS)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bk", num_partitions=nb)
            .map_groups(merge_bucket, batch_format="pandas"))


def remove_frequent_segments(ds, *, text_col: str = "text",
                             id_col: str = "doc_id", delimiter: str = "\n",
                             min_df: int = 2, max_df_frac: float | None = None,
                             mode: str = "auto", broadcast_max: int = 2_000_000):
    """Cross-document frequent-segment removal — CCNet/C4-style
    paragraph/line dedup (``delimiter='\\n'``) or df-based boilerplate
    token pruning (``delimiter=' '``): drop every segment that occurs
    in >= threshold DISTINCT documents, preserving the order of the
    surviving segments.  threshold = max(min_df, ceil(max_df_frac *
    n_docs)) when ``max_df_frac`` is given, else ``min_df``.

    Scale shape: pass 1 is ``segment_df`` (hash partials only; bounded
    groupby).  Pass 2 gathers the FREQUENT set — the boilerplate
    vocabulary, far smaller than the corpus: broadcast via one
    ``ray.put`` when its measured count <= ``broadcast_max`` (docs
    never shuffle), else the exploded (id, ord, segment) triples
    hash-left-join the frequent table and reassemble per doc
    (``collect_sorted``) — the adversarial path where boilerplate
    vocabulary itself is huge.  Output: (id_col, text_clean,
    n_removed); a doc whose segments all drop keeps text_clean=''.

    Reference analog: none (web-curation requirement); the gather
    pattern mirrors ops/detect.py's broadcast-vs-join auto switch.
    """
    import pyarrow.compute as pc
    import ray

    from ..kernels.hashing import col_hash64
    from . import pd_table
    from .workercache import worker_state

    thr = int(min_df)
    if max_df_frac is not None:
        # fold the doc count through the DF pass itself (flagged
        # sentinel row) — a separate ds.count() would re-read the
        # whole corpus just for the threshold
        merged = segment_df(ds, text_col=text_col, delimiter=delimiter,
                            emit_total=True).materialize()
        tot_rows = merged.map_batches(
            lambda b: b.filter(pc.equal(b.column("is_total"), 1)),
            batch_format="pyarrow").take_all()
        total = sum(r["df"] for r in tot_rows)
        thr = max(thr, int(np.ceil(max_df_frac * total)))
        freq = merged.map_batches(
            lambda b: b.filter(pc.and_(
                pc.equal(b.column("is_total"), 0),
                pc.greater_equal(b.column("df"), thr)))
                .select(["seg_hash"]),
            batch_format="pyarrow")
        n_freq = freq.count()
    else:
        freq = segment_df(ds, text_col=text_col, delimiter=delimiter).map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("df"), thr))
                       .select(["seg_hash"]),
            batch_format="pyarrow")
        # the frequent set is the boilerplate vocabulary — tiny next to
        # the corpus (and spillable when not); pin it so the count, the
        # gather, and the empty-set guard share one execution
        freq = freq.materialize()
        n_freq = freq.count()
    if n_freq == 0:
        # nothing to remove; Dataset.join would reject the empty side
        def passthrough(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch.column(id_col),
                "text_clean": pc.fill_null(
                    batch.column(text_col).cast(pa.string()), ""),
                "n_removed": pa.array(np.zeros(len(batch), np.int64)),
            })

        return ds.select_columns([id_col, text_col]).map_batches(
            passthrough, batch_format="pyarrow")
    if mode == "auto":
        mode = "broadcast" if n_freq <= broadcast_max else "join"

    if mode == "broadcast":
        fset = np.sort(np.concatenate(
            [b.column("seg_hash").to_numpy(zero_copy_only=False)
             for b in freq.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.array([], dtype=np.uint64)]))
        ref = ray.put(fset)

        def scrub(batch: pa.Table) -> pa.Table:
            fs = worker_state(ref, lambda: ray.get(ref))
            flat, offsets, counts = _split_segments(batch.column(text_col), delimiter)
            h = col_hash64(flat)
            drop = np.zeros(len(h), dtype=bool)
            if fs.size and len(h):
                idx = np.searchsorted(fs, h)
                idx[idx == fs.size] = 0
                drop = fs[idx] == h
            # vectorized reassembly: filter the flat segments, rebuild
            # list offsets from per-row kept counts, one binary_join
            row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
            n_kept = np.bincount(row[~drop], minlength=len(batch)).astype(np.int64)
            kept_flat = flat.filter(pa.array(~drop))
            lst = pa.ListArray.from_arrays(
                pa.array(np.r_[0, np.cumsum(n_kept)], pa.int32()), kept_flat)
            texts = pc.binary_join(lst, delimiter)
            return pa.table({id_col: batch.column(id_col),
                             "text_clean": texts,
                             "n_removed": pa.array(counts - n_kept)})

        return ds.select_columns([id_col, text_col]).map_batches(
            scrub, batch_format="pyarrow")

    # join mode: explode -> left join frequent marker -> reassemble
    from .relational import collect_sorted, hash_join

    def explode(batch: pa.Table) -> pa.Table:
        flat, offsets, counts = _split_segments(batch.column(text_col), delimiter)
        row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        ords = np.arange(len(flat), dtype=np.int64) - offsets[row]
        ids = batch.column(id_col).take(pa.array(row))
        return pa.table({id_col: ids, "ord": pa.array(ords),
                         "seg": flat,
                         "seg_hash": pa.array(col_hash64(flat), pa.uint64())})

    segs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")
    marked = hash_join(
        segs,
        freq.map_batches(lambda b: b.append_column(
            "_freq", pa.array(np.ones(len(b), dtype=np.int8))),
            batch_format="pyarrow"),
        on="seg_hash", how="left_outer",
        num_partitions=shuffle_partitions())
    kept = marked.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_freq"))),
        batch_format="pyarrow")
    joined = collect_sorted(kept, group_col=id_col, value_col="seg",
                            order_col="ord", sep=delimiter,
                            out_col="text_clean")

    # merge with per-doc totals via union + groupby (NOT Dataset.join:
    # it rejects an empty right side, and a corpus whose segments all
    # drop leaves `joined` empty)
    def totals(batch: pa.Table) -> pa.Table:
        _, _, counts = _split_segments(batch.column(text_col), delimiter)
        return pa.table({id_col: batch.column(id_col),
                         "text_clean": pa.nulls(len(batch), pa.string()),
                         "n": pa.array(np.zeros(len(batch), np.int64)),
                         "n_segs": pa.array(counts)})

    tot = ds.select_columns([id_col, text_col]).map_batches(
        totals, batch_format="pyarrow")
    both = tot.union(joined.map_batches(
        lambda b: pa.table({id_col: b.column(id_col),
                            "text_clean": b.column("text_clean"),
                            "n": b.column("n").cast(pa.int64()),
                            "n_segs": pa.array(np.zeros(len(b), np.int64))}),
        batch_format="pyarrow"))

    # bounded-bucket finish: groups are hash buckets of doc ids, with
    # ONE vectorized segmented pass per bucket — a per-doc map_groups
    # would make a Python pandas call per document (billions of
    # dispatches at corpus scale)
    from ..kernels.hashing import splitmix64

    nb = shuffle_partitions()

    def add_bucket(b: pa.Table) -> pa.Table:
        col = b.column(id_col)
        if pa.types.is_integer(col.type):
            u = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            from ..kernels.hashing import col_hash64

            u = col_hash64(col.cast(pa.string()).combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col)
        bk = (splitmix64(u) % np.uint64(16 * nb)).astype(np.int64)
        return b.append_column("bk", pa.array(bk))

    def finish_bucket(g):
        import pandas as pd

        ids = g[id_col].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        n_segs = g["n_segs"].to_numpy().astype(np.int64)
        txt = g["text_clean"]
        has = txt.notna().to_numpy()
        order = np.argsort(ids, kind="mergesort")
        ids, n, n_segs, has = ids[order], n[order], n_segs[order], has[order]
        txt = txt.iloc[order].reset_index(drop=True)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        n_removed = (np.add.reduceat(n_segs, starts)
                     - np.add.reduceat(n, starts))
        # first non-null text_clean position per doc (or '' when the
        # doc's every segment dropped and no joined row exists)
        pos = np.where(has, np.arange(len(ids)), len(ids))
        first = np.minimum.reduceat(pos, starts)
        texts = np.where(first < len(ids),
                         txt.reindex(np.clip(first, 0, len(ids) - 1)).to_numpy(),
                         "")
        return pd_table(pd.DataFrame({
            id_col: ids[starts],
            "text_clean": texts,
            "n_removed": n_removed,
        }))

    return (both.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bk", num_partitions=nb)
            .map_groups(finish_bucket, batch_format="pandas"))


def compression_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """zlib-ratio + char-entropy quality signals per document (the
    low-entropy/template-spam detectors real curation pipelines gate
    on; RefinedWeb-style)."""
    texts = batch.column(text_col).to_pylist()
    raw, comp, ratio = textkit.compression_stats(texts)
    ent = textkit.char_entropy(texts)
    return (batch.append_column("raw_bytes", pa.array(raw))
                 .append_column("zlib_bytes", pa.array(comp))
                 .append_column("zlib_ratio", pa.array(ratio))
                 .append_column("char_entropy", pa.array(ent)))


def compression_op(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: compression_stage(b, text_col),
                          batch_format="pyarrow")


def _ngram_hashes(batch: pa.Table, text_col: str, n: int):
    """Word n-gram hashes per document, fully vectorized: one split,
    one string hash, then (n-1) order-sensitive hash_combines over
    shifted views.  Returns (row ids int64, ngram hashes uint64,
    per-row total n-gram counts int64)."""
    from ..kernels.hashing import col_hash64, hash_combine

    flat, offsets, counts = _split_segments(batch.column(text_col), " ")
    h = col_hash64(flat)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    if len(h) < n:
        return (np.array([], np.int64), np.array([], np.uint64),
                np.maximum(counts - (n - 1), 0))
    valid = row[: len(row) - n + 1] == row[n - 1:]
    gh = h[: len(h) - n + 1].copy()
    for j in range(1, n):
        gh = hash_combine(gh, h[j: len(h) - n + 1 + j])
    n_ngrams = np.maximum(counts - (n - 1), 0)
    return row[: len(row) - n + 1][valid], gh[valid], n_ngrams


def _dup_ngram_set(ds, *, text_col: str, n: int, min_df: int,
                   broadcast_max: int) -> np.ndarray:
    """Sorted uint64 hashes of every word n-gram occurring in >=
    ``min_df`` distinct documents: per-block within-doc-distinct DF
    partials -> bounded groupby -> filtered gather.  The set is corpus
    boilerplate — bounded; a blowup past ``broadcast_max`` raises
    rather than silently broadcasting GBs."""
    import pyarrow.compute as pc

    from . import pd_table
    from .background import HIST_BATCH_ROWS

    def partial(batch: pa.Table) -> pa.Table:
        row, gh, _ = _ngram_hashes(batch, text_col, n)
        order = np.lexsort((gh, row))
        rs, hs = row[order], gh[order]
        keep = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
        seg, df = np.unique(hs[keep], return_counts=True)
        return pa.table({"ng_hash": pa.array(seg, pa.uint64()),
                         "df": pa.array(df.astype(np.int64))})

    # bounded-bucket DF merge — one vectorized reduceat per bucket,
    # never a Python call per distinct n-gram (same shape as
    # segment_df's merge_bucket)
    from ..kernels.hashing import splitmix64

    nb = shuffle_partitions()

    def add_bucket(b: pa.Table) -> pa.Table:
        h = b.column("ng_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(h) % np.uint64(16 * nb)).astype(np.int64)
        return b.append_column("bk", pa.array(bk))

    def merge_bucket(g):
        import pandas as pd

        h = g["ng_hash"].to_numpy().astype(np.uint64)
        d = g["df"].to_numpy().astype(np.int64)
        order = np.argsort(h, kind="mergesort")
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        return pd_table(pd.DataFrame({"ng_hash": h[starts],
                                      "df": np.add.reduceat(d, starts)}))

    dup = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=HIST_BATCH_ROWS)
           .map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bk", num_partitions=nb)
           .map_groups(merge_bucket, batch_format="pandas")
           .map_batches(lambda b: b.filter(
               pc.greater_equal(b.column("df"), min_df)).select(["ng_hash"]),
               batch_format="pyarrow")).materialize()
    if dup.count() > broadcast_max:
        raise ValueError(
            "duplicated-ngram set exceeds broadcast_max; raise min_df or "
            "n (the set is corpus boilerplate — it should be small)")
    return np.sort(np.concatenate(
        [b.column("ng_hash").to_numpy(zero_copy_only=False)
         for b in dup.iter_batches(batch_format="pyarrow", batch_size=None)]
        or [np.array([], dtype=np.uint64)]))


def dup_ngram_stats(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    n: int = 3, min_df: int = 2,
                    broadcast_max: int = 2_000_000):
    """Cross-document duplicated-n-gram metrics per document — the
    span-level contamination/boilerplate signal (a doc whose word
    n-grams mostly also occur in OTHER docs is templated or copied).

    Pass 1: per-block df partials over within-doc-distinct n-gram
    hashes (n-grams never shuffle as strings) -> bounded groupby ->
    the duplicated set (df >= min_df), gathered by broadcast.
    Pass 2: per-doc membership count.  Output: (id_col, n_ngrams,
    n_dup_ngrams, dup_ngram_frac) where positions count multiplicity
    and frac is NULL for docs with no n-grams.

    Reference analog: none (web-curation requirement; cf. C4's
    duplicated-span removal).
    """
    import ray

    from .workercache import worker_state

    ref = ray.put(_dup_ngram_set(ds, text_col=text_col, n=n, min_df=min_df,
                                 broadcast_max=broadcast_max))

    def score(batch: pa.Table) -> pa.Table:
        s = worker_state(ref, lambda: ray.get(ref))
        row, gh, n_ngrams = _ngram_hashes(batch, text_col, n)
        hit = np.zeros(len(gh), dtype=bool)
        if s.size and len(gh):
            idx = np.searchsorted(s, gh)
            idx[idx == s.size] = 0
            hit = s[idx] == gh
        n_dup = np.bincount(row[hit], minlength=len(batch)).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(n_ngrams > 0, n_dup / n_ngrams, np.nan)
        return pa.table({id_col: batch.column(id_col),
                         "n_ngrams": pa.array(n_ngrams),
                         "n_dup_ngrams": pa.array(n_dup),
                         "dup_ngram_frac": pa.array(frac)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def decontaminate(ds, probes, *, text_col: str = "text",
                  id_col: str = "doc_id", keep_only: bool = False):
    """Benchmark decontamination: flag every document whose text
    contains ANY of the probe strings (eval-set snippets).  The probe
    list is broadcast once; each batch runs one vectorized RE2-free
    substring scan per probe (Arrow match_substring) — probes are a
    bounded blocklist, documents never shuffle.

    Output: input columns + ``contaminated`` bool (or the filtered
    clean corpus when ``keep_only``).
    """
    import pyarrow.compute as pc
    import ray

    from .workercache import worker_state

    probes = [p for p in probes if p]
    ref = ray.put(list(probes))

    def flag(batch: pa.Table) -> pa.Table:
        ps = worker_state(ref, lambda: ray.get(ref))
        t = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        hit = np.zeros(len(batch), dtype=bool)
        for p in ps:
            hit |= pc.match_substring(t, p).to_numpy(zero_copy_only=False)
        out = batch.append_column("contaminated", pa.array(hit))
        if keep_only:
            out = out.filter(pa.array(~hit))
        return out

    return ds.map_batches(flag, batch_format="pyarrow")


def remove_dup_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 3, min_df: int = 2,
                     broadcast_max: int = 2_000_000):
    """C4-style duplicated-span REMOVAL: drop every token covered by a
    word n-gram that occurs in >= ``min_df`` distinct documents, then
    reassemble the survivors in order.  Same two-pass shape as
    ``dup_ngram_stats`` (shared ``_dup_ngram_set``); the cover mask is
    n shifted ORs of the hit vector (a hit at start i covers
    i..i+n-1, always within one document by construction), and
    reassembly is the vectorized binary_join used by
    ``remove_frequent_segments``.  Output: (id_col, text_clean,
    n_removed) with token counts removed per doc.
    """
    import pyarrow.compute as pc
    import ray

    from .workercache import worker_state

    ref = ray.put(_dup_ngram_set(ds, text_col=text_col, n=n, min_df=min_df,
                                 broadcast_max=broadcast_max))

    def scrub(batch: pa.Table) -> pa.Table:
        s = worker_state(ref, lambda: ray.get(ref))
        flat, offsets, counts = _split_segments(batch.column(text_col), " ")
        row, gh, _ = _ngram_hashes(batch, text_col, n)
        hit = np.zeros(len(gh), dtype=bool)
        if s.size and len(gh):
            idx = np.searchsorted(s, gh)
            idx[idx == s.size] = 0
            hit = s[idx] == gh
        covered = np.zeros(len(flat), dtype=bool)
        rall = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        if hit.any():
            # _ngram_hashes returns only VALID starts (row-aligned);
            # map them back to flat token positions
            all_pos = np.arange(len(flat) - n + 1)
            valid = rall[: len(rall) - n + 1] == rall[n - 1:]
            pos = all_pos[valid][hit]
            for j in range(n):
                covered[pos + j] = True
        drop = covered
        n_kept = (np.bincount(rall[~drop], minlength=len(batch)).astype(np.int64)
                  if len(rall) else np.zeros(len(batch), np.int64))
        kept_flat = flat.filter(pa.array(~drop))
        lst = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(n_kept)], pa.int32()), kept_flat)
        return pa.table({id_col: batch.column(id_col),
                         "text_clean": pc.binary_join(lst, " "),
                         "n_removed": pa.array(counts - n_kept)})

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pyarrow")


def ngram_count(ds, *, text_col: str = "text", n: int = 3,
                top_k: int | None = None):
    """Corpus n-gram phrase counts (position multiplicity), the
    phrase-mining analog of ``vocab_count``: n-gram STRINGS are built
    vectorized (one split + (n-1)-way binary_join_element_wise over
    shifted views, row-boundary masked), per-batch dict partials
    pre-aggregate before the shuffle, bounded groupby sum, optional
    streaming top-k by (count desc, ngram asc)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .background import HIST_BATCH_ROWS

    def partial(batch: pa.Table) -> pa.Table:
        flat, offsets, counts = _split_segments(batch.column(text_col), " ")
        L = len(flat)
        if L < n:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        valid = row[: L - n + 1] == row[n - 1:]
        shifted = [flat.slice(j, L - n + 1) for j in range(n)]
        grams = pc.binary_join_element_wise(*shifted, " ")
        grams = grams.filter(pa.array(valid))
        vc = grams.value_counts()
        return pa.table({"ngram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    merged = (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=HIST_BATCH_ROWS)
              .groupby("ngram", num_partitions=shuffle_partitions())
              .aggregate(Sum("n", alias_name="n")))
    merged = merged.map_batches(
        lambda b: pa.table({"ngram": b.column("ngram"),
                            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow")
    if top_k is None:
        return merged

    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n", "ngram"],
                                       ascending=[False, True],
                                       kind="mergesort").head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    df = merged.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["n", "ngram"], ascending=[False, True],
                        kind="mergesort").head(top_k)
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df.reset_index(drop=True),
                                              preserve_index=False))


def extract_links(ds, *, html_col: str = "html", id_col: str = "doc_id"):
    """Outlink extraction from raw HTML — the crawl-graph op: one
    vectorized pass per batch, no per-row Python.  Arrow has no
    extract_regex_ALL kernel, so matches come from two split_pattern
    passes: split on ``href="`` (every element after the first starts
    with a URL), then a max_splits=1 split on the closing quote.
    Output: (id_col, link_ord, href) — one row per anchor, in document
    order."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        h = batch.column(html_col)
        if pa.types.is_binary(h.type) or pa.types.is_large_binary(h.type):
            h = h.cast(pa.large_string() if pa.types.is_large_binary(h.type)
                       else pa.string())
        lst = pc.split_pattern(pc.fill_null(h, ""), 'href="')
        counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        pos = np.arange(len(flat), dtype=np.int64) - np.r_[
            0, np.cumsum(counts)][row]
        m = pos > 0
        sel = flat.filter(pa.array(m))
        href = pc.list_element(pc.split_pattern(sel, '"', max_splits=1), 0)
        ids = batch.column(id_col).take(pa.array(row[m]))
        return pa.table({id_col: ids,
                         "link_ord": pa.array(pos[m] - 1),
                         "href": href})

    return ds.map_batches(f, batch_format="pyarrow")


def unigram_logprob_op(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       broadcast_max: int = 5_000_000, round_dp: int = 9,
                       oov_logprob: float | None = None):
    """Per-document mean unigram log-probability — the CCNet-style
    LM-perplexity proxy for corpus quality gating (a doc whose tokens
    are all corpus-typical scores high; gibberish/rare-token spam
    scores low).  p(w) = corpus occurrence MLE.

    Pass 1 (one bucketed shuffle of HASH partials — token strings
    never shuffle): per-block (token_hash, count) occurrence partials
    with the corpus token TOTAL folded through the same pass as a
    flagged sentinel row; bucketed vectorized merge.  The vocabulary
    table (bounded; guarded by ``broadcast_max``) becomes a broadcast
    (sorted hashes, logprob) pair.  Pass 2: per-doc searchsorted
    gather + segmented mean.  Scores are rounded to ``round_dp`` on
    both engine and oracle sides (duplicate texts are analytically
    equal; summation-order ulps must not flip the driver's sorted
    hash).

    Reference analog: none (web-curation requirement; cf. CCNet's
    LM-based quality buckets).
    """
    import ray

    from ..kernels.hashing import col_hash64, splitmix64
    from . import pd_table
    from .background import HIST_BATCH_ROWS
    from .workercache import worker_state

    nb = shuffle_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, counts = _split_segments(batch.column(text_col), " ")
        h = col_hash64(flat)
        uh, c = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(np.r_[uh, np.uint64(0)], pa.uint64()),
            "n": pa.array(np.r_[c.astype(np.int64), len(h)]),
            "is_total": pa.array(np.r_[np.zeros(len(uh), np.int8), np.int8(1)]),
        })

    def add_bucket(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(h) % np.uint64(16 * nb)).astype(np.int64)
        return b.append_column("bk", pa.array(bk))

    def merge_bucket(g):
        import pandas as pd

        h = g["h"].to_numpy().astype(np.uint64)
        n = g["n"].to_numpy().astype(np.int64)
        t = g["is_total"].to_numpy().astype(np.int8)
        order = np.lexsort((h, t))
        h, n, t = h[order], n[order], t[order]
        starts = np.flatnonzero(np.r_[True, (h[1:] != h[:-1]) | (t[1:] != t[:-1])])
        return pd_table(pd.DataFrame({"h": h[starts],
                                      "n": np.add.reduceat(n, starts),
                                      "is_total": t[starts]}))

    vocab = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=HIST_BATCH_ROWS)
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bk", num_partitions=nb)
             .map_groups(merge_bucket, batch_format="pandas")).materialize()
    n_vocab = vocab.count()
    if n_vocab > broadcast_max:
        raise ValueError("vocabulary exceeds broadcast_max; hash-join the "
                         "scores instead of broadcasting")
    parts_h, parts_n, total = [], [], 0
    for b in vocab.iter_batches(batch_format="pyarrow", batch_size=None):
        h = b.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column("is_total").to_numpy(zero_copy_only=False).astype(np.int8)
        total += int(n[t == 1].sum())
        parts_h.append(h[t == 0])
        parts_n.append(n[t == 0])
    vh = np.concatenate(parts_h) if parts_h else np.empty(0, np.uint64)
    vn = np.concatenate(parts_n) if parts_n else np.empty(0, np.int64)
    order = np.argsort(vh, kind="mergesort")
    vh, vn = vh[order], vn[order]
    logp = np.log(vn.astype(np.float64)) - np.log(float(max(total, 1)))
    ref = ray.put((vh, logp))

    def score(batch: pa.Table) -> pa.Table:
        kh, kp = worker_state(ref, lambda: ray.get(ref))
        flat, _, counts = _split_segments(batch.column(text_col), " ")
        h = col_hash64(flat)
        idx = np.searchsorted(kh, h)
        idx = np.clip(idx, 0, max(len(kh) - 1, 0))
        lp = kp[idx] if len(kh) else np.zeros(len(h))
        # tokens of the corpus the vocab was BUILT from always hit by
        # construction, but reuse on a different dataset must not
        # silently score OOV tokens with a neighboring hash's logprob
        if len(kh):
            miss = kh[idx] != h
            if miss.any():
                if oov_logprob is None:
                    raise ValueError(
                        f"unigram_logprob_op: {int(miss.sum())} tokens not in "
                        "the vocabulary this op was built from; pass "
                        "oov_logprob=<floor> to score a different corpus")
                lp = np.where(miss, oov_logprob, lp)
        offsets = np.r_[0, np.cumsum(counts)]
        sums = np.add.reduceat(np.r_[lp, 0.0], offsets[:-1])
        sums[counts == 0] = 0.0
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(counts > 0, sums / counts, np.nan)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(counts),
            "logprob": pa.array(np.round(mean, round_dp)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
