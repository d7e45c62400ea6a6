import duckdb
import numpy as np
import pyarrow as pa

from filda_ray.kernels import hashing, stats, textkit
from filda_ray.sources import pages as P


def test_median_mad_matches_duckdb():
    rng = np.random.RandomState(0)
    v = rng.randn(101) * 7 + 3
    med, mad = stats.median_mad(v)
    con = duckdb.connect()
    con.register("t", pa.table({"x": v}))
    smed, smad = con.sql("select median(x), mad(x) from t").fetchone()
    assert med == float(smed)
    assert mad == float(smad)
    # even count interpolation too
    v2 = v[:100]
    med2, mad2 = stats.median_mad(v2)
    con.register("t2", pa.table({"x": v2}))
    smed2, smad2 = con.sql("select median(x), mad(x) from t2").fetchone()
    assert med2 == float(smed2) and mad2 == float(smad2)


def test_trimmed_low_mean():
    v = np.arange(100, dtype=np.float64)
    m, k = stats.trimmed_low_mean(v, 0.25)
    assert k == 25 and m == np.mean(np.arange(25))
    m1, k1 = stats.trimmed_low_mean(np.array([5.0]), 0.25)
    assert k1 == 1 and m1 == 5.0


def test_low_quantile_threshold_clamp():
    v = np.linspace(0, 1, 1000)
    thr = stats.low_quantile_threshold(v, 0.01, floor=4.0)
    assert thr == 4.0  # clamp wins (FILDA.py:188-190 semantics)


def test_gamma_log_moment_recovers_params():
    rng = np.random.RandomState(1)
    v = rng.gamma(shape=3.0, scale=2.0, size=200000)
    a, b = stats.gamma_log_moment(v)
    assert abs(a - 3.0) < 0.05
    assert abs(b - 2.0) < 0.05


def test_moment_partial_combine():
    rng = np.random.RandomState(2)
    v = rng.gamma(2.0, 1.5, size=10000)
    parts = [stats.moment_partial(c) for c in np.array_split(v, 7)]
    merged = np.sum(parts, axis=0)
    merged[3] = min(p[3] for p in parts)
    merged[4] = max(p[4] for p in parts)
    fin = stats.moment_finalize(merged)
    assert fin["n"] == 10000
    assert np.isclose(fin["mean"], v.mean())
    assert np.isclose(fin["std"], v.std(ddof=1))
    a, _ = stats.gamma_log_moment(v)
    assert np.isclose(fin["alpha"], a, rtol=1e-10)


def test_md5_matches_duckdb():
    vals = ["", "abc", "hello world", "ünïcode"]
    got = hashing.md5_hex(vals)
    con = duckdb.connect()
    for v, g in zip(vals, got):
        assert con.sql("select md5(?)", params=[v]).fetchone()[0] == g


def test_extract_text_inverts_render():
    texts = ["hello world", "", "a b c 123", "tokens & more <notag"]
    # '<' in text would break any html round trip; synthesis corpus has none
    texts[3] = "tokens & more notag"
    host = np.zeros(len(texts), dtype=np.int64)
    html = P.render_html(host, texts)
    out = textkit.extract_text(html)
    assert list(out) == texts  # byte-identical per-row invariant


def test_token_counts_matches_split():
    texts = ["a b c", "one", ""]
    assert textkit.token_counts(texts).tolist() == [3, 1, 0]
    # RE2 kernel == per-row findall on punctuation/None/unicode edges
    import re as _re

    edge = ["a,b;c", "x--y", None, "héllo thé 42", "  ", "a1b2 c3", "ALL CAPS"]
    want = [0 if t is None else len(_re.findall(r"[A-Za-z0-9]+", t))
            for t in edge]
    assert textkit.token_counts(edge).tolist() == want


def test_lang_id_matches_per_row_reference():
    """Vectorized lang_id == the per-row token-set reference (distinct
    stopword hits, highest-count-then-alphabetical tie-break),
    including ties, unicode-adjacent tokens, and no-evidence docs."""
    import re as _re

    def ref_one(t):
        if not t:
            return "und"
        toks = set(w.lower() for w in _re.findall(r"[A-Za-z0-9]+", t))
        best = ("und", 0)
        for lang in sorted(textkit._LANG_PROFILES):
            hits = len(toks & textkit._LANG_PROFILES[lang])
            if hits > best[1]:
                best = (lang, hits)
        return best[0]

    texts = [
        "the cat and the dog of it is that for",          # en
        "der die und das ist nicht",                      # de
        "le la et les des est",                           # fr
        "el que y en los una por",                        # es (overlaps fr/pt)
        "o de que e em um uma",                           # pt
        "il di che la per una",                           # it
        "de la le el o",                                  # cross-language tie
        "THE AND OF",                                     # case folding
        "thé theé the2 the",                         # unicode/digit bounds
        "no stopwords here xyzzy quux",
        "", None, "   ", "42 1999 2024",
        "the de le el il o",                              # 1-hit everywhere tie
    ]
    got = textkit.lang_id(texts)
    want = [ref_one(t) for t in texts]
    assert list(got) == want


def test_minhash_jaccard_estimate():
    a, b = textkit.minhash_params(128)
    t1 = "the quick brown fox jumps over the lazy dog " * 20
    t2 = "the quick brown fox leaps over the lazy dog " * 20
    h1, h2 = textkit.shingle_hashes(t1), textkit.shingle_hashes(t2)
    true_j = textkit.jaccard(h1, h2)
    s1 = textkit.minhash_signature(h1, a, b)
    s2 = textkit.minhash_signature(h2, a, b)
    est = float(np.mean(s1 == s2))
    assert abs(est - true_j) < 0.15
    # identical docs -> identical signatures -> identical bands
    assert np.array_equal(
        textkit.minhash_bands(s1, 16), textkit.minhash_bands(textkit.minhash_signature(h1, a, b), 16)
    )


def test_vectorized_text_kernels_match_scalar_twins():
    """The batch fingerprint/simhash/quality kernels (one Arrow
    tokenize + segmented numpy reductions) must be BIT-identical to
    their per-row scalar twins on edge-case-heavy input."""
    import pyarrow as pa

    texts = [
        "the quick brown fox jumps over the lazy dog 123",
        "", None, "!!!", "   ", "a", "a a a b b c",
        "word1 word2-word3,word4;word1",
        "Digits 007 and 42 mixed with text 3.14159",
        "repeat repeat repeat repeat",
        "tab\tseparated\nnewline lines\nlines",
        "CaseSensitive casesensitive CASESENSITIVE",
        "trailing punctuation!", "!leading", "mid!!dle",
        "unicode café straße 中文 123 mixed",
        "x" * 500 + " " + "y z " * 50,
    ]
    for inp in (texts, pa.array(texts, pa.string())):
        assert np.array_equal(textkit.fingerprint64(inp),
                              textkit._fingerprint64_ref(texts))
        assert np.array_equal(textkit.simhash64(inp),
                              textkit._simhash64_ref(texts))
        ref = textkit._quality_features_ref(texts)
        for k, v in textkit.quality_features(inp).items():
            assert np.allclose(v, ref[k]), k


def test_batch_shingles_and_minhash_match_scalar():
    """shingle_hashes_batch / minhash_signature_matrix are bit-identical
    per row to the scalar shingle_hashes / minhash_signature pair, for
    every shingle width and the short/empty edge rows."""
    texts = ["the quick brown fox jumps over the lazy dog and runs far " * 8,
             "", None, "one", "one two", "one two three", "a b c d e f g",
             "dup dup dup dup dup", "!!!", "x y",
             "breaking news boilerplate header footer " * 5 + "tail7"]
    a, b = textkit.minhash_params(128, 1)
    for w in (1, 2, 3, 5):
        flat, off = textkit.shingle_hashes_batch(texts, w)
        for i, t in enumerate(texts):
            assert np.array_equal(flat[off[i]:off[i + 1]],
                                  textkit.shingle_hashes(t or "", w)), (w, i)
    flat, off = textkit.shingle_hashes_batch(texts, 3)
    sigs = textkit.minhash_signature_matrix(flat, off, a, b)
    for i, t in enumerate(texts):
        assert np.array_equal(
            sigs[i], textkit.minhash_signature(
                textkit.shingle_hashes(t or "", 3), a, b)), i


def test_simhash_similarity():
    t1 = ["alpha beta gamma delta epsilon zeta eta theta"] * 1
    t2 = ["alpha beta gamma delta epsilon zeta eta iota"]
    t3 = ["completely different words entirely unrelated text here now"]
    s1, s2, s3 = textkit.simhash64(t1)[0], textkit.simhash64(t2)[0], textkit.simhash64(t3)[0]
    d12 = textkit.hamming64(np.array([s1]), np.array([s2]))[0]
    d13 = textkit.hamming64(np.array([s1]), np.array([s3]))[0]
    assert d12 < d13


def test_qa_pack_unpack_inverse():
    from filda_ray.kernels import qa

    rng = np.random.RandomState(3)
    flags = {k: rng.rand(50) > 0.5 for k in qa.QA_BITS}
    packed = qa.qa_pack(flags)
    unpacked = qa.qa_unpack(packed)
    for k in flags:
        assert np.array_equal(flags[k], unpacked[k])


def test_grouped_weighted_median_mad_vs_bruteforce():
    from filda_ray.kernels.stats import grouped_weighted_median_mad, median_mad

    rng = np.random.RandomState(9)
    for _ in range(20):
        n = rng.randint(1, 60)
        owner = rng.randint(0, 6, n)
        values = rng.randint(0, 30, n).astype(np.float64)
        counts = rng.randint(1, 5, n)
        med, mad, tot = grouped_weighted_median_mad(owner, values, counts, 6)
        for g in range(6):
            sel = owner == g
            exp = np.repeat(values[sel], counts[sel])
            if exp.size == 0:
                assert np.isnan(med[g]) and np.isnan(mad[g]) and tot[g] == 0
            else:
                m, d = median_mad(exp)
                assert med[g] == m and mad[g] == d and tot[g] == exp.size


def test_grouped_weighted_kernels_ignore_zero_counts():
    """Zero-count histogram rows must not poison segment boundaries:
    results equal those with the zero rows removed, and an owner whose
    rows are ALL zero-count gets the empty-owner (nan, nan, 0)."""
    from filda_ray.kernels.stats import (grouped_weighted_low_mean,
                                         grouped_weighted_median_mad)

    owner = np.array([0, 0, 0, 1, 1, 2])
    values = np.array([5.0, 7.0, 9.0, 3.0, 4.0, 8.0])
    counts = np.array([2, 0, 1, 0, 0, 3])
    med, mad, tot = grouped_weighted_median_mad(owner, values, counts, 3)
    m2, d2, t2 = grouped_weighted_median_mad(
        np.array([0, 0, 2]), np.array([5.0, 9.0, 8.0]), np.array([2, 1, 3]), 3)
    assert np.array_equal(med, m2, equal_nan=True)
    assert np.array_equal(mad, d2, equal_nan=True)
    assert np.array_equal(tot, t2)
    assert np.isnan(med[1]) and tot[1] == 0  # all-zero owner -> empty
    mean, k = grouped_weighted_low_mean(owner, values, counts, 3, frac=0.5)
    mn2, k2 = grouped_weighted_low_mean(
        np.array([0, 0, 2]), np.array([5.0, 9.0, 8.0]), np.array([2, 1, 3]), 3,
        frac=0.5)
    assert np.array_equal(mean, mn2, equal_nan=True)
    assert np.array_equal(k, k2)


def test_grouped_weighted_low_mean_vs_bruteforce():
    from filda_ray.kernels.stats import grouped_weighted_low_mean, trimmed_low_mean

    rng = np.random.RandomState(10)
    for _ in range(20):
        n = rng.randint(1, 60)
        owner = rng.randint(0, 5, n)
        values = rng.randint(0, 40, n).astype(np.float64)
        counts = rng.randint(1, 4, n)
        mean, k = grouped_weighted_low_mean(owner, values, counts, 5, frac=0.25)
        for g in range(5):
            exp = np.repeat(values[owner == g], counts[owner == g])
            if exp.size == 0:
                assert np.isnan(mean[g]) and k[g] == 0
            else:
                m, kk = trimmed_low_mean(exp, 0.25)
                assert mean[g] == m and k[g] == kk


def test_line_stats_edge_cases():
    from filda_ray.kernels.textkit import line_stats

    texts = [
        "a\nb\na\na",        # 4 lines, 2 distinct, 'a' x3
        "",                  # one empty line
        None,                # sentinel
        "x",                 # single line
        "\n",                # two empty lines (dup)
    ]
    n, d, mx = line_stats(texts)
    assert list(n) == [4, 1, -1, 1, 2]
    assert list(d) == [2, 1, -1, 1, 1]
    assert list(mx) == [3, 1, -1, 1, 2]
    # matches a brute-force python oracle on random junk
    rng = np.random.RandomState(3)
    docs = ["\n".join(rng.choice(["p", "q", "rr", ""], size=rng.randint(1, 9)))
            for _ in range(50)]
    n, d, mx = line_stats(docs)
    for i, t in enumerate(docs):
        lines = t.split("\n")
        assert n[i] == len(lines)
        assert d[i] == len(set(lines))
        assert mx[i] == max(lines.count(l) for l in set(lines))


def test_grouped_weighted_quantiles_matches_numpy():
    """Linear-interpolated grouped quantiles over histogram multisets
    equal numpy's 'linear' quantile on the expanded raw values."""
    import collections

    import numpy as np

    from filda_ray.kernels.stats import grouped_weighted_quantiles

    rng = np.random.default_rng(41)
    for _ in range(25):
        n = int(rng.integers(1, 300))
        o = rng.integers(0, 5, n)
        v = rng.integers(0, 25, n).astype(float)
        rows = collections.Counter(zip(o, v))
        oo = np.array([k[0] for k in rows], dtype=np.int64)
        vv = np.array([k[1] for k in rows], dtype=float)
        cc = np.array(list(rows.values()), dtype=np.int64)
        probs = [0.0, 0.1, 0.5, 0.9, 1.0]
        got = grouped_weighted_quantiles(oo, vv, cc, 5, probs)
        for g in range(5):
            vals = v[o == g]
            if len(vals) == 0:
                assert np.isnan(got[g]).all()
            else:
                assert np.array_equal(got[g], np.quantile(vals, probs))


def test_scrub_stage_masks_pii_shapes():
    import pyarrow as pa

    from filda_ray.ops.text import scrub_stage

    t = pa.table({"text": pa.array([
        "mail bob.smith+x@sub.example.org now",
        "server at 192.168.001.1 port",
        "call 12345678 or 1234567890 x",
        "short 123456 stays",  # 6 digits < production threshold
        None,
    ], pa.large_string())})
    out = scrub_stage(t, "text").column("scrubbed_text").to_pylist()
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "server at <IP> port"
    assert out[2] == "call <NUM> or <NUM> x"
    assert out[3] == "short 123456 stays"
    assert out[4] is None


def test_urlkit_parse_and_canonicalize():
    """URL kernels vs urllib.parse ground truth + documented contract:
    case folding, default-port strip, tracking-param removal, token
    sort, fragment drop, empty path, unparsable-row QA."""
    import pyarrow as pa

    from filda_ray.kernels import urlkit as U

    urls = pa.array([
        "HTTP://WWW.Host12.Example.COM:80/articles/3?utm_source=f&b=2&a=1#s1",
        "https://host5.sample.co.uk/",
        "http://h.data.net",
        "https://h.x.org:8080/p/q?a=1&gclid=z",
        "https://h.x.org:443?fbclid=1&z=9&y=8",
        "ftp://files.example.com:21/pub",
        None,
        "not a url",
        "http://solo",                        # single-label host
    ])
    p = U.parse_urls(urls)
    canon = U.canonical_url(p).to_pylist()
    assert canon == [
        "http://www.host12.example.com/articles/3?a=1&b=2",
        "https://host5.sample.co.uk/",
        "http://h.data.net/",
        "https://h.x.org:8080/p/q?a=1",
        "https://h.x.org/?y=8&z=9",
        "ftp://files.example.com:21/pub",     # non-http default unknown: kept
        None, None,
        "http://solo/",
    ]
    assert p.column("ok").to_pylist() == [True] * 6 + [False, False, True]
    assert p.column("n_params").to_pylist() == [2, 0, 0, 1, 2, 0, None, None, 0]
    assert p.column("port").to_pylist() == [None, None, None, 8080, None, 21,
                                            None, None, None]
    # cross-check components against urllib on the parsable rows
    from urllib.parse import urlsplit

    for raw, sch, host, path in zip(urls.to_pylist(), p.column("scheme").to_pylist(),
                                    p.column("host").to_pylist(),
                                    p.column("path").to_pylist()):
        if raw is None or " " in raw:
            continue
        s = urlsplit(raw)
        assert sch == s.scheme.lower()
        assert host == s.hostname
        assert path == (s.path or "/")
    rd = U.registered_domain(p.column("host")).to_pylist()
    assert rd == ["example.com", "sample.co.uk", "data.net", "x.org", "x.org",
                  "example.com", None, None, None]


def test_gopher_stats_rules():
    """Gopher-rule signals on hand-built texts: each rule trips on its
    own bit; keep only when all pass; null text -> keep False."""
    import pyarrow as pa

    from filda_ray.kernels.textkit import gopher_stats

    good = ("the quick brown fox and the lazy dog have fun in a field of "
            "green grass with many other animals that play games ") * 3
    short = "the cat and a dog have fun"                    # rule 0: < 50 words
    symbols = ("the word and # of # hash # tags # with # a # b # c # d # e "
               "# f # g # h # i # j # k # l # m # n # o # p # q # r # s # t "
               "# u # v # w # x # y # z # aa # bb # cc # dd # ee ")  # rule 2
    nostop = " ".join(f"word{i} tokenlike{i}" for i in range(30))     # rule 6
    bullets = "\n".join("- item %d the fox and a dog have it" % i
                        for i in range(20))                 # rule 3 (100% bullets)
    s = gopher_stats(pa.array([good, short, symbols, nostop, bullets, None]))
    reasons = s["gopher_reasons"].to_pylist()
    keep = s["gopher_keep"].to_pylist()
    assert keep == [True, False, False, False, False, False]
    assert reasons[0] == 0
    assert reasons[1] & 1            # word count
    assert reasons[2] & 4            # symbol ratio
    assert reasons[3] & 64           # stopwords
    assert reasons[4] & 8            # bullet lines
    assert reasons[5] is None
    # signal values agree with direct python computation on `good`
    toks = good.split()
    assert s["n_words"].to_pylist()[0] == len(toks)
    assert abs(s["mean_word_len"].to_pylist()[0]
               - sum(map(len, toks)) / len(toks)) < 1e-12
