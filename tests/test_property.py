"""Property-based tests (hypothesis) for the pure kernels
(SURVEY.md §5 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from filda_ray.kernels import cells, qa, s2
from filda_ray.ops.background import _weighted_median


finite_lat = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
finite_lon = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(finite_lat, finite_lon)
def test_hex_containment_roundtrip(lat, lon):
    cell = cells.hex_cell(np.array([lat]), np.array([lon]))
    res, q, r = cells.hex_unpack(cell)
    clat, clon = cells.hex_center(q, r, int(res[0]))
    assert np.array_equal(cells.hex_cell(clat, clon), cell)


@settings(max_examples=200, deadline=None)
@given(finite_lat, finite_lon)
def test_s2_parent_consistency(lat, lon):
    la, lo = np.array([lat]), np.array([lon])
    c12 = s2.s2_cell(la, lo, 12)
    for lvl in (10, 6, 2):
        assert np.array_equal(s2.s2_parent(c12, lvl), s2.s2_cell(la, lo, lvl))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.booleans(), min_size=len(qa.QA_BITS), max_size=len(qa.QA_BITS)))
def test_qa_roundtrip(bits):
    flags = {name: np.array([b]) for name, b in zip(qa.QA_BITS, bits)}
    packed = qa.qa_pack(flags)
    unpacked = qa.qa_unpack(packed)
    for name in flags:
        assert unpacked[name][0] == flags[name][0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=50),
                          st.integers(min_value=1, max_value=5)),
                min_size=1, max_size=30))
def test_weighted_median_equals_expanded(pairs):
    values = np.array([float(v) for v, _ in pairs])
    counts = np.array([c for _, c in pairs], dtype=np.int64)
    order = np.argsort(values, kind="mergesort")
    got = _weighted_median(values[order], counts[order])
    want = float(np.median(np.repeat(values, counts)))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<",
                                      blacklist_categories=("Cs",)),
               max_size=300))
def test_extract_invariant_property(text):
    """render -> extract is byte-identical for any '<'-free text
    (the per-row invariant, property form)."""
    import numpy as np

    from filda_ray.kernels.textkit import extract_text, extract_text_arrow
    from filda_ray.sources.pages import render_html

    html = render_html(np.array([7]), [text])
    assert extract_text(html)[0] == text
    import pyarrow as pa

    assert extract_text_arrow(pa.array(list(html), pa.binary()))[0].as_py() == text


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(max_size=120), min_size=1, max_size=8))
def test_extract_invalid_utf8_paths_agree(payloads):
    """Arbitrary bytes — including invalid UTF-8 — through both
    extraction paths: the Arrow kernel must never raise and must stay
    byte-identical to the scalar kernel (errors='replace' semantics)."""
    import pyarrow as pa

    from filda_ray.kernels.textkit import extract_text, extract_text_arrow

    htmls = [b"<html><body>" + p + b"</body></html>" for p in payloads]
    scalar = extract_text(htmls)
    arrow = extract_text_arrow(pa.array(htmls, pa.binary()))
    assert list(scalar) == arrow.to_pylist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=0, max_size=50),
       st.integers(min_value=0, max_value=3))
def test_pc_neighbors_contains_self_and_symmetric(vals, ring):
    if not vals:
        return
    lat = np.clip(np.array(vals[:1]), -89.9, 89.9)
    lon = np.zeros(1)
    t = cells.pc_tile(lat, lon)
    nb, keep = cells.pc_distinct_neighbors_mask(t, ring=max(ring, 1))
    ids = nb[0][keep[0]]
    assert int(t[0]) in ids.tolist()
    assert len(set(ids.tolist())) == len(ids)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=2, max_size=40),
       st.floats(min_value=0.3, max_value=1.0))
def test_hdi_bounds_properties(vals, frac):
    """HDI window: lo <= hi, both are data points, and the window
    contains at least ceil(frac*d) of the sorted values."""
    from filda_ray.kernels.stats import hdi_bounds

    s = np.sort(np.array([vals], dtype=np.float64), axis=1)
    lo, hi = hdi_bounds(s, frac)
    assert lo[0] <= hi[0]
    assert lo[0] in s[0] and hi[0] in s[0]
    m = int(np.ceil(frac * s.shape[1]))
    assert ((s[0] >= lo[0]) & (s[0] <= hi[0])).sum() >= m


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e4, allow_nan=False),
                min_size=10, max_size=400),
       st.integers(min_value=0, max_value=3))
def test_quantile_sketch_merge_bounds(vals, split_seed):
    """Merged sketches answer quantiles within the data's range and
    match the unsplit sketch's level-0-exact regime for small inputs."""
    from filda_ray.ops.sketch import QuantileSketch

    v = np.array(vals, dtype=np.float64)
    cut = len(v) // 2
    a = QuantileSketch(k=256, seed=split_seed).add(v[:cut])
    b = QuantileSketch(k=256, seed=split_seed + 1).add(v[cut:])
    a.merge(b)
    for q in (0.0, 0.5, 1.0):
        est = a.quantile(q)
        assert v.min() <= est <= v.max()
    if len(v) <= 256:
        # no compaction happened -> exact rank semantics
        assert a.quantile(0.5) in v


@given(st.lists(st.one_of(st.integers(min_value=-2**31, max_value=2**31),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=32),
                          st.text(max_size=12), st.none()),
                min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_col_hash64_consistency(vals):
    """Equal values hash equal regardless of position or chunk layout;
    -0.0 co-buckets with 0.0; nulls are stable."""
    import pyarrow as pa

    from filda_ray.kernels.hashing import col_hash64

    # columns must be single-type: split by kind
    groups = {
        "int": [v for v in vals if isinstance(v, int)],
        "float": [float(v) for v in vals if isinstance(v, float)],
        "str": [v for v in vals if isinstance(v, str)],
    }
    for kind, g in groups.items():
        if not g:
            continue
        arr = pa.array(g + g)  # duplicated tail must hash identically
        h = col_hash64(arr)
        assert (h[: len(g)] == h[len(g):]).all()
        # chunked layout must not change hashes
        ch = pa.chunked_array([pa.array(g), pa.array(g)])
        h2 = col_hash64(ch)
        assert (h2[: len(g)] == h[: len(g)]).all()
    from filda_ray.kernels.hashing import col_hash64 as f

    z = f(pa.array([0.0, -0.0]))
    assert z[0] == z[1]


@given(st.dictionaries(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                       st.one_of(st.integers(min_value=-10**9, max_value=10**9),
                                 st.text(max_size=6), st.booleans(),
                                 st.none()),
                       max_size=5))
@settings(max_examples=60, deadline=None)
def test_json_extract_int_matches_json_loads(d):
    """On arbitrary flat JSON objects the kernel equals the exact
    parser's answer for every key."""
    import json

    from filda_ray.kernels.textkit import json_extract_int

    s = json.dumps(d)
    for key in list(d) + ["absent"]:
        got = json_extract_int([s], key).to_pylist()[0]
        v = d.get(key)
        want = v if isinstance(v, int) and not isinstance(v, bool) else None
        assert got == want, (s, key, got, want)


@given(st.floats(min_value=-90, max_value=90),
       st.floats(min_value=-90, max_value=90),
       st.floats(min_value=-180, max_value=180),
       st.floats(min_value=-180, max_value=180),
       st.integers(min_value=0, max_value=2),
       st.data())
@settings(max_examples=80, deadline=None)
def test_bbox_tiles_cover_property(la, lb, lo0, lo1, dilate, data):
    """Any point inside the box (incl. wrapped boxes) maps to a tile
    in bbox_tiles' cover, for arbitrary corners and dilation."""
    import numpy as np

    from filda_ray.kernels.cells import bbox_tiles, pc_tile

    la0, la1 = min(la, lb), max(la, lb)
    cover = set(bbox_tiles(la0, la1, lo0, lo1, dilate=dilate).tolist())
    lat = data.draw(st.floats(min_value=la0, max_value=la1))
    if lo0 <= lo1:
        lon = data.draw(st.floats(min_value=lo0, max_value=lo1))
    else:
        lon = data.draw(st.floats(min_value=lo0, max_value=lo1 + 360.0))
        lon = ((lon + 180.0) % 360.0) - 180.0
    t = int(pc_tile(np.array([lat]), np.array([lon]))[0])
    assert t in cover


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=5),
                          st.integers(min_value=-3, max_value=3)),
                min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_seg_bounds_property(pairs):
    """_seg_bounds reproduces itertools.groupby segmentation on any
    sorted tuple sequence."""
    import itertools

    import numpy as np

    from filda_ray.ops.temporal import _seg_bounds

    pairs = sorted(pairs)
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    new, seg_id, seg_start = _seg_bounds(a, b)
    want_lens = [len(list(g)) for _, g in itertools.groupby(pairs)]
    got_lens = np.diff(np.r_[seg_start, len(pairs)]).tolist()
    assert got_lens == want_lens
    assert seg_id[-1] == len(want_lens) - 1


@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), min_size=1,
                max_size=30))
@settings(max_examples=80, deadline=None)
def test_char_entropy_property(texts):
    """char_entropy == -sum(p log2 p) from collections.Counter on any
    unicode input (None/empty -> NaN)."""
    import math
    from collections import Counter

    import numpy as np

    from filda_ray.kernels.textkit import char_entropy

    got = char_entropy(texts)
    for i, t in enumerate(texts):
        if not t:
            assert np.isnan(got[i])
            continue
        c = Counter(t)
        want = -sum((v / len(t)) * math.log2(v / len(t)) for v in c.values())
        assert abs(got[i] - want) < 1e-9


@given(st.lists(st.one_of(st.none(), st.text(max_size=60)), min_size=1,
                max_size=20))
@settings(max_examples=60, deadline=None)
def test_compression_stats_property(texts):
    import zlib

    import numpy as np

    from filda_ray.kernels.textkit import compression_stats

    raw, comp, ratio = compression_stats(texts)
    for i, t in enumerate(texts):
        if not t:
            assert raw[i] == 0 and comp[i] == 0 and np.isnan(ratio[i])
            continue
        b = t.encode("utf-8")
        assert raw[i] == len(b)
        assert comp[i] == len(zlib.compress(b, 6))
        assert abs(ratio[i] - comp[i] / raw[i]) < 1e-15


@given(st.lists(st.lists(st.sampled_from(["a", "bb", "c", "dd", "e"]),
                         min_size=0, max_size=12), min_size=1, max_size=8),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=60, deadline=None)
def test_ngram_hashes_property(token_lists, n):
    """_ngram_hashes' vectorized shifted-combine equals a per-row
    scalar recomputation with the same primitives, and never crosses
    document boundaries."""
    import numpy as np
    import pyarrow as pa

    from filda_ray.kernels.hashing import col_hash64, hash_combine
    from filda_ray.ops.text import _ngram_hashes

    texts = [" ".join(toks) for toks in token_lists]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    row, gh, n_ngrams = _ngram_hashes(batch, "text", n)

    want_rows, want_hashes = [], []
    for i, t in enumerate(texts):
        toks = t.split(" ")  # NOTE: "" splits to [""] — same as the op
        h = col_hash64(pa.array(toks, pa.string()))
        for j in range(max(len(toks) - n + 1, 0)):
            g = h[j:j + 1]
            for k in range(1, n):
                g = hash_combine(g, h[j + k:j + k + 1])
            want_rows.append(i)
            want_hashes.append(g[0])
    assert row.tolist() == want_rows
    assert [int(x) for x in gh] == [int(x) for x in want_hashes]
    for i, t in enumerate(texts):
        assert n_ngrams[i] == max(len(t.split(" ")) - n + 1, 0)
