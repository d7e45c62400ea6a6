"""Benchmark harness (driver contract).

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS,
default 32) and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the headline flagship pipeline twice in FRESH
processes (num_cpus=2, then 8 by default) on the same input and
reports both throughputs + scaling efficiency (the sandbox stand-in
for the north_rule's N vs 4N node criterion).

The flagship input is the documents-derived pages table replicated
deterministically (GRAFT_BENCH_REPLICATE, default 1024 -> 5.12M pages at
sf0.1); replication re-derives hosts/coords per replica, so the data
distribution matches the base corpus.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "1024"))
# Scaling pair: this sandbox advertises 32 vCPUs but the hardware
# delivers only ~8 cores of real throughput for memory-bound Arrow
# work (measured: identical tasks cost 82 cpu-s under 8-way
# concurrency vs 181 cpu-s under 32-way — vCPU/bandwidth contention,
# not engine behavior).  The N-vs-4N comparison therefore uses 2 vs 8
# — both within genuine capacity — per the round instructions
# ("N and 4N CPUs").  Not 1 vs 4: at num_cpus=1 Ray's hash-shuffle
# aggregator ACTORS (the r3 distributed background groupby) reserve a
# fractional CPU and the whole-CPU map tasks can never schedule — a
# 1-CPU 'cluster' is below Ray Data's hash-shuffle floor, which no
# real deployment hits.  All pairs recorded in BASELINE.md.
SCALING_LO = int(os.environ.get("GRAFT_SCALING_LO", "2"))
SCALING_HI = int(os.environ.get("GRAFT_SCALING_HI", "8"))
SCALING_REPLICATE = int(os.environ.get("GRAFT_SCALING_REPLICATE", "1024"))


def _cpu_stat():
    """Aggregate cpu jiffies from /proc/stat (user..guest_nice)."""
    try:
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))
    except Exception:
        return None


def _steal_pct(a, b):
    """Hypervisor steal % between two _cpu_stat snapshots — the ONLY
    guest-visible signal of neighbor bursts on this box (they do not
    show in guest loadavg).  Runs with steal above ~2-3% are
    contaminated; recorded so every bench JSON carries its own
    contamination evidence."""
    if not a or not b or len(a) < 8:
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return round(100.0 * d[7] / tot, 2)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from filda_ray.pipelines import flagship, queries as Q
    from filda_ray.sources.pages import read_pages

    timings: dict[str, float] = {}
    entry_meta: dict[str, dict] = {}
    stat0 = _cpu_stat()

    def timed(name: str, fn, *, rerun_under: float = 3.0, max_reps: int = 3):
        """Time one bench entry with its own steal window.  Entries
        whose first run lands under ``rerun_under`` seconds are re-run
        (n=3 total) and report min + spread — r3's 1-3 s entries swung
        +/-50% between sessions on this shared box, and a single short
        timing cannot distinguish a regression from a neighbor burst."""
        s0 = _cpu_stat()
        reps = []
        t0 = time.time()
        fn()
        reps.append(round(time.time() - t0, 3))
        while reps[0] < rerun_under and len(reps) < max_reps:
            t0 = time.time()
            fn()
            reps.append(round(time.time() - t0, 3))
        timings[name] = min(reps)
        entry_meta[name] = {"runs": reps, "steal_pct": _steal_pct(s0, _cpu_stat())}

    # warm the page cache (untimed read) so we measure compute + shuffle
    read_pages(SF_DIR).count()

    # best of 3 runs: this sandbox shares cores with bursty neighbors
    # (load spikes of 10-30 lasting minutes); min-of-N is the standard
    # estimator for the machine's actual capability (all runs recorded)
    runs = []
    n_pages = 0
    s0_flag = _cpu_stat()
    for _ in range(3):
        t0 = time.time()
        det = flagship.detect_pipeline(SF_DIR, replicate=REPLICATE)
        n_pages = det.count()
        runs.append(round(time.time() - t0, 3))
    t_flagship = min(runs)
    timings["flagship_detect"] = t_flagship
    entry_meta["flagship_detect"] = {"runs": runs,
                                     "steal_pct": _steal_pct(s0_flag, _cpu_stat())}

    if not os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
        # production-shaped flagship: read a MATERIALIZED pages Parquet
        # table (the BASELINE.json input_hint shape on disk) instead of
        # synthesizing inline — synthesis happens once, untimed, cached
        # across bench runs under /tmp
        from filda_ray.sources.pages import write_pages_parquet

        # cache dir keyed by (sf, replicate): a fixed name silently
        # reused a STALE table when either knob changed between runs
        pdir = write_pages_parquet(
            SF_DIR, f"/tmp/graft_pages_bench_{os.path.basename(SF_DIR)}_r{REPLICATE}",
            replicate=REPLICATE)
        timed("flagship_from_parquet",
              lambda: flagship.detect_pipeline(None, pages_dir=pdir).count())

    secondary = {} if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY") else {
        "dedup_exact": Q.q_dedup,
        "pricing_summary": Q.q_pricing,
        "join_revenue": Q.q_join_revenue,
        "window_events": Q.q_window_events,
        "embedding_topk": Q.q_embed_topk,
        "minhash_neardup": Q.q_minhash,
        "bloom_semi_join": Q.q_bloom_semi,
        "heavy_hitters": Q.q_heavy_hitters,
        "rank_orders": Q.q_rank_orders,
        "running_totals": Q.q_running_totals,
        "corr_comoments": Q.q_corr_qty_discount,
        "line_repetition": Q.q_line_repetition,
        "range_window_sum": Q.q_range_window,
        "radius_join": Q.q_radius_join,
    }
    def consume(fn):
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()

    for name, fn in secondary.items():
        timed(name, lambda fn=fn: consume(fn))

    if not os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
        # control for bloom_semi_join: the SAME exact semi join as a
        # native hash left_semi (big side fully shuffled) — the gap is
        # the Bloom pre-filter's shuffle saving
        from filda_ray.ops import shuffle_partitions
        from filda_ray.ops.relational import distinct_rows
        from filda_ray.sources import read_parquet_clean as _rpc

        def semi_control():
            li = _rpc(f"{SF_DIR}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber", "l_quantity"])
            rk = distinct_rows(Q._high_orders(SF_DIR), ["o_orderkey"])
            li.join(rk, join_type="left_semi",
                    num_partitions=shuffle_partitions(),
                    on=("l_orderkey",), right_on=("o_orderkey",)).count()

        timed("semi_join_hash_control", semi_control)

        # dedup worst case: every document unique (64x corpus with
        # distinct texts).  The bounded-bucket first-wins design must
        # stay within ~2x of distinct_rows on the same rows (both are
        # one shuffle + 64 vectorized groups; dedup adds the md5 pass).
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from filda_ray.ops.dedup import dedup_exact
        from filda_ray.ops.relational import distinct_rows

        def explode64(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            texts = b.column("text").to_pylist()
            rep_ids = (np.repeat(ids, 64) * 64 + np.tile(np.arange(64), len(ids)))
            rep_texts = [f"{t} #{k}" for t in texts for k in range(64)]
            return pa.table({"doc_id": pa.array(rep_ids),
                             "text": pa.array(rep_texts, pa.large_string())})

        from filda_ray.sources import read_parquet_clean

        def distinct_corpus():
            docs = read_parquet_clean(f"{SF_DIR}/documents.parquet",
                                      columns=["doc_id", "text"])
            return docs.map_batches(explode64, batch_format="pyarrow")

        timed("dedup_distinct_320k",
              lambda: dedup_exact(distinct_corpus()).count())
        timed("distinct_rows_320k",
              lambda: distinct_rows(distinct_corpus(), ["doc_id"]).count())

        # cross-document frequent-segment removal on the same 320k
        # corpus (paragraph-dedup machinery at token granularity):
        # hash-only DF partials -> bounded groupby -> broadcast scrub.
        # Materialize the replicated corpus first: the DF partial's
        # min-rows batch demand fused across the replicator would
        # collapse the chain to one task (see read_pages caveat) —
        # and the op makes two passes, so this also de-duplicates the
        # synthesis cost a real parquet input wouldn't pay.
        from filda_ray.ops.text import remove_frequent_segments

        seg_corpus = distinct_corpus().repartition(128).materialize()
        timed("segment_prune_320k",
              lambda: remove_frequent_segments(seg_corpus, delimiter=" ",
                                               min_df=2, max_df_frac=0.5).count())

        # WARC round-trip at 320k pages: distributed member-per-record
        # .warc.gz write (one archive per block) + full parse-back read
        import shutil
        import tempfile

        from filda_ray.sources.pages import read_pages
        from filda_ray.sources.warc import read_warc, write_warc

        # distributed BPE encode over the 320k corpus (trained merges
        # broadcast to the actor pool; the timed pass is the
        # vectorized rank-by-rank numpy kernel — measured 66x the
        # per-doc reference loop single-threaded)
        from filda_ray.ops.bpe import bpe_encode_op, train_bpe_on_corpus

        bpe_merges = train_bpe_on_corpus(distinct_corpus(), n_merges=200,
                                         sample_size=500, seed=0)
        timed("bpe_encode_320k",
              lambda: bpe_encode_op(distinct_corpus(), bpe_merges).count())

        def warc_roundtrip():
            wd = tempfile.mkdtemp(prefix="warc_bench_", dir="/tmp")
            try:
                write_warc(read_pages(SF_DIR, replicate=max(REPLICATE // 16, 1)), wd)
                read_warc(wd).count()
            finally:
                shutil.rmtree(wd, ignore_errors=True)

        timed("warc_roundtrip_320k", warc_roundtrip)

        # PQ ANN end-to-end at 64x the embedding corpus (128k vecs):
        # sample train + uint8 encode + 16-query ADC scan
        from filda_ray.ops.embed import pq_encode, pq_topk, pq_train

        def rep_embeddings():
            emb = read_parquet_clean(f"{SF_DIR}/embeddings.parquet",
                                     columns=["vec_id", "embedding"])

            def explode(b: pa.Table) -> pa.Table:
                ids = b.column("vec_id").to_numpy()
                rep_ids = (np.repeat(ids, 64) * 64
                           + np.tile(np.arange(64), len(ids)))
                idx = np.repeat(np.arange(len(b), dtype=np.int64), 64)
                return pa.table({
                    "vec_id": pa.array(rep_ids),
                    "embedding": b.column("embedding").take(pa.array(idx)),
                })

            return emb.map_batches(explode, batch_format="pyarrow")

        import pyarrow.parquet as _pq

        qt = _pq.read_table(f"{SF_DIR}/embeddings.parquet",
                            columns=["embedding"]).slice(0, 16)
        Qm = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
        def pq_ann():
            books = pq_train(rep_embeddings(), m=8, nbits=8, sample_size=2000,
                             seed=0)
            pq_topk(pq_encode(rep_embeddings(), books), books, Qm, k=10).count()

        timed("pq_ann_128k", pq_ann)

        # distributed hex background at replicate scale: no driver
        # materialization of the (cell x value) histogram
        from filda_ray.ops.background import background_stats_hex
        from filda_ray.pipelines.flagship import narrow_pages

        # streams end-to-end fused: the range-driven replicator counts
        # post-expansion rows, so the hist partial's min-rows bundling
        # no longer collapses the chain (see read_pages)
        timed("hex_background_1.3M",
              lambda: background_stats_hex(
                  narrow_pages(SF_DIR, replicate=max(REPLICATE // 4, 1)),
                  "n_chars").count())

        # adversarial near-dup verify (fresh subprocess so the driver
        # peak RSS is attributable): templated corpus -> LSH emits far
        # more candidate pairs than the broadcast cap -> the fully
        # distributed hash-join verify path must keep driver RSS
        # bounded (the pairs/signature tables never land on the driver)
        env = dict(os.environ, GRAFT_BENCH_MODE="neardup")
        try:
            nd = json.loads(subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip().splitlines()[-1])
            timings["neardup_verify_adversarial"] = nd["sec"]
            out_extra = {"neardup_adversarial": nd}
        except subprocess.CalledProcessError:
            out_extra = {}

    if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
        out_extra = {}
    out = {
        **out_extra,
        "metric": "flagship pages/sec (geocode->tile->background->classify->PIP->QA)",
        "value": timings["flagship_detect"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": int(n_pages),
        "pages_per_sec": round(n_pages / max(timings["flagship_detect"], 1e-9), 1),
        "flagship_runs": runs,
        "entries": entry_meta,
        "steal_pct": _steal_pct(stat0, _cpu_stat()),
    }
    ray.shutdown()
    return out


def run_neardup_adversarial() -> dict:
    """Templated high-collision corpus: ~40k docs in ~5k near-dup
    groups of 8 -> ~140k candidate pairs (above the broadcast cap, so
    verify_jaccard_op auto-selects the distributed hash-join path).
    Reports wall time, verified pair count, and this process's peak
    RSS — the bounded-driver evidence."""
    import resource

    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from filda_ray.ops.dedup import minhash_lsh_pairs, verify_jaccard_op
    from filda_ray.sources import read_parquet_clean

    REPS = 8

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        rep_ids = np.repeat(ids, REPS) * REPS + np.tile(np.arange(REPS), len(ids))
        texts = []
        for i in ids:
            base = (f"breaking news article about shared topic {int(i)} with "
                    "boilerplate header footer navigation sidebar copyright ") * 3
            for k in range(REPS):
                texts.append(base + f"unique tail token{int(i)}x{k}")
        return pa.table({"doc_id": pa.array(rep_ids),
                         "text": pa.array(texts, pa.large_string())})

    def docs():
        return read_parquet_clean(f"{SF_DIR}/documents.parquet",
                                  columns=["doc_id"]).map_batches(
            synth, batch_format="pyarrow")

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs())
    ver = verify_jaccard_op(pairs, docs(), threshold=0.6)
    n_ver = ver.count()
    sec = round(time.time() - t0, 3)
    rss_mib = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
    n_docs = REPS * read_parquet_clean(f"{SF_DIR}/documents.parquet",
                                       columns=["doc_id"]).count()
    out = {"sec": sec, "verified_pairs": int(n_ver),
           "driver_peak_rss_mib": rss_mib, "docs": int(n_docs)}
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_REPLICATE=str(SCALING_REPLICATE),
                   GRAFT_BENCH_FLAGSHIP_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = SCALING_LO, SCALING_HI
    r_lo = one(lo)
    r_hi = one(hi)
    t_lo = r_lo["queries"]["flagship_detect"]
    t_hi = r_hi["queries"]["flagship_detect"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": f"scaling efficiency (flagship, {lo} vs {hi} cpus, fresh sessions, N-vs-4N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "pages": r_hi["pages"],
        "pages_per_sec_lo": r_lo["pages_per_sec"],
        "pages_per_sec_hi": r_hi["pages_per_sec"],
        "steal_pct_lo": r_lo.get("steal_pct"),
        "steal_pct_hi": r_hi.get("steal_pct"),
        "sf": SF_DIR,
    }


def _emit(full: dict) -> None:
    """Print the bench result so the LAST stdout line stays well under
    the driver's 2000-char tail window (BENCH_r04 was recorded with
    parsed=null because the per-run/steal detail pushed the single
    JSON line past it).  Detail (per-entry runs, per-entry steal,
    adversarial sub-run) goes to an EARLIER line and a sidecar file;
    the final line is the compact summary the driver parses."""
    detail = {k: full.pop(k)
              for k in ("entries", "flagship_runs", "neardup_adversarial")
              if k in full}
    if detail:
        try:
            if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
                raise OSError  # scaling sub-runs must not clobber the sidecar
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_DETAIL.json")
            with open(path, "w") as f:
                json.dump({"summary": full, "detail": detail}, f, indent=1)
        except OSError:
            pass
        print(json.dumps({"bench_detail": detail}))
    line = json.dumps(full)
    if len(line) > 1900:  # belt-and-braces: never outgrow the tail again
        slim = {k: full[k] for k in ("metric", "value", "unit", "sf",
                                     "num_cpus", "pages", "pages_per_sec",
                                     "steal_pct") if k in full}
        slim["queries"] = {k: v for k, v in sorted(
            full.get("queries", {}).items())}
        line = json.dumps(slim)
        while len(line) > 1900 and slim["queries"]:
            slim["queries"].popitem()
            line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif os.environ.get("GRAFT_BENCH_MODE") == "neardup":
        print(json.dumps(run_neardup_adversarial()))
    else:
        _emit(run_bench())
