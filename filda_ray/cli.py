"""CLI entry points.

Usage (each command owns its Ray session; the library never inits):

    python -m filda_ray.cli detect --sf-dir /root/testdata/sf0.001 --out /tmp/det
    python -m filda_ray.cli detect --resume --out /tmp/det    # skip done partitions
    python -m filda_ray.cli query flagship_detect --sf-dir /root/testdata/sf0.01
    python -m filda_ray.cli list-queries

On a real cluster the same commands run under ``ray job submit --
python -m filda_ray.cli ...`` with ``--address auto``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="filda_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="run the flagship detection pipeline to a product dir")
    d.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    d.add_argument("--out", required=True)
    # default None so an explicitly passed --replicate 1 can still
    # override a config file's larger Replicate setting
    d.add_argument("--replicate", type=int, default=None)
    d.add_argument("--config", default=None,
                   help="namelist-style run config file (key : value; see filda_ray.config)")
    d.add_argument("--resume", action="store_true",
                   help="skip partitions already in the manifest (default behavior; flag kept for clarity)")

    q = sub.add_parser("query", help="run a named query and print a sample + row count")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=10)

    sub.add_parser("list-queries")

    b = sub.add_parser("bbox", help="spatial bbox query over a written product "
                       "(partition-pruned: only covered part dirs are opened)")
    b.add_argument("--product", required=True,
                   help="product dir written by `detect` (partitioned by pc_tile)")
    b.add_argument("--box", required=True,
                   help="lat_min,lat_max,lon_min,lon_max (lon_min>lon_max wraps 180)")
    b.add_argument("--limit", type=int, default=10)

    m = sub.add_parser("metrics", help="print pipeline metrics snapshot")

    args = p.parse_args(argv)

    if args.cmd == "list-queries":
        from filda_ray.pipelines.queries import ORACLES, QUERIES

        for name in QUERIES:
            kind = "sql-oracled" if name in ORACLES else "rows-only"
            print(f"{name:28s} {kind}")
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "detect":
            from filda_ray.pipelines.flagship import write_detections

            config = None
            if args.config:
                from filda_ray.config import RunConfig

                config = RunConfig.from_file(args.config)
                if args.replicate is not None:
                    config.replicate = args.replicate
            done = write_detections(args.sf_dir, args.out,
                                    replicate=args.replicate or 1,
                                    config=config)
            rows = sum(r["rows"] for r in done.values())
            print(json.dumps({"partitions": len(done), "rows": rows, "out": args.out}))
        elif args.cmd == "query":
            from filda_ray.pipelines.queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
                return 2
            res = QUERIES[args.name](args.sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(args.limit).to_string())
            print(f"... {len(df)} rows")
        elif args.cmd == "bbox":
            from filda_ray.kernels.cells import bbox_tiles
            from filda_ray.state.manifest import read_product_partitions

            la0, la1, lo0, lo1 = (float(x) for x in args.box.split(","))
            cover = bbox_tiles(la0, la1, lo0, lo1)
            ds = read_product_partitions(args.product, cover.tolist())
            import pyarrow.compute as _pc

            def in_box(t):
                lat = t.column("lat")
                lon = t.column("lon")
                if lo0 <= lo1:
                    lon_ok = _pc.and_(_pc.greater_equal(lon, lo0),
                                      _pc.less_equal(lon, lo1))
                else:  # antimeridian wrap: lon >= lo0 OR lon <= lo1
                    lon_ok = _pc.or_(_pc.greater_equal(lon, lo0),
                                     _pc.less_equal(lon, lo1))
                m = _pc.and_(_pc.and_(_pc.greater_equal(lat, la0),
                                      _pc.less_equal(lat, la1)), lon_ok)
                return t.filter(m)

            out = ds.map_batches(in_box, batch_format="pyarrow")
            df = out.to_pandas()
            print(df.head(args.limit).to_string())
            print(json.dumps({"covered_tiles": len(cover), "rows": len(df)}))
        elif args.cmd == "metrics":
            from filda_ray.state.metrics import snapshot

            print(json.dumps(snapshot()))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
