"""Generate committed golden Parquet files (FIXTURES.md F4/F5).

Run once per EXTRACTOR_VERSION / encoder change; tests assert exact
equality ('identical tile assignments', 'identical join output rows').
"""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    os.makedirs(OUT, exist_ok=True)

    from filda_ray.pipelines.flagship import detect_pipeline, narrow_pages

    cells = (
        narrow_pages("/root/testdata/sf0.001")
        .select_columns(["doc_id", "pc_tile", "hex_r7", "s2_l12", "hex_prefix"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pq.write_table(__import__("pyarrow").Table.from_pandas(cells, preserve_index=False),
                   os.path.join(OUT, "cells_sf0001.parquet"))

    det = (
        detect_pipeline("/root/testdata/sf0.001")
        .select_columns(["doc_id", "pc_tile", "n_chars", "bg_median", "bg_mad",
                         "bg_n", "win_ring", "score", "status", "admin_id",
                         "biome_id", "n_in_cell", "qa_bits"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pq.write_table(__import__("pyarrow").Table.from_pandas(det, preserve_index=False),
                   os.path.join(OUT, "detections_sf0001.parquet"))
    print("wrote goldens:", len(cells), "cells,", len(det), "detections")
    ray.shutdown()


if __name__ == "__main__":
    main()
