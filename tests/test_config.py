"""Config-layer tests (survey M23: namelist grammar -> typed config ->
lineage-recorded run)."""

import numpy as np

from filda_ray.config import RunConfig, parse_namelist

SAMPLE = """\
# filda_ray run configuration (namelist grammar)
------------------------+------------------------------------
%%%   DETECTION MENU %%%:
Value column            : n_chars
Ring ladder             : 1 2
&                       : 4
Min background n        : 12
Z low                   : 2.5
Z high                  : 5.5
Trim fraction           : 0.25
------------------------+------------------------------------
%%%   EXECUTION MENU %%%:
Replicate               : 2
Concurrency             : None
Materialize narrow?     : F
Partition column        : pc_tile
Output version          : test_v2
"""


def test_parse_namelist_grammar():
    raw = parse_namelist(SAMPLE)
    # continuation line appended to the previous key
    assert raw["Ring ladder"] == "1 2 4"
    assert raw["Z low"] == "2.5"
    assert "%%%   DETECTION MENU %%%" not in raw


def test_config_typed_roundtrip():
    cfg = RunConfig.from_text(SAMPLE)
    assert cfg.value_col == "n_chars"
    assert cfg.rings == (1, 2, 4)
    assert cfg.min_bg_n == 12
    assert cfg.z_lo == 2.5 and cfg.z_hi == 5.5
    assert cfg.replicate == 2
    assert cfg.concurrency is None
    assert cfg.materialize_narrow is False
    assert cfg.output_version == "test_v2"
    lin = cfg.to_lineage()
    assert lin["rings"] == [1, 2, 4] and lin["min_bg_n"] == 12


def test_unknown_key_rejected():
    import pytest

    with pytest.raises(KeyError):
        RunConfig.from_text("Bogus knob : 3\n")


def test_config_drives_pipeline_and_lineage(ray_session, sf_dir, tmp_path):
    """A parsed config changes detection behavior (3-ring ladder,
    custom thresholds) and is recorded in the product lineage."""
    from filda_ray.pipelines.flagship import detect_pipeline, write_detections
    from filda_ray.state.manifest import load_done

    cfg = RunConfig.from_text(SAMPLE)
    cfg.replicate = 1
    cfg.materialize_narrow = True
    det = detect_pipeline(sf_dir, config=cfg).to_pandas()
    assert set(det["win_ring"].unique()) <= {1, 2, 4}
    non_final = det[det["win_ring"] < 4]
    assert (non_final["bg_n"] >= 12).all()

    out = str(tmp_path / "prod")
    write_detections(sf_dir, out, config=cfg)
    rec = next(iter(load_done(out).values()))
    assert rec["lineage"]["config"]["rings"] == [1, 2, 4]
    assert rec["lineage"]["config"]["z_lo"] == 2.5
