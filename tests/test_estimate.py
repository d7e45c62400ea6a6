"""Estimation pipeline tests (MCBEF lifecycle analog, SURVEY.md §3.2)."""

import numpy as np


def test_estimate_inline_and_from_product(ray_session, sf_dir, tmp_path):
    from filda_ray.pipelines.estimate import estimate_pipeline, summarize
    from filda_ray.pipelines.flagship import write_detections

    scored = estimate_pipeline(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(scored) == 500
    # enrichment: every row has an emissivity; hosts % 3 == 0 use NRT
    assert scored["emissivity"].notna().all()
    nrt_hosts = scored[scored["emis_from_nrt"]]["host_id"]
    assert (nrt_hosts % 3 == 0).all()
    assert (scored[~scored["emis_from_nrt"]]["host_id"] % 3 != 0).all()
    # estimator ran: QA classes populated, uniphasic rows have p=1
    assert set(scored["est_qa"].unique()) <= {0, 1, 2, 3}
    uni = scored[scored["est_qa"] == 1]
    assert (uni["est_p"] == 1.0).all()

    # reprocessing path: estimate from a written product == inline run
    out = str(tmp_path / "det")
    write_detections(sf_dir, out)
    scored2 = (
        estimate_pipeline(product_dir=out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("est_p", "est_t", "est_qa", "emissivity"):
        assert np.array_equal(scored[c].to_numpy(), scored2[c].to_numpy())

    summ = summarize(estimate_pipeline(sf_dir)).to_pandas()
    assert summ["n"].sum() == 500
