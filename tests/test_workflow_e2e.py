"""Real-format end-to-end workflow gate (VERDICT r4 #6): a miniature
EDF+ file written by ``io.write_edf`` drives the full clinical chain
(``benchmarks/workflow_e2e.run_workflow``) and every planted ground
truth must come back out — this asserts the PRODUCT works on a real
on-disk recording, not just that each part passes its unit tests."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


@pytest.fixture(scope="module")
def workflow_result(tmp_path_factory):
    from workflow_e2e import run_workflow, synth_recording

    from ninwavelets_tpu.io.edf import write_edf

    sfreq, dur = 250.0, 120.0
    data, ch_names, annotations, truth = synth_recording(sfreq, dur)
    path = str(tmp_path_factory.mktemp("e2e") / "rec.edf")
    write_edf(path, data, sfreq, ch_names, annotations=annotations)
    out = run_workflow(path, n_perm=128, ica_iter=100)
    return out, truth


def test_qc_finds_exactly_the_dead_electrode(workflow_result):
    out, truth = workflow_result
    assert out["qc_bads"] == [truth["dead"]]


def test_ica_suppresses_the_blink(workflow_result):
    out, _ = workflow_result
    assert out["ica_bads"], "no ICA component flagged against EOG"
    assert out["blink_corr_before"] > 0.3
    assert out["blink_corr_after"] < 0.5 * out["blink_corr_before"]


def test_bad_span_rejects_the_covered_events(workflow_result):
    out, truth = workflow_result
    # the bad interval covers (at least) two stimulus windows; edge
    # rejection may drop none here (events sit well inside)
    assert out["n_kept"] < out["n_events"]
    assert out["n_events"] - out["n_kept"] >= 2


def test_planted_condition_effect_is_significant(workflow_result):
    out, _ = workflow_result
    assert out["cluster_p"] < 0.05, out["cluster_p"]
    assert out["itc_max"] > 0.2     # stimulus-locked phase alignment


def test_report_written(workflow_result):
    out, _ = workflow_result
    assert os.path.exists(out["report"])
    html = open(out["report"]).read()
    assert "min corrected p" in html
