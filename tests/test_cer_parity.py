# -*- coding: utf-8 -*-
"""Controlled reference-vs-rebuild CER experiment (BASELINE.md north star:
|ΔCER| ≤ 0.2 absolute on identical data/tokenizer/encoder/schedule).

The full experiment trains BOTH implementations for 700 epochs (~40 min on
this 1-core box), so it is opt-in:

    FDDM_CER_PARITY=1 python -m pytest tests/test_cer_parity.py -q

The committed artifact from the last full run is docs/cer_parity_r02.json
(rebuild best val CER 0.0 @ ep 560 vs reference 0.0434 @ ep 670 — rebuild
strictly better, |ΔCER| = 0.043).  A fast smoke (always on) pins that the
harness itself still drives both sides end to end for 2 epochs.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out, epochs, eval_every, timeout):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "cer_parity_experiment.py"),
         "--out", out, "--epochs", str(epochs), "--eval-every", str(eval_every),
         "--side", "both", "--device", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.load(open(os.path.join(out, "cer_parity.json")))


def test_experiment_harness_smoke(tmp_path):
    """Both sides run end-to-end on the same corpus (2 epochs, no
    convergence expectation — the convergence run is the opt-in test)."""
    results = _run(str(tmp_path / "exp"), epochs=2, eval_every=1, timeout=1800)
    assert set(results) == {"rebuild", "reference"}
    for side in ("rebuild", "reference"):
        assert results[side]["epochs"] == 2
        # 2 untrained epochs CANNOT transcribe: a strictly positive CER
        # proves eval actually ran (a default-0.0 field would pass >= 0.0)
        cer = results[side]["best_val_cer"]
        assert np.isfinite(cer) and cer > 0.0, results[side]


@pytest.mark.skipif(not os.environ.get("FDDM_CER_PARITY"),
                    reason="full 700-epoch CER-parity run; ~40 min — set "
                           "FDDM_CER_PARITY=1 to enable")
def test_cer_within_north_star(tmp_path):
    results = _run(str(tmp_path / "exp"), epochs=700, eval_every=10,
                   timeout=5400)
    delta = abs(results["reference"]["best_val_cer"]
                - results["rebuild"]["best_val_cer"])
    assert delta <= 0.2, results
