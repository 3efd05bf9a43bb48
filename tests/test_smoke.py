"""smoke.run's contract with cli.run (round-1 advisor finding).

smoke.run crashed in round 1 because it consumed cli.main's return value
after main was changed to return an exit code; no test caught it. This
pins the contract cheaply: smoke.run must call the LIBRARY entry
(cli.run, which returns the summary dict) and index into its result —
via a stub cli.run that writes the expected artifacts and returns a
summary. The full un-stubbed pipeline behind smoke is separately covered
end-to-end by tests/test_cli.py.
"""

import os

import numpy as np

from psla_tpu import cli
from psla_tpu.tools import smoke


def test_smoke_consumes_cli_run_summary(tmp_path, monkeypatch):
    calls = {}

    def fake_run(argv):
        calls["argv"] = argv
        exp = argv[argv.index("--exp-dir") + 1]
        os.makedirs(os.path.join(exp, "models"))
        os.makedirs(os.path.join(exp, "predictions"))
        for f in ("result.csv", "config.json", "progress.json",
                  "wa_result.csv", "best_single_result.csv",
                  "ensemble_result.csv"):
            open(os.path.join(exp, f), "w").write("0\n")
        return {
            "best_single": {"eval_mAP": 0.9},
            "wa": {"eval_mAP": 0.91},
            "ensemble": {"eval_mAP": 0.92},
        }

    monkeypatch.setattr(cli, "run", fake_run)
    res = smoke.run(epochs=2, exp_root=str(tmp_path))
    assert np.isfinite(res["summary"]["wa"]["eval_mAP"])
    # smoke builds a real synthetic corpus and passes it through
    assert "--data-train" in calls["argv"]
    assert "--impretrain" in calls["argv"]  # synthetic run trains from scratch
