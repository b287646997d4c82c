"""The one-command pretrained-fidelity harness must run end-to-end in
synthetic mode — ALL FIVE components (VERDICT r2 #5: pSp and StyleGAN2 use
the same reduced synthetic plans as their dedicated parity tests, so the
harness *wiring* that a real-weights run would execute is what's under
test here)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_harness_synthetic_mode_all_components(tmp_path):
    from tests.env_utils import cpu_env

    env = cpu_env(REPO)
    out_json = str(tmp_path / "report.json")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "verify_pretrained_parity.py"),
         "--out", out_json],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, (
        f"harness failed:\n{result.stdout}\n{result.stderr}"
    )
    assert "PARITY_HARNESS_OK" in result.stdout

    import json

    report = json.load(open(out_json))
    assert report["ok"] is True
    comps = {r["component"] for r in report["rows"]}
    assert comps == {"psp", "stylegan2", "arcface", "lpips", "timm_vit"}
    assert all(r["ok"] for r in report["rows"])
    assert set(report["modes"]) == {"psp", "stylegan2", "arcface", "lpips",
                                    "timm"}
    assert all(m == "synthetic" for m in report["modes"].values())
