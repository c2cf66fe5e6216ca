"""Fitter self-test on a synthetic probe17 artifact with KNOWN constants
(the fixture is clearly synthetic and never written under results/ —
the round-3 fabrication lesson)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "fit_probe17", os.path.join(REPO, "scripts", "fit_probe17.py"))
fp17 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fp17)


def _records(F=250e-9, BW=700e9, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for R, C, U, P in ((128, 128, 8, 10288), (128, 128, 16, 10288),
                       (128, 128, 32, 10304), (256, 128, 8, 6880),
                       (128, 256, 16, 6864)):
        bytes_ = P * (2 * C * R * 2 + 32 * 2 * C * 2) + 1000 * 32 * R * 4
        t = P / U * F + bytes_ / BW
        t *= 1.0 + noise * rng.standard_normal()
        recs.append({"config": f"tmulti R={R} C={C} U={U}", "R": R,
                     "C": C, "U": U, "pairs": P, "ms": t * 1e3,
                     "streamed_bytes": bytes_, "correct": True,
                     "gnnz_per_s": 2.6e6 / t / 1e9})
    return recs


def test_fit_recovers_constants():
    F, bw, resid, rows = fp17.fit(_records())
    assert abs(F - 250e-9) / 250e-9 < 1e-6
    assert abs(bw - 700e9) / 700e9 < 1e-6
    # per-record residuals (ADVICE/VERDICT r4: the artifact must show
    # WHERE the model holds, not just a max over mixed records)
    assert len(resid) == len(rows)
    assert float(np.max(resid)) < 1e-9


def test_exclusions_annotated():
    _, _, resid, rows = fp17.fit(_records())
    ann = {r["U"]: fp17.EXCLUSIONS.get(r["U"]) for r in rows}
    assert ann[32] and "VMEM" in ann[32]
    assert ann[8] is None and ann[16] is None


def test_fit_tolerates_noise():
    F, bw, resid, rows = fp17.fit(_records(noise=0.03, seed=3))
    assert abs(F - 250e-9) / 250e-9 < 0.4
    assert abs(bw - 700e9) / 700e9 < 0.25


def test_fit_refuses_thin_or_nonphysical():
    with pytest.raises(ValueError, match="usable records"):
        fp17.fit(_records()[:2])
    bad = _records()
    for r in bad:  # time FALLING with step count -> negative fitted F
        r["ms"] = 1e3 / (r["pairs"] / r["U"])
    with pytest.raises(ValueError):
        fp17.fit(bad)


def test_main_refuses_cpu_artifact(tmp_path, monkeypatch, capsys):
    art = {"device": "cpu", "records": _records()}
    p = tmp_path / "probe17_tmulti.json"
    p.write_text(json.dumps(art))
    monkeypatch.setattr(sys, "argv", ["fit_probe17.py", str(p)])
    assert fp17.main() == 2
