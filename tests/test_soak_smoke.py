"""examples/soak.py must run the full serving-soak path on tiny CPU
shapes: real working-set residency, MIDI churn through the session,
per-segment trend, and a crash-safe git-trackable record."""

import importlib.util
import json
import sys


def _soak():
    spec = importlib.util.spec_from_file_location(
        "soak", "/root/repo/examples/soak.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_soak_smoke(tmp_path, capsys):
    soak = _soak()
    rc = soak.main(["--minutes", "0.15", "--voices", "2", "--num-irs", "4",
                    "--bank-capacity", "2", "--ir-seconds", "0.05",
                    "--segment-blocks", "64", "--churn-every", "4",
                    "--fetch-batch", "4",
                    "--no-realtime", "--record-dir", str(tmp_path),
                    "--pack-cache", str(tmp_path / "cache")])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "partial" not in rec and "error" not in rec
    assert rec["blocks"] > 0
    assert rec["peak"] > 1e-4            # real audio came out
    assert rec["segments"] >= 1
    assert rec["trend"][0]["seg_ms_per_block"] > 0
    assert rec["p99_ms"] > 0
    # churn across 4 IRs behind 2 slots must exercise the residency layer
    # (faults once a slot ages past fade protection, deferred-exhaustion
    # starvation before that — tiny smoke windows may only see the latter)
    assert rec["faults"] + rec["starved"] > 0
    # the git-trackable record was persisted and finalized
    stored = json.loads(
        (tmp_path / f"last_good_{rec['metric']}.json").read_text())
    assert stored["blocks"] == rec["blocks"]
    assert "partial" not in stored
