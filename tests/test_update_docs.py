"""scripts/update_docs.py — the docs-of-record generator.

Rounds 3 and 4 shipped README/PARITY numbers contradicting the committed
artifacts (VERDICT round 4, weak #2); the generator makes the docs a pure
function of the artifacts. These tests pin its parsing + marker mechanics
on synthetic files (the real invocation happens in the release pipeline).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import update_docs


def test_replace_block_swaps_only_marked_region(tmp_path):
    f = tmp_path / "doc.md"
    f.write_text("keep\n<!-- A -->\nold body\n<!-- B -->\ntail\n")
    update_docs._replace_block(str(f), "<!-- A -->", "<!-- B -->", "new")
    assert f.read_text() == "keep\n<!-- A -->\nnew\n<!-- B -->\ntail\n"
    # idempotent: a second replacement swaps the same region again
    update_docs._replace_block(str(f), "<!-- A -->", "<!-- B -->", "x\ny")
    assert f.read_text() == "keep\n<!-- A -->\nx\ny\n<!-- B -->\ntail\n"


def test_replace_block_requires_markers(tmp_path):
    f = tmp_path / "doc.md"
    f.write_text("no markers here\n")
    with pytest.raises(SystemExit):
        update_docs._replace_block(str(f), "<!-- A -->", "<!-- B -->", "new")


def test_last_bench_line_skips_log_noise(tmp_path):
    f = tmp_path / "bench.log"
    f.write_text(
        "WARNING: platform axon is experimental\n"
        "Model restored from file: x.npz\n"
        '{"metric": "m", "value": 1.0}\n'
        "not json {\n"
        '{"metric": "m", "value": 3.14, "restored": "w.npz"}\n')
    row = update_docs._last_bench_line(str(f))
    assert row == {"metric": "m", "value": 3.14, "restored": "w.npz"}
    assert update_docs._last_bench_line(str(tmp_path / "missing")) is None


def test_main_regenerates_from_artifacts(tmp_path, monkeypatch):
    """End-to-end on a synthetic repo root: every number in the generated
    blocks must come from the artifact files."""
    (tmp_path / "artifacts" / "release").mkdir(parents=True)
    rel = {"members": [
        {"source_experiment": "2026-01-01T00h00m00s", "source_epoch": 21,
         "checkpoint": "a.chkpt"},
        {"source_experiment": "2026-01-02T00h00m00s", "source_epoch": 15,
         "checkpoint": "b.chkpt"}],
        "created": "2026-01-03", "model": {},
        "scores": {"agreement": 0.971}, "notes": "test"}
    (tmp_path / "artifacts" / "release" / "release.json").write_text(
        json.dumps(rel))
    (tmp_path / "pure.json").write_text('{"agreement": 0.97412}')
    (tmp_path / "fused.json").write_text('{"agreement": 0.97601}')
    (tmp_path / "bench.log").write_text(
        '{"value": 3.21, "weights": "trained", "restored": "a.npz", '
        '"vs_baseline": 19.3}\n')
    (tmp_path / "README.md").write_text(
        "# t\n<!-- RESULTS:BEGIN -->\nold\n<!-- RESULTS:END -->\n")
    (tmp_path / "PARITY.md").write_text(
        "# p\n<!-- SHIPPED:BEGIN -->\nold\n<!-- SHIPPED:END -->\n")
    monkeypatch.setattr(update_docs, "ROOT", str(tmp_path))
    rc = update_docs.main(["--pure_verify", str(tmp_path / "pure.json"),
                           "--fused_verify", str(tmp_path / "fused.json"),
                           "--bench", str(tmp_path / "bench.log")])
    assert rc == 0
    readme = (tmp_path / "README.md").read_text()
    assert "0.97412" in readme and "fresh-clone" in readme
    assert "0.97601" in readme
    assert "3.21" in readme and "`a.npz`" in readme
    parity = (tmp_path / "PARITY.md").read_text()
    assert "0.97412" in parity and "2 across 2 lineage(s)" in parity
    assert "\nold\n" not in readme and "\nold\n" not in parity
