"""The examples/ directory must keep working — it is the switch-over story
for a user of the reference plugin."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_example_end_to_end():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_example.py")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "retrieval" not in out.stdout  # tool_meta selected columns only
    assert "conv-1" in out.stdout


def test_curate_corpus_example():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "curate_corpus.py")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "kept=" in out.stdout
    # src2 rate is 0.0: the mix must have dropped it entirely
    assert "'src2'" not in out.stdout.split("by source:")[-1]
