"""CLI surface tests (reference flag parity, cmd/root.go:222-242)."""

import json
import os
import subprocess
import sys

import pytest
import yaml

from gleaner_ray.sources.synth import corpus_config, generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    corpus = generate_corpus("/root/testdata/sf0.001")
    cfg = corpus_config(corpus)
    cfg_yaml = {
        "minio": {"bucket": "gleaner"},
        "summoner": {"threads": 5, "delay": 0, "mode": "full"},
        "sources": [s.to_row() for s in cfg.sources],
    }
    d = tmp_path_factory.mktemp("cli")
    cfg_path = str(d / "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    return {"corpus": corpus, "cfg_path": cfg_path, "out": str(d / "out")}


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "gleaner_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


class TestCLI:
    def test_full_run(self, cli_setup):
        proc = run_cli(
            "--cfg", cli_setup["cfg_path"],
            "--pages", os.path.join(cli_setup["corpus"], "pages"),
            "--out", cli_setup["out"],
            "--run-date", "2026-08-17",
            "--cpus", "4",
            "--no-objects",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        manifest = json.loads("{" + proc.stdout.split("{", 1)[1])
        assert manifest["per_source"]["geo0"]["fetched"] > 0
        assert os.path.isdir(os.path.join(cli_setup["out"], "results"))

    def test_source_narrowing(self, cli_setup, tmp_path):
        proc = run_cli(
            "--cfg", cli_setup["cfg_path"],
            "--source", "hydro1",
            "--pages", os.path.join(cli_setup["corpus"], "pages"),
            "--out", str(tmp_path / "out"),
            "--run-date", "2026-08-17",
            "--cpus", "4",
            "--no-objects",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        manifest = json.loads("{" + proc.stdout.split("{", 1)[1])
        assert list(manifest["per_source"]) == ["hydro1"]

    def test_rude_requires_source(self, cli_setup):
        proc = run_cli(
            "--cfg", cli_setup["cfg_path"],
            "--rude",
            "--pages", "x",
            "--out", "y",
        )
        assert proc.returncode != 0
        assert "--rude requires --source" in proc.stderr

    def test_diff_mode_unsupported(self, cli_setup):
        # resources.go:73-75: Mode diff is not currently supported
        proc = run_cli(
            "--cfg", cli_setup["cfg_path"],
            "--mode", "diff",
            "--pages", "x",
            "--out", "y",
        )
        assert proc.returncode != 0
        assert "diff" in (proc.stderr + proc.stdout)


def test_ops_list_and_run(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "gleaner_ray", "ops", "--list"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0
    names = json.loads(out.stdout.strip().splitlines()[-1])
    assert "rel_q1_agg" in names and "dedup_exact" in names

    dest = str(tmp_path / "q1")
    out = subprocess.run(
        [sys.executable, "-m", "gleaner_ray", "ops", "--query", "rel_q1_agg",
         "--sf-dir", "/root/testdata/sf0.001", "--out", dest, "--cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["rows"] == 6 and info["query"] == "rel_q1_agg"
