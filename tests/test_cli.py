"""CLI tests (search / pair / info subcommands)."""
import json

import numpy as np
import pytest

from libssa_tpu.cli import main
from libssa_tpu.io import fasta


@pytest.fixture
def db_path(tmp_path):
    rng = np.random.default_rng(0)
    AA = list("ARNDCQEGHILKMFPSTWYV")
    recs = [(f"p{i}", "".join(rng.choice(AA, 30))) for i in range(20)]
    recs[7] = ("needle", "MKVLAAGIVGWKQTE")
    p = tmp_path / "db.fas"
    fasta.write_fasta(str(p), recs)
    return str(p)


def test_search_json(db_path, capsys):
    rc = main([
        "search", "--db", db_path, "--query", "MKVLAAGIVGWKQTE",
        "-k", "3", "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["hits"][0]["header"] == "needle"
    assert out["hits"][0]["score"] > 0


def test_search_align_text(db_path, capsys):
    rc = main([
        "search", "--db", db_path, "--query", "MKVLAAGIVGWKQTE",
        "-k", "2", "--align", "--bit-width", "8",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "needle" in text
    assert "|" in text  # alignment midline rendered


def test_pair(capsys):
    rc = main([
        "pair", "--query", "MKVLAAGW", "--subject", "MKVLAAGW", "--algo", "nw",
    ])
    assert rc == 0
    assert "score=" in capsys.readouterr().out


def test_info(db_path, capsys):
    rc = main(["info", "--db", db_path])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["sequences"] == 20
    assert out["max_length"] >= 15


def test_error_exit_code(tmp_path, capsys):
    rc = main([
        "search", "--db", str(tmp_path / "missing.fas"), "--query", "MKVL",
    ])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_pair_devices_wired(monkeypatch, capsys):
    """--devices is honored by every subcommand, not just search."""
    from libssa_tpu import api

    calls = []
    monkeypatch.setattr(
        api.SSAContext, "set_device_count", lambda self, n: calls.append(n)
    )
    rc = main([
        "pair", "--query", "MKVLAAGW", "--subject", "MKVLAAGW",
        "--devices", "1",
    ])
    assert rc == 0 and calls == [1]


def test_pair_score_only(tmp_path, capsys):
    from libssa_tpu import cli

    qf = tmp_path / "q.fas"
    sf = tmp_path / "s.fas"
    qf.write_text(">q\nMKVLAAGWKQTE\n")
    sf.write_text(">s\nMKVIGAGWQQTE\n")
    rc = cli.main([
        "pair", "--query", str(qf), "--subject", str(sf),
        "--algo", "sw", "--score-only",
        "--matrix", "BLOSUM62", "--gap-open", "10", "--gap-extend", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "score" in out.lower() or any(ch.isdigit() for ch in out)


def test_pair_missing_subject_file_errors(tmp_path, capsys):
    """A filename-looking --subject that does not exist must error, not
    silently align the letter-stripped path string (review finding —
    queries already had this guard)."""
    qf = tmp_path / "q.fas"
    qf.write_text(">q\nMKVLAAGWKQTE\n")
    rc = main([
        "pair", "--query", str(qf), "--subject", str(tmp_path / "nope.fas"),
    ])
    assert rc == 2
    assert "does not exist" in capsys.readouterr().err
