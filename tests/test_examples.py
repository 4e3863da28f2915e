"""Smoke tests: the examples run end to end (on the CPU test mesh)."""

import runpy
import sys


def _run(path):
    old_argv = sys.argv
    sys.argv = [path]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old_argv


def test_readme_example(capsys):
    _run("examples/readme_example.py")
    out = capsys.readouterr().out
    assert "compatibility lane" in out
    assert "functional lane" in out


def test_deflation_recycling_example(capsys):
    _run("examples/deflation_recycling.py")
    out = capsys.readouterr().out
    assert "deflated" in out
    assert "recycling" in out


def test_eig_and_lsq_example(capsys):
    _run("examples/eig_and_lsq.py")
    out = capsys.readouterr().out
    assert "deflated-by-eigsh" in out
    assert "poly precond" in out
    assert "lsmr" in out
    assert "newton_krylov" in out


def test_multichip_example(capsys):
    _run("examples/multichip.py")
    out = capsys.readouterr().out
    assert "8 devices" in out
    assert "status=0" in out


def test_spectral_survey(capsys):
    _run("examples/spectral_survey.py")
    out = capsys.readouterr().out
    assert "kpm_dos" in out
    assert "window_count" in out
    assert "eigsh_window" in out
    assert "spectral survey example done" in out


def test_randomized_lane_example(capsys):
    _run("examples/randomized_lane.py")
    out = capsys.readouterr().out
    assert "converged=True" in out
    assert "hutch++" in out
    assert "sketched_eigs" in out


def test_unstructured_example(capsys):
    _run("examples/unstructured.py")
    out = capsys.readouterr().out
    assert "RCM: occupied diagonals" in out
    assert "DIA matvec" in out
    assert "SPAI certificate" in out
    assert "all converged: True" in out
