"""CLI + typed config (SURVEY.md §5.6)."""

import pytest


def test_vectors_command(capsys):
    from zkodst_tpu.__main__ import main

    assert main(["vectors"]) == 0
    out = capsys.readouterr().out
    assert "vector 5: ok" in out and "vector 3: ok (rejected)" in out


def test_runconfig_defaults_and_mesh(monkeypatch):
    monkeypatch.setenv("DEGREE", "12")
    from zkodst_tpu.config import RunConfig

    cfg = RunConfig()
    assert cfg.k == 12 and cfg.commitment == "kzg"
    mesh, axis = RunConfig(mesh_shape=(2, 4),
                           mesh_axes=("host", "chip")).make_mesh()
    assert mesh.shape == {"host": 2, "chip": 4}
    assert axis == ("host", "chip")


def test_runconfig_accepts_both_backends():
    from zkodst_tpu.config import RunConfig

    assert RunConfig(commitment="ipa").commitment == "ipa"
    assert RunConfig(commitment="kzg").commitment == "kzg"
    with pytest.raises(ValueError, match="commitment"):
        RunConfig(commitment="fri")
    with pytest.raises(NotImplementedError, match="single-chip"):
        RunConfig(commitment="ipa", mesh_shape=(8,))
    with pytest.raises(NotImplementedError, match="BN254|bn254|Pasta"):
        RunConfig(curve="pasta")
