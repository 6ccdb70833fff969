"""Multi-host entry wiring (SURVEY.md §5): flag plumbing and argument
validation, hermetic (spied initialize). The REAL two-process
jax.distributed run lives in tests/test_multihost.py."""

import pytest

from openintel_tpu.parallel import distributed


@pytest.fixture(autouse=True)
def _reset_state(monkeypatch):
    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)


@pytest.fixture
def spy(monkeypatch):
    calls = []
    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    return calls


def test_no_coordinator_is_a_noop(spy):
    assert distributed.initialize_distributed(None) is False
    assert distributed.initialize_distributed("") is False
    assert spy == []


def test_initialize_passes_through(spy):
    assert distributed.initialize_distributed("h0:8476", 2, 1) is True
    assert spy == [
        {"coordinator_address": "h0:8476", "num_processes": 2, "process_id": 1}
    ]


def test_env_var_fallback(spy, monkeypatch):
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    distributed.initialize_distributed("h0:8476")
    assert spy[0]["num_processes"] == 4 and spy[0]["process_id"] == 3


def test_argument_validation(spy):
    with pytest.raises(ValueError, match="together"):
        distributed.initialize_distributed("h0:1", num_processes=2)
    with pytest.raises(ValueError, match="out of range"):
        distributed.initialize_distributed("h0:1", 2, 5)
    with pytest.raises(ValueError, match=">= 1"):
        distributed.initialize_distributed("h0:1", 0, 0)
    assert spy == []


def test_double_initialize_rejected(spy):
    distributed.initialize_distributed("h0:8476", 2, 0)
    with pytest.raises(RuntimeError, match="already initialized"):
        distributed.initialize_distributed("h0:8476", 2, 0)


def test_cli_flags_reach_initialize(spy, tmp_path, capsys):
    """--coordinator on a CLI subcommand initializes the group before work."""
    from openintel_tpu.cli.main import main

    corpus = tmp_path / "c.txt"
    corpus.write_text("quick brown fox\nlazy dogs\n")
    code = main(
        [
            "index", str(corpus), "--out", str(tmp_path / "idx"), "--dim", "32",
            "--coordinator", "h0:8476", "--num-processes", "2",
            "--process-id", "0",
        ]
    )
    capsys.readouterr()
    assert code == 0
    assert spy[0]["coordinator_address"] == "h0:8476"


def test_cli_rejects_bad_flags(capsys):
    from openintel_tpu.cli.main import main

    code = main(
        [
            "search", "q", "--index", "nope",
            "--coordinator", "h0:1", "--num-processes", "2",
        ]
    )
    assert code == 1
    assert "--coordinator" in capsys.readouterr().err
