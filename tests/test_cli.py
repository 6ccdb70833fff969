"""CLI end-to-end tests via main(argv) with --offline fixtures."""

import json

import pytest

from openintel_tpu.cli.main import main


def run_cli(capsys, *argv):
    code = main(list(argv))
    out = capsys.readouterr().out
    return out, code


def test_analyze_offline_table(capsys):
    out, code = run_cli(capsys, "analyze", "AAPL", "--offline")
    assert code == 0
    assert "=== OpenIntel — AAPL ===" in out
    assert "mentions: 10 (bull 7 / bear 2 / neutral 1)" in out
    assert "net sentiment: +0.50" in out
    assert "speculation index: 30%" in out
    assert "alignment: confirming_bullish" in out
    assert "crowding: 50%" in out
    assert "Not financial advice" in out


def test_analyze_offline_json_golden(capsys):
    out, code = run_cli(capsys, "analyze", "AAPL", "--offline", "--format", "json")
    assert code == 0
    doc = json.loads(out)
    assert doc["social"]["total_mentions"] == 10
    assert doc["fusion"]["alignment"] == "confirming_bullish"
    assert abs(doc["fusion"]["crowding"] - 0.49669) < 1e-3
    assert doc["social"]["mentions_by_source"] == {"bluesky": 6, "reddit": 4}
    assert "disclaimer" in doc


def test_analyze_reddit_only(capsys):
    out, code = run_cli(
        capsys, "analyze", "AAPL", "--offline", "--reddit", "--format", "json"
    )
    doc = json.loads(out)
    assert doc["social"]["total_mentions"] == 4


def test_analyze_no_market_quiet(capsys):
    out, code = run_cli(
        capsys, "analyze", "AAPL", "--offline", "--no-market", "--format", "json"
    )
    doc = json.loads(out)
    assert doc["market"] is None
    assert doc["fusion"]["alignment"] == "quiet"
    assert "(disabled)" in run_cli(capsys, "analyze", "AAPL", "--offline", "--no-market")[0]


def test_analyze_bad_ticker_errors(capsys):
    out, code = run_cli(capsys, "analyze", "$$$", "--offline")
    assert code == 1
    assert "invalid ticker" in out


def test_scan_offline(capsys):
    out, code = run_cli(capsys, "scan", "AAPL", "TSLA", "$$$", "--offline")
    assert code == 0
    assert "AAPL: confirming_bullish" in out
    assert "TSLA: confirming_bullish" in out
    assert "$$$: error" in out


def test_compare_offline_json(capsys):
    out, code = run_cli(
        capsys,
        "compare", "AAPL", "MSFT", "--offline", "--format", "json",
        "--rank-by", "net_sentiment",
    )
    doc = json.loads(out)
    assert doc["rank_by"] == "net_sentiment"
    assert len(doc["ranked"]) == 2
    assert doc["ranked"][0]["rank_metric"] == pytest.approx(0.5)


def test_risk_offline_golden(capsys):
    out, code = run_cli(
        capsys, "risk", "NVDA", "--budget", "200", "--offline", "--format", "json"
    )
    assert code == 0
    doc = json.loads(out)
    assert doc["atr"] == pytest.approx(4.0)
    assert doc["stop"] == pytest.approx(98.0)
    assert doc["shares"] == 25
    assert doc["max_loss_usd"] == pytest.approx(200.0)
    assert doc["targets"] == [114.0, 122.0, 130.0]
    assert "calculator" in doc["framing"]


def test_risk_table_renders(capsys):
    out, code = run_cli(capsys, "risk", "NVDA", "--budget", "200", "--offline")
    assert "stop: 98.00" in out
    assert "a calculator, not advice" in out


def test_index_and_search_roundtrip(tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "the quick brown fox\n"
        "lazy dogs sleep all day\n"
        "market analysis of tech stocks\n"
        "foxes and dogs living together\n"
    )
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx"), "--dim", "64"
    )
    assert code == 0 and "indexed 4 docs" in out

    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "2", "--format", "json",
    )
    assert code == 0
    doc = json.loads(out)
    assert doc[0]["hits"][0]["doc_id"] == 0
    assert "quick brown fox" in doc[0]["hits"][0]["text"]

    out, code = run_cli(
        capsys,
        "search", "lazy dogs", "--index", str(tmp_path / "idx"), "--mode", "bm25",
    )
    assert code == 0 and "doc 1" in out

    # the measured-loser fusion stays one flag away (--fusion rrf), and
    # --blend-alpha composes with the zblend default
    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "2", "--format", "json", "--fusion", "rrf",
    )
    assert code == 0
    assert json.loads(out)[0]["hits"][0]["doc_id"] == 0
    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "2", "--format", "json", "--blend-alpha", "0.5",
    )
    assert code == 0
    assert json.loads(out)[0]["hits"][0]["doc_id"] == 0
    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "--fusion", "rrf", "--blend-alpha", "0.5",
    )
    assert code == 1 and "--blend-alpha only applies" in out


def test_train_index_search_with_encoder(tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "the quick brown fox\n"
        "lazy dogs sleep all day\n"
        "market analysis of tech stocks\n"
        "foxes and dogs living together\n"
    )
    out, code = run_cli(
        capsys,
        "train", str(corpus), "--out", str(tmp_path / "ck"),
        "--steps", "3", "--dim", "32", "--depth", "1", "--heads", "2",
        "--batch-size", "4",
    )
    assert code == 0 and "trained to step 3" in out
    # resume: asking for the same step count is a no-op
    out, code = run_cli(
        capsys,
        "train", str(corpus), "--out", str(tmp_path / "ck"),
        "--steps", "3", "--dim", "32", "--depth", "1", "--heads", "2",
    )
    assert code == 0 and "nothing to do" in out

    out, code = run_cli(
        capsys,
        "index", str(corpus), "--out", str(tmp_path / "idx"),
        "--encoder", str(tmp_path / "ck"),
    )
    assert code == 0 and "32d" in out
    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "--encoder", str(tmp_path / "ck"), "-k", "2", "--format", "json",
    )
    assert code == 0
    assert json.loads(out)[0]["hits"][0]["doc_id"] in (0, 3)


def test_index_meta_guards_embedder_mismatch(tmp_path, capsys):
    corpus = tmp_path / "c.txt"
    corpus.write_text("quick brown fox\nlazy dogs sleep\nfox dog fox\nmore text\n")
    run_cli(
        capsys,
        "train", str(corpus), "--out", str(tmp_path / "ck"),
        "--steps", "2", "--dim", "32", "--depth", "1", "--heads", "2",
    )
    run_cli(
        capsys,
        "index", str(corpus), "--out", str(tmp_path / "idx"),
        "--encoder", str(tmp_path / "ck"),
    )
    # neural-embedded index without --encoder: refused with a clear error
    out, code = run_cli(
        capsys, "search", "quick fox", "--index", str(tmp_path / "idx")
    )
    assert code == 1 and "trained encoder" in out
    # hashing-embedded index with --encoder: also refused
    run_cli(capsys, "index", str(corpus), "--out", str(tmp_path / "idx2"), "--dim", "32")
    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx2"),
        "--encoder", str(tmp_path / "ck"),
    )
    assert code == 1 and "hashing" in out


def test_missing_index_friendly_error(tmp_path, capsys):
    out, code = run_cli(
        capsys, "search", "x", "--index", str(tmp_path / "nope")
    )
    assert code == 1  # FileNotFoundError surfaces as a one-line error


def test_pulse_not_configured_message(capsys, monkeypatch):
    for var in ("OPENINTEL_X_BEARER",):
        monkeypatch.delenv(var, raising=False)
    out, code = run_cli(capsys, "pulse", "TSLA")
    assert code == 1
    assert "not configured" in out


def test_index_meta_guards_wrong_encoder_dim(tmp_path):
    """A *different* trained checkpoint (other run, other width) than the one
    that built the index must be rejected, not score garbage."""
    import json as _json

    from openintel_tpu.cli.main import check_index_meta

    (tmp_path / "idx.meta.json").write_text(
        _json.dumps({"embedder": "neural", "dim": 64})
    )

    class Stub:
        dim = 32

    err = check_index_meta(str(tmp_path / "idx"), "some/ckpt", Stub())
    assert err is not None and "64d" in err and "32d" in err
    # matching dim passes
    Stub.dim = 64
    assert check_index_meta(str(tmp_path / "idx"), "some/ckpt", Stub()) is None


def test_risk_batch_screen_offline(capsys):
    out, code = run_cli(
        capsys, "risk", "NVDA", "AMD", "--budget", "200", "--offline"
    )
    assert code == 0
    assert "NVDA: entry 106.00  stop 98.00" in out
    assert "AMD: entry 106.00  stop 98.00" in out
    assert "a calculator, not advice" in out

    out, code = run_cli(
        capsys, "risk", "NVDA", "AMD", "--budget", "200", "--offline",
        "--format", "json",
    )
    assert code == 0
    doc = json.loads(out)
    assert [d["ticker"] for d in doc] == ["NVDA", "AMD"]
    assert doc[0]["atr"] == pytest.approx(4.0)

    out, code = run_cli(
        capsys, "risk", "NVDA", "AMD", "--budget", "200", "--offline",
        "--entry", "100",
    )
    assert code == 1 and "--entry only applies" in out


def test_doctor_reports_environment(tmp_path, capsys):
    out, code = run_cli(capsys, "doctor")
    assert code == 0
    assert "openintel-tpu" in out and "jax" in out
    assert "native tier" in out and "default dense kernel" in out
    assert "status: ok" in out

    corpus = tmp_path / "c.txt"
    corpus.write_text("quick brown fox\nlazy dogs sleep\nfox dog fox\n")
    run_cli(capsys, "index", str(corpus), "--out", str(tmp_path / "idx"),
            "--dim", "32")
    out, code = run_cli(capsys, "doctor", "--index", str(tmp_path / "idx"))
    assert code == 0
    assert "3 docs" in out and "32d" in out and "— OK" in out

    out, code = run_cli(capsys, "doctor", "--index", str(tmp_path / "nope"))
    assert code == 1 and "INVALID" in out


def test_device_commands_fail_fast_when_backend_unresponsive(
    capsys, monkeypatch
):
    """The dispatch gate routes device-path commands through
    ensure_backend_responsive; pure-host commands must skip it (they keep
    working with the accelerator stack dead — serving-resilience spec)."""
    import openintel_tpu.cli.main as m

    def hung(timeout_s=None):
        raise RuntimeError("jax backend did not initialize within 1s")

    monkeypatch.setattr(m, "ensure_backend_responsive", hung)
    code = m.main(["scan", "AAPL", "MSFT", "--offline"])
    err = capsys.readouterr().err
    assert code == 1 and "did not initialize" in err

    # batch risk gates; single-ticker risk is pure host math and must not
    out, code = run_cli(capsys, "risk", "NVDA", "--budget", "200",
                        "--offline")
    assert code == 0 and "Risk frame" in out
    code = m.main(["risk", "NVDA", "AMD", "--budget", "200", "--offline"])
    err = capsys.readouterr().err
    assert code == 1 and "did not initialize" in err

    # analyze never gates
    out, code = run_cli(capsys, "analyze", "AAPL", "--offline")
    assert code == 0 and "OpenIntel" in out


def test_parse_id_list():
    from openintel_tpu.cli.main import parse_id_list

    assert parse_id_list(None) is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty doc-id list"):
        parse_id_list("")  # a PRESENT-but-empty flag must never pass silently
    assert parse_id_list("3,5,9") == [3, 5, 9]
    assert parse_id_list("10-13") == [10, 11, 12, 13]
    assert parse_id_list("3, 10-12 ,512") == [3, 10, 11, 12, 512]
    assert parse_id_list("-1") == [-1]  # parses; range check is downstream
    import pytest

    with pytest.raises(ValueError, match="bad doc-id item"):
        parse_id_list("3,abc")
    with pytest.raises(ValueError, match="bad doc-id item"):
        parse_id_list("9-5")


def test_search_filtered_flags(tmp_path, capsys):
    """--exclude-ids removes a doc from the ranking; --include-ids restricts
    to a subset; bad specs and --mesh composition fail cleanly."""
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "the quick brown fox\n"
        "lazy dogs sleep all day\n"
        "market analysis of tech stocks\n"
        "foxes and dogs living together\n"
    )
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx"), "--dim", "64"
    )
    assert code == 0

    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "2", "--format", "json", "--exclude-ids", "0",
    )
    assert code == 0
    hits = json.loads(out)[0]["hits"]
    assert hits and all(h["doc_id"] != 0 for h in hits)

    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "4", "--format", "json", "--include-ids", "1-2",
    )
    assert code == 0
    hits = json.loads(out)[0]["hits"]
    assert hits and {h["doc_id"] for h in hits} <= {1, 2}

    out, code = run_cli(
        capsys,
        "search", "x", "--index", str(tmp_path / "idx"), "--exclude-ids", "abc",
    )
    assert code == 1 and "bad doc-id item" in out

    out, code = run_cli(
        capsys,
        "search", "x", "--index", str(tmp_path / "idx"), "--exclude-ids", "99",
    )
    assert code == 1 and "out of range" in out

    out, code = run_cli(
        capsys,
        "search", "quick fox", "--index", str(tmp_path / "idx"),
        "-k", "2", "--format", "json",
        "--mesh", "4", "--exclude-ids", "0",
    )
    assert code == 0  # filtered + mesh compose (sharded filtered program)
    hits = json.loads(out)[0]["hits"]
    assert hits and all(h["doc_id"] != 0 for h in hits)


def test_index_append(tmp_path, capsys):
    """`index --append` adds docs to a saved index in place: old ids
    stable, new docs searchable, combined statistics recomputed (equal to
    a from-scratch build over the concatenated corpus)."""
    c1 = tmp_path / "c1.txt"
    c1.write_text("\n".join(f"doc {i} topic{i % 3}" for i in range(20)) + "\n")
    c2 = tmp_path / "c2.txt"
    c2.write_text("fresh zebra document\nanother zebra story\n")
    idx = str(tmp_path / "idx")
    out, code = run_cli(capsys, "index", str(c1), "--out", idx, "--dim", "32")
    assert code == 0
    out, code = run_cli(
        capsys, "index", str(c2), "--out", idx, "--append"
    )
    assert code == 0 and "appended 2 docs (ids 20..21)" in out

    out, code = run_cli(
        capsys, "search", "zebra", "--index", idx, "-k", "2",
        "--format", "json",
    )
    assert code == 0
    hits = json.loads(out)[0]["hits"]
    assert {h["doc_id"] for h in hits} == {20, 21}
    assert "zebra" in hits[0]["text"]

    # combined index == from-scratch build over the concatenation
    from openintel_tpu.index.checkpoint import load_postings
    from openintel_tpu.index.build import build_postings_index

    got = load_postings(f"{idx}.postings.npz")
    want = build_postings_index(
        [ln for ln in (c1.read_text() + c2.read_text()).splitlines() if ln]
    )
    assert got.n_docs == want.n_docs == 22
    assert abs(got.avgdl - want.avgdl) < 1e-6
    import numpy as np

    np.testing.assert_allclose(got.idf[: want.idf.shape[0]], want.idf, rtol=1e-6)


def test_index_append_requires_existing(tmp_path, capsys):
    c = tmp_path / "c.txt"
    c.write_text("a doc\n")
    out, code = run_cli(
        capsys, "index", str(c), "--out", str(tmp_path / "nope"), "--append"
    )
    assert code == 1 and "needs an existing index" in out


def test_filter_flag_validation(tmp_path, capsys):
    """Filter-flag footguns error loudly: empty specs (unset shell vars),
    huge typo'd ranges — never a silent unfiltered search or an OOM."""
    c = tmp_path / "c.txt"
    c.write_text("\n".join(f"doc {i}" for i in range(10)) + "\n")
    idx = str(tmp_path / "idx")
    out, code = run_cli(capsys, "index", str(c), "--out", idx, "--dim", "16")
    assert code == 0
    out, code = run_cli(
        capsys, "search", "doc", "--index", idx, "--include-ids", ""
    )
    assert code == 1 and "empty doc-id list" in out
    out, code = run_cli(
        capsys, "search", "doc", "--index", idx,
        "--exclude-ids", "0-9999999999",
    )
    assert code == 1 and "out of range" in out


def test_index_dense_store_flag(tmp_path, capsys):
    """--dense-store wires storage precision end-to-end: checkpoint meta
    records it, the loaded matrix carries it, doctor reports it, and search
    serves whichever precision is stored (VERDICT r4 item 9)."""
    import ml_dtypes
    import numpy as np

    from openintel_tpu.index.checkpoint import load_dense

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "the quick brown fox\nlazy dogs sleep all day\n"
        "market analysis of tech stocks\nfoxes and dogs living together\n"
    )
    for store, want in (
        ("f32", np.dtype(np.float32)),
        ("bf16", np.dtype(ml_dtypes.bfloat16)),
    ):
        prefix = tmp_path / f"idx_{store}"
        out, code = run_cli(
            capsys, "index", str(corpus), "--out", str(prefix),
            "--dim", "64", "--dense-store", store,
        )
        assert code == 0 and f"dense store {store}" in out
        assert load_dense(f"{prefix}.dense.npz").embeddings.dtype == want
        meta = json.loads((tmp_path / f"idx_{store}.meta.json").read_text())
        assert meta["dense_store"] == store
        out, code = run_cli(capsys, "doctor", "--index", str(prefix))
        assert code == 0 and f"store {store}" in out
        out, code = run_cli(
            capsys, "search", "quick fox", "--index", str(prefix),
            "-k", "1", "--format", "json",
        )
        assert code == 0
        assert json.loads(out)[0]["hits"][0]["doc_id"] == 0

    # --bf16 stays a working alias; conflicting combo is rejected
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx_a"),
        "--dim", "64", "--bf16",
    )
    assert code == 0 and "dense store bf16" in out
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx_b"),
        "--dim", "64", "--bf16", "--dense-store", "f32",
    )
    assert code == 1 and "conflicts" in out

    # --append keeps the existing precision and refuses a conflicting flag
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx_a"),
        "--append", "--dense-store", "f32",
    )
    assert code == 1 and "keeps the existing precision" in out
    out, code = run_cli(
        capsys, "index", str(corpus), "--out", str(tmp_path / "idx_a"),
        "--append",
    )
    assert code == 0
    emb = load_dense(f"{tmp_path / 'idx_a'}.dense.npz").embeddings
    assert emb.dtype == np.dtype(ml_dtypes.bfloat16) and emb.shape[0] == 8
