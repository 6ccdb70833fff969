"""Interactive setup flow tests without a TTY, via injected SetupIo
(reference: src/cli/setup.rs:698+ — happy path, 3-failure exit, EOF,
save-failure fallback, paid-source confirm, --forget)."""

from openintel_tpu.cli.setup import plan, run_setup, SetupIo
from openintel_tpu.config import secrets as sec
from openintel_tpu.config.store import InMemoryStore


class ScriptedIo(SetupIo):
    def __init__(self, lines, tty=True):
        self.lines = list(lines)
        self.output = []

        def read():
            return self.lines.pop(0) if self.lines else ""

        super().__init__(
            read_line=read,
            read_secret=read,
            write=self.output.append,
            is_tty=lambda: tty,
        )

    @property
    def text(self):
        return "".join(self.output)


async def ok_probe(*args):
    return None


def failing_probe_times(n):
    state = {"count": 0}

    async def probe(*args):
        state["count"] += 1
        if state["count"] <= n:
            raise RuntimeError(f"bad credentials (attempt {state['count']})")

    return probe


def test_interactive_happy_path_saves_both_keys():
    store = InMemoryStore()
    io = ScriptedIo(["my-id\n", "my-secret\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 0
    assert "verified and saved" in out
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) == "my-id"
    assert store.get(sec.KEY_REDDIT_CLIENT_SECRET) == "my-secret"


def test_three_failures_exits_and_saves_nothing():
    store = InMemoryStore()
    io = ScriptedIo(["id\n", "sec\n"] * 3)
    out, code = run_setup("reddit", store=store, io=io, probe=failing_probe_times(99))
    assert code == 1
    assert "failed after 3 attempts" in out
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) is None


def test_retry_succeeds_on_second_attempt():
    store = InMemoryStore()
    io = ScriptedIo(["id\n", "sec\n", "id2\n", "sec2\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=failing_probe_times(1))
    assert code == 0
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) == "id2"


def test_eof_aborts_cleanly():
    store = InMemoryStore()
    io = ScriptedIo(["id\n"])  # EOF on the secret prompt
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 1
    assert "aborted" in out
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) is None


def test_empty_input_reasks_bounded():
    store = InMemoryStore()
    io = ScriptedIo(["\n", "  \n", "real-id\n", "secret\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 0
    assert io.text.count("input was empty") == 2


def test_x_requires_cost_confirmation():
    store = InMemoryStore()
    io = ScriptedIo(["bearer-token\n", "n\n"])
    out, code = run_setup("x", store=store, io=io, probe=ok_probe)
    assert code == 1
    assert "cancelled before any paid call" in out
    assert store.get(sec.KEY_X_BEARER) is None

    io = ScriptedIo(["bearer-token\n", "y\n"])
    out, code = run_setup("x", store=store, io=io, probe=ok_probe)
    assert code == 0
    assert store.get(sec.KEY_X_BEARER) == "bearer-token"


def test_save_failure_reports_env_fallback():
    store = InMemoryStore.failing()
    io = ScriptedIo(["id\n", "sec\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 1
    assert "export the env vars" in out


def test_forget_is_idempotent():
    store = InMemoryStore()
    store.set(sec.KEY_REDDIT_CLIENT_ID, "id")
    out, code = run_setup("reddit", forget=True, store=store, io=ScriptedIo([]))
    assert code == 0
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) is None
    out, code = run_setup("reddit", forget=True, store=store, io=ScriptedIo([]))
    assert code == 0  # second delete still succeeds


def test_plan_truth_table():
    """The four non-interactive modes by which credentials resolve
    (reference: src/cli/setup.rs:36-43)."""
    assert plan(True, True) == "verify"
    assert plan(False, True) == "missing_first"
    assert plan(True, False) == "missing_second"
    assert plan(False, False) == "guide"


def test_non_tty_no_creds_prints_guide(monkeypatch):
    monkeypatch.delenv(sec.ENV_REDDIT_CLIENT_ID, raising=False)
    monkeypatch.delenv(sec.ENV_REDDIT_CLIENT_SECRET, raising=False)
    io = ScriptedIo([], tty=False)
    out, code = run_setup("reddit", store=InMemoryStore(), io=io, probe=ok_probe)
    assert code == 1
    assert "Reddit setup" in out
    assert "OPENINTEL_REDDIT_CLIENT_ID: unset" in out
    assert "OPENINTEL_REDDIT_CLIENT_SECRET: unset" in out


def test_non_tty_partial_names_missing_variable(monkeypatch):
    """Half-configured: the warning names exactly the unset variable and the
    probe never runs (setup.rs partial plan)."""
    probe_calls = []

    async def spy_probe(*args):
        probe_calls.append(args)
        return 1

    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_ID, "id-only")
    monkeypatch.delenv(sec.ENV_REDDIT_CLIENT_SECRET, raising=False)
    io = ScriptedIo([], tty=False)
    out, code = run_setup("reddit", store=InMemoryStore(), io=io, probe=spy_probe)
    assert code == 1
    assert "half-configured" in out
    assert "OPENINTEL_REDDIT_CLIENT_SECRET is not set" in out
    assert probe_calls == []


def test_non_tty_verify_probes_resolved_creds(monkeypatch):
    """Both creds set -> live probe with the resolved values, OK evidence
    line + try command, exit 0 (setup.rs verify plan)."""
    probe_calls = []

    async def spy_probe(*args):
        probe_calls.append(args)
        return 3

    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_ID, "env-id")
    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_SECRET, "env-secret")
    io = ScriptedIo([], tty=False)
    out, code = run_setup("reddit", store=InMemoryStore(), io=io, probe=spy_probe)
    assert code == 0
    assert probe_calls == [("env-id", "env-secret")]
    assert "OK: Reddit is configured and working" in out
    assert "pulled 3 recent post(s)" in out
    assert "openintel analyze GME --enable-reddit" in out


def test_non_tty_verify_zero_posts_is_still_ok(monkeypatch):
    async def empty_probe(*args):
        return 0

    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_ID, "id")
    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_SECRET, "secret")
    io = ScriptedIo([], tty=False)
    out, code = run_setup("reddit", store=InMemoryStore(), io=io, probe=empty_probe)
    assert code == 0
    assert "no recent posts" in out


def test_non_tty_verify_failure_maps_hint(monkeypatch):
    async def bad_probe(*args):
        raise RuntimeError("reddit: unauthorized (401)")

    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_ID, "id")
    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_SECRET, "wrong")
    io = ScriptedIo([], tty=False)
    out, code = run_setup("reddit", store=InMemoryStore(), io=io, probe=bad_probe)
    assert code == 1
    assert "FAILED:" in out
    assert "reddit.com/prefs/apps" in out  # the unauthorized hint


def test_verify_flag_forces_noninteractive_on_tty(monkeypatch):
    """--verify on a real TTY still takes the probe-and-exit path; no
    prompts are consumed."""
    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_ID, "id")
    monkeypatch.setenv(sec.ENV_REDDIT_CLIENT_SECRET, "secret")
    io = ScriptedIo(["would-be-eaten\n"], tty=True)
    out, code = run_setup(
        "reddit", verify=True, store=InMemoryStore(), io=io, probe=ok_probe
    )
    assert code == 0
    assert io.lines == ["would-be-eaten\n"]  # nothing consumed


def test_verify_resolves_from_keychain_when_env_unset(monkeypatch):
    """env -> keychain precedence: verify works off stored credentials too."""
    monkeypatch.delenv(sec.ENV_REDDIT_CLIENT_ID, raising=False)
    monkeypatch.delenv(sec.ENV_REDDIT_CLIENT_SECRET, raising=False)
    store = InMemoryStore()
    store.set(sec.KEY_REDDIT_CLIENT_ID, "kc-id")
    store.set(sec.KEY_REDDIT_CLIENT_SECRET, "kc-secret")
    probe_calls = []

    async def spy_probe(*args):
        probe_calls.append(args)
        return 1

    out, code = run_setup(
        "reddit", verify=True, store=store, io=ScriptedIo([]), probe=spy_probe
    )
    assert code == 0
    assert probe_calls == [("kc-id", "kc-secret")]


def test_x_verify_announces_cost(monkeypatch):
    """The paid source states its cost up front even when it cannot confirm
    interactively (setup.rs:662-686)."""
    monkeypatch.setenv(sec.ENV_X_BEARER, "tok")
    io = ScriptedIo([], tty=False)
    out, code = run_setup("x", store=InMemoryStore(), io=io, probe=ok_probe)
    assert code == 0
    assert "$0.05" in out


def test_replace_existing_accepted_overwrites():
    """Stored credentials + 'y' -> prompts run, new values overwrite
    (reference: src/cli/setup.rs:698+ replace flow)."""
    store = InMemoryStore()
    store.set(sec.KEY_REDDIT_CLIENT_ID, "old-id")
    store.set(sec.KEY_REDDIT_CLIENT_SECRET, "old-secret")
    io = ScriptedIo(["y\n", "new-id\n", "new-secret\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 0 and "verified and saved" in out
    assert "Replace them?" in io.text
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) == "new-id"
    assert store.get(sec.KEY_REDDIT_CLIENT_SECRET) == "new-secret"


def test_replace_existing_declined_keeps_stored():
    """Declining the replace prompt exits 0 and touches nothing; no probe,
    no prompts for values."""
    probe_calls = []

    async def spy_probe(*args):
        probe_calls.append(args)

    store = InMemoryStore()
    store.set(sec.KEY_REDDIT_CLIENT_ID, "old-id")
    store.set(sec.KEY_REDDIT_CLIENT_SECRET, "old-secret")
    io = ScriptedIo(["n\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=spy_probe)
    assert code == 0
    assert "keeping existing credentials" in out
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) == "old-id"
    assert store.get(sec.KEY_REDDIT_CLIENT_SECRET) == "old-secret"
    assert probe_calls == []
    # the guide/prompts never ran
    assert "client id:" not in io.text


def test_forget_then_setup_skips_replace_prompt():
    """--forget removes stored credentials; the next setup goes straight to
    the prompts (no replace question)."""
    store = InMemoryStore()
    store.set(sec.KEY_REDDIT_CLIENT_ID, "old-id")
    store.set(sec.KEY_REDDIT_CLIENT_SECRET, "old-secret")
    out, code = run_setup("reddit", forget=True, store=store, io=ScriptedIo([]))
    assert code == 0 and "removed" in out
    io = ScriptedIo(["fresh-id\n", "fresh-secret\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 0
    assert "Replace them?" not in io.text
    assert store.get(sec.KEY_REDDIT_CLIENT_ID) == "fresh-id"


def test_replace_prompt_survives_broken_store():
    """A broken keychain degrades to 'nothing stored': setup still runs
    (it will then fail at save time with the env-fallback message)."""
    store = InMemoryStore.failing()
    io = ScriptedIo(["id\n", "secret\n"])
    out, code = run_setup("reddit", store=store, io=io, probe=ok_probe)
    assert code == 1
    assert "could not save to keychain" in out
