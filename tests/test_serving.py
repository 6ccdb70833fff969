"""BatchCoalescer: concurrent small request waves must fuse into few device
batches with every caller getting exactly its own rows (the serving-layer
answer to the measured batch-64 corpus-stream floor, docs/benchmarks.md)."""

import threading

import numpy as np
import pytest

from openintel_tpu.models.retrievers import SearchResult
from openintel_tpu.serving import BatchCoalescer


def echo_search(queries, k=10):
    """Deterministic fake: row i's top hit encodes the query's own number."""
    ids = np.zeros((len(queries), k), np.int32) - 1
    scores = np.zeros((len(queries), k), np.float32)
    for i, q in enumerate(queries):
        ids[i, 0] = int(q.split("-")[1])
        scores[i, 0] = 1.0
    return SearchResult(ids=ids, scores=scores)


def test_concurrent_waves_fuse_and_route_correctly():
    co = BatchCoalescer(echo_search, max_batch=64, max_wait_ms=50.0)
    results = {}
    errors = []

    def worker(base):
        try:
            qs = [f"q-{base + j}" for j in range(8)]
            res = co.search(qs, k=4)
            results[base] = res
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(b * 100,)) for b in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    assert len(results) == 8
    for base, res in results.items():
        assert res.ids.shape == (8, 4)
        np.testing.assert_array_equal(
            res.ids[:, 0], [base + j for j in range(8)]
        )
    # 8 waves x 8 queries = 64 = max_batch -> ideally 1 fused call; allow a
    # little scheduling slack but far fewer calls than requests
    assert co.batches_run <= 3, co.batches_run
    assert co.queries_run == 64


def test_quiet_queue_flushes_after_wait():
    co = BatchCoalescer(echo_search, max_batch=1000, max_wait_ms=10.0)
    res = co.search(["q-7"], k=2)  # alone: must not hang
    assert res.ids[0, 0] == 7
    assert co.batches_run == 1


def test_full_batch_bypasses_queue():
    co = BatchCoalescer(echo_search, max_batch=4, max_wait_ms=1000.0)
    res = co.search([f"q-{i}" for i in range(4)], k=3)
    np.testing.assert_array_equal(res.ids[:, 0], [0, 1, 2, 3])
    assert co.batches_run == 1  # direct, no wait window


def test_mixed_k_trims_per_caller():
    co = BatchCoalescer(echo_search, max_batch=8, max_wait_ms=20.0)
    out = {}

    def w(name, k):
        out[name] = co.search([f"q-{k}"], k=k)

    ts = [threading.Thread(target=w, args=(f"r{k}", k)) for k in (2, 5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=10)
    assert out["r2"].ids.shape == (1, 2)
    assert out["r5"].ids.shape == (1, 5)
    assert out["r2"].ids[0, 0] == 2 and out["r5"].ids[0, 0] == 5


def test_search_fn_error_propagates_to_every_caller():
    def boom(queries, k=10):
        raise RuntimeError("device fell over")

    co = BatchCoalescer(boom, max_batch=8, max_wait_ms=5.0)
    with pytest.raises(RuntimeError, match="device fell over"):
        co.search(["q-1"], k=2)


def test_empty_request_short_circuits():
    calls = []

    def spy(queries, k=10):
        calls.append(queries)
        return echo_search(queries, k)

    co = BatchCoalescer(spy, max_batch=8)
    res = co.search([], k=5)
    assert res.ids.shape == (0, 5)
    assert calls == []


def test_end_to_end_with_real_retriever():
    from openintel_tpu.models.retrievers import HybridRetriever

    docs = [
        "the quick brown fox",
        "lazy dogs sleep all day",
        "market analysis of tech stocks",
        "foxes and dogs living together",
    ]
    r = HybridRetriever.build(docs, dim=32)
    co = BatchCoalescer(
        lambda qs, k: r.search(qs, k=k, candidates_per_arm=2 * k),
        max_batch=4, max_wait_ms=10.0,
    )
    res = co.search(["quick fox"], k=2)
    assert res.ids[0, 0] == 0


def test_fused_waves_never_exceed_max_batch():
    """Two concurrent 200-query callers at max_batch=256 must fuse into
    waves of <= 256 queries — an oversize wave would hit a jit batch
    bucket the serving config never provisioned (review finding: the old
    take-the-whole-queue flush could run up to ~2x max_batch)."""
    import threading

    import numpy as np

    from openintel_tpu.models.retrievers import SearchResult
    from openintel_tpu.serving import BatchCoalescer

    sizes = []

    def fake_search(queries, k=10):
        sizes.append(len(queries))
        n = len(queries)
        return SearchResult(
            ids=np.zeros((n, k), np.int32), scores=np.zeros((n, k), np.float32)
        )

    co = BatchCoalescer(fake_search, max_batch=256, max_wait_ms=30.0)
    results = [None, None]

    def call(i):
        results[i] = co.search([f"q{i}-{j}" for j in range(200)], k=5)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r.ids.shape == (200, 5) for r in results)
    assert sum(sizes) == 400
    assert max(sizes) <= 256, sizes


def test_oldest_inflight_tracks_hung_device_calls():
    """A device call that blocks (backend died mid-serving) must be visible
    through oldest_inflight_s(); idle coalescers report None — the health
    signal server_stats exposes for orchestrators."""
    import threading
    import time

    import numpy as np

    from openintel_tpu.models.retrievers import SearchResult
    from openintel_tpu.serving import BatchCoalescer

    release = threading.Event()

    def slow_search(queries, k=10):
        release.wait(timeout=10)
        n = len(queries)
        return SearchResult(
            ids=np.zeros((n, k), np.int32),
            scores=np.zeros((n, k), np.float32),
        )

    co = BatchCoalescer(slow_search, max_batch=4, max_wait_ms=1.0)
    assert co.oldest_inflight_s() is None
    t = threading.Thread(
        target=lambda: co.search(["a", "b", "c", "d"], k=3), daemon=True
    )
    t.start()
    deadline = time.time() + 5
    while co.oldest_inflight_s() is None and time.time() < deadline:
        time.sleep(0.01)
    stuck = co.oldest_inflight_s()
    assert stuck is not None and stuck >= 0
    time.sleep(0.05)
    assert co.oldest_inflight_s() > stuck  # grows while hung
    release.set()
    t.join(timeout=5)
    assert co.oldest_inflight_s() is None  # cleared on completion


def test_fuse_filter_entries():
    from openintel_tpu.serving import fuse_filter_entries

    m1 = np.array([True, False, True])
    m2 = np.array([False, True, True])
    # all-None -> unfiltered program
    assert fuse_filter_entries([None, None]) == (None, None)
    # dedup by KEY (mask arrays are never compared)
    masks, groups = fuse_filter_entries(
        [("a", m1), None, ("b", m2), ("a", m1)]
    )
    assert masks.shape == (3, 3) and groups.tolist() == [0, 1, 2, 0]
    np.testing.assert_array_equal(masks[0], m1)
    assert masks[1].all()  # shared all-True row for unfiltered queries
    np.testing.assert_array_equal(masks[2], m2)


def test_filtered_requests_coalesce():
    """Concurrent callers with DIFFERENT filters fuse into ONE grouped
    device batch; each caller's rows come back filtered by its own mask."""
    import threading

    from openintel_tpu.models.retrievers import SearchResult
    from openintel_tpu.serving import BatchCoalescer

    calls = []

    def search_fn(queries, k=10, filter_mask=None, filter_group=None):
        calls.append((list(queries), filter_mask, filter_group))
        n = len(queries)
        # echo each query's group index as its top doc id (pseudo-search
        # that proves the right mask row reached the right query)
        g = (
            filter_group
            if filter_group is not None
            else np.zeros(n, np.int32)
        )
        ids = np.tile(np.arange(k, dtype=np.int32), (n, 1))
        ids[:, 0] = g
        return SearchResult(
            ids=ids, scores=np.zeros((n, k), np.float32)
        )

    co = BatchCoalescer(search_fn, max_batch=4, max_wait_ms=50.0)
    n_docs = 6
    mask_a = np.zeros(n_docs, bool)
    mask_b = np.ones(n_docs, bool)
    results = {}

    def call(name, filters):
        results[name] = co.search(["q_" + name], k=3, filters=filters)

    threads = [
        threading.Thread(target=call, args=("a", [(("a",), mask_a)])),
        threading.Thread(target=call, args=("b", [(("b",), mask_b)])),
        threading.Thread(target=call, args=("plain", None)),
        threading.Thread(target=call, args=("a2", [(("a",), mask_a)])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)

    assert co.batches_run == 1 and co.queries_run == 4  # ONE fused wave
    queries, masks, groups = calls[0]
    assert masks.shape[0] == 3  # a, b, unfiltered — deduped by key
    by_q = dict(zip(queries, groups.tolist()))
    assert by_q["q_a"] == by_q["q_a2"] != by_q["q_b"]
    # each caller got its own group's row back
    assert results["a"].ids[0, 0] == by_q["q_a"]
    assert results["b"].ids[0, 0] == by_q["q_b"]
    assert results["plain"].ids[0, 0] == by_q["q_plain"]


def test_unfiltered_wave_stays_on_plain_program():
    """A wave with no filtered requests must call search_fn WITHOUT filter
    kwargs — the unfiltered fused program keeps serving."""
    from openintel_tpu.models.retrievers import SearchResult
    from openintel_tpu.serving import BatchCoalescer

    seen = []

    def search_fn(queries, k=10, **kw):
        seen.append(kw)
        n = len(queries)
        return SearchResult(
            ids=np.zeros((n, k), np.int32),
            scores=np.zeros((n, k), np.float32),
        )

    co = BatchCoalescer(search_fn, max_batch=2, max_wait_ms=5.0)
    co.search(["a", "b"], k=3, filters=[None, None])
    assert seen == [{}]

    with pytest.raises(ValueError, match="align"):
        co.search(["a", "b"], k=3, filters=[None])


# ---------------------------------------------------------------------------
# PipelinedSearcher: overlapped plan/stage -> device -> copy for wave streams
# ---------------------------------------------------------------------------


def _pipeline_fixture(n_docs=300, dim=64):
    from openintel_tpu.models.retrievers import HybridRetriever
    from openintel_tpu.ops.bm25 import encode_query

    texts = [f"tok{i} alpha beta{i % 13} gamma{i % 5}" for i in range(n_docs)]
    r = HybridRetriever.build(texts, dim=dim, device_batch=8)
    waves = []
    for w in range(4):
        queries = [f"tok{(w * 7 + j) % n_docs} alpha" for j in range(5 + w)]
        term_ids = [encode_query(r.bm25.index, t) for t in queries]
        waves.append((term_ids, r.dense.embedder(queries)))
    return r, waves


def test_pipelined_stream_matches_sequential():
    """Every wave's pipelined result is bit-identical to the sequential
    prepare->run_prepared path, in order (incl. a filtered wave)."""
    from openintel_tpu.serving import PipelinedSearcher

    r, waves = _pipeline_fixture()
    mask = np.zeros(r.n_docs, bool)
    mask[::2] = True
    waves.append((waves[0][0], waves[0][1], {"filter_mask": mask}))

    pipe = PipelinedSearcher(r, depth=2)
    got = list(pipe.run_prepared_stream(iter(waves), k=5))
    assert len(got) == len(waves)
    for wave, res in zip(waves, got):
        term_ids, emb, *rest = wave
        want = r.run_prepared(
            r.prepare(term_ids, emb, k=5, **(rest[0] if rest else {}))
        )
        np.testing.assert_array_equal(res.ids, want.ids)
        np.testing.assert_allclose(res.scores, want.scores, rtol=1e-6)


def test_pipelined_search_stream_strings():
    from openintel_tpu.serving import PipelinedSearcher

    r, _ = _pipeline_fixture(n_docs=100)
    pipe = PipelinedSearcher(r)
    out = list(
        pipe.search_stream(iter([["tok3 alpha"], ["tok7 alpha", "beta2"]]), k=4)
    )
    assert [o.ids.shape for o in out] == [(1, 4), (2, 4)]
    assert 3 in out[0].ids[0] and 7 in out[1].ids[0]


def test_pipelined_stream_handles_empty_wave():
    from openintel_tpu.serving import PipelinedSearcher

    r, waves = _pipeline_fixture(n_docs=100)
    stream = [waves[0], ([], np.zeros((0, 64), np.float32)), waves[1]]
    got = list(PipelinedSearcher(r).run_prepared_stream(iter(stream), k=5))
    assert [g.ids.shape[0] for g in got] == [
        len(waves[0][0]), 0, len(waves[1][0])
    ]
    want = r.run_prepared(r.prepare(*waves[1], k=5))
    np.testing.assert_array_equal(got[2].ids, want.ids)


def test_pipelined_stream_producer_error_propagates():
    from openintel_tpu.serving import PipelinedSearcher

    r, waves = _pipeline_fixture(n_docs=100)

    def bad_waves():
        yield waves[0]
        raise RuntimeError("ingest exploded")

    it = PipelinedSearcher(r).run_prepared_stream(bad_waves(), k=5)
    first = next(it)
    assert first.ids.shape[0] == len(waves[0][0])
    with pytest.raises(RuntimeError, match="ingest exploded"):
        list(it)
