"""Pallas fused dense top-k kernel vs the XLA baseline and NumPy reference.

Runs in interpreter mode on CPU (hermetic); the compiled path is exercised on
real TPU by bench.py and the driver's compile check.
"""

import numpy as np

from openintel_tpu.index.synthetic import (
    synthetic_embeddings,
    synthetic_query_embeddings,
)
from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.pallas.dense_topk import dense_topk_pallas


def test_pallas_matches_reference_small():
    emb = synthetic_embeddings(600, dim=128, seed=0)
    q, _ = synthetic_query_embeddings(emb, 4, seed=1)
    vals, ids = dense_topk_pallas(emb, q, k=10, block_q=8, block_c=256, interpret=True)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_pallas_non_divisible_corpus_and_batch():
    emb = synthetic_embeddings(555, dim=64, seed=2)
    q, _ = synthetic_query_embeddings(emb, 3, seed=3)
    vals, ids = dense_topk_pallas(emb, q, k=7, block_q=8, block_c=128, interpret=True)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 7)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    assert np.asarray(ids).max() < 555


def test_pallas_duplicate_scores_tiebreak_by_doc_id():
    # Duplicate rows -> exactly equal scores; lower doc id must win.
    base = synthetic_embeddings(64, dim=32, seed=4)
    emb = np.concatenate([base, base], axis=0)  # doc i == doc i+64
    q = base[:2]
    _, ids = dense_topk_pallas(emb, q, k=2, block_q=8, block_c=64, interpret=True)
    ids = np.asarray(ids)
    assert ids[0, 0] == 0 and ids[0, 1] == 64
    assert ids[1, 0] == 1 and ids[1, 1] == 65


def test_pallas_corpus_smaller_than_block():
    emb = synthetic_embeddings(50, dim=32, seed=5)
    q = emb[:2]
    vals, ids = dense_topk_pallas(emb, q, k=5, block_q=8, block_c=128, interpret=True)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 5)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


# ---- fast candidate-emission kernel (production path) ----


def _recall(ids, ref_ids):
    ids, ref_ids = np.asarray(ids), np.asarray(ref_ids)
    return np.mean(
        [
            len(set(map(int, ids[i])) & set(map(int, ref_ids[i]))) / ids.shape[1]
            for i in range(ids.shape[0])
        ]
    )


def test_fast_kernel_high_recall_and_tight_scores():
    from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

    emb = synthetic_embeddings(5000, dim=64, seed=6)
    q, _ = synthetic_query_embeddings(emb, 9, seed=7)
    vals, ids = dense_topk_fast(emb.T, q, k=10, block_c=256, interpret=True)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    # approximate by design: a top-k doc is lost only to a same-128-group
    # collision with another top-k doc
    assert _recall(ids, ref_ids) >= 0.95
    # where ids agree, scores agree to the 2^-17 packing quantisation
    match = np.asarray(ids) == ref_ids
    err = np.abs(np.asarray(vals) - ref_vals)[match]
    assert err.max() <= 2e-4


def test_fast_kernel_non_divisible_corpus_ids_in_range():
    from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

    emb = synthetic_embeddings(300, dim=32, seed=8)
    q, _ = synthetic_query_embeddings(emb, 5, seed=9)
    vals, ids = dense_topk_fast(emb.T, q, k=8, block_c=256, interpret=True)
    ids = np.asarray(ids)
    assert ids.max() < 300
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 8)
    assert _recall(ids, ref_ids) >= 0.9


def test_fast_kernel_fuzz_shapes():
    """Sweep odd corpus sizes, dims, batch sizes, and ks against the oracle."""
    import itertools

    from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

    rng_cases = [
        (517, 32, 2, 3, 128),
        (1024, 64, 5, 16, 128),
        (2000, 16, 7, 1, 256),
        (130, 48, 1, 4, 128),
    ]
    for i, (n, d, b, k, bc) in enumerate(rng_cases):
        emb = synthetic_embeddings(n, dim=d, seed=100 + i)
        q, _ = synthetic_query_embeddings(emb, b, seed=200 + i)
        vals, ids = dense_topk_fast(emb.T, q, k=k, block_c=bc, interpret=True)
        ids = np.asarray(ids)
        assert ids.shape == (b, k)
        assert ids.max() < n
        ref_vals, ref_ids = ref.cosine_topk(emb, q, k)
        assert _recall(ids, ref_ids) >= 0.8, (n, d, b, k, bc)


def test_fast_kernel_query_batch_padding_sliced():
    from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

    emb = synthetic_embeddings(1000, dim=32, seed=10)
    q, _ = synthetic_query_embeddings(emb, 3, seed=11)  # 3 < sublane tile
    vals, ids = dense_topk_fast(emb.T, q, k=6, block_c=128, interpret=True)
    assert np.asarray(vals).shape == (3, 6)
    assert np.asarray(ids).shape == (3, 6)


def test_int8_kernel_candidates_plus_exact_rescore():
    """int8 candidate pass + exact f32 rescore must recover the exact top-k
    (the production int8 serving pair)."""
    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        exact_rescore,
        quantize_int8,
    )

    emb = synthetic_embeddings(5000, dim=64, seed=16)
    q, _ = synthetic_query_embeddings(emb, 9, seed=17)
    import jax.numpy as jnp

    emb_i8 = jnp.asarray(quantize_int8(emb.T))
    q_i8 = jnp.asarray(quantize_int8(q))
    # candidate pass alone: near-exact recall at 4x overfetch
    cvals, cids = dense_topk_fast_i8(
        emb_i8, q_i8, k=40, block_c=256, interpret=True
    )
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    got10 = np.asarray(cids)
    rec = np.mean([
        len(set(map(int, got10[i])) & set(map(int, ref_ids[i]))) / 10
        for i in range(len(ref_ids))
    ])
    assert rec >= 0.95, rec
    # int scores decode to cosine within the quantisation budget
    assert np.all(np.abs(np.asarray(cvals)) <= 1.2)

    # rescore: exact ordering (vals AND ids) on the candidate set
    rvals, rids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cids, 10)
    match = np.asarray(rids) == ref_ids
    assert match.mean() >= rec  # rescore never loses candidates
    np.testing.assert_allclose(
        np.asarray(rvals)[match],
        ref_vals[match],
        rtol=1e-5, atol=1e-6,
    )
    # ordering within each row is exactly descending (ties by id)
    v = np.asarray(rvals)
    assert np.all(np.diff(v, axis=1) <= 1e-7)


def test_int8_kernel_padding_and_shapes():
    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        quantize_int8,
    )
    import jax.numpy as jnp

    emb = synthetic_embeddings(300, dim=32, seed=18)
    q, _ = synthetic_query_embeddings(emb, 5, seed=19)
    vals, ids = dense_topk_fast_i8(
        jnp.asarray(quantize_int8(emb.T)), jnp.asarray(quantize_int8(q)),
        k=8, block_c=256, interpret=True,
    )
    ids = np.asarray(ids)
    assert ids.shape == (5, 8)
    assert ids.max() < 300
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 8)
    assert _recall(ids, ref_ids) >= 0.85


def test_exact_rescore_handles_padding_ids():
    from openintel_tpu.ops.pallas.dense_topk import exact_rescore
    import jax.numpy as jnp

    emb = synthetic_embeddings(100, dim=16, seed=20)
    q, _ = synthetic_query_embeddings(emb, 2, seed=21)
    cand = jnp.asarray([[3, 7, -1, -1], [50, -1, -1, -1]], jnp.int32)
    vals, ids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cand, 3)
    ids = np.asarray(ids)
    assert set(ids[0]) <= {3, 7, -1}
    assert ids[0][2] == -1 and ids[1][1] == -1


def test_int8_multi_super_decode_and_slots():
    """Multi-super corpus (3 supers after padding): exercises the slots=2
    two-half packed layout — ids in BOTH concatenated output halves must
    decode through `col % half`, the cross-grid-step disjoint-set merge
    must keep per-lane top-2 semantics, and no duplicates or
    padding-doc ids may leak. Production pipeline (candidates + exact
    rescore) must recover the exact top-10 at high recall."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        exact_rescore,
        pad_corpus_t_i8,
        quantize_int8,
    )

    n, d, b = 40_000, 64, 4  # pads to 49,152 cols = 3 supers
    emb = synthetic_embeddings(n, dim=d, seed=30)
    q, _ = synthetic_query_embeddings(emb, b, seed=31)
    emb_t8 = pad_corpus_t_i8(jnp.asarray(quantize_int8(emb).T))
    q8 = jnp.asarray(quantize_int8(q))
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)

    recalls = {}
    for slots in (1, 2):
        _, cids = dense_topk_fast_i8(
            emb_t8, q8, k=64, block_c=4096, n_docs=n, interpret=True,
            slots=slots,
        )
        cand = np.asarray(cids)
        for row in cand:
            real = [int(x) for x in row if x >= 0]
            assert len(real) == len(set(real)), "duplicate candidates"
            assert max(real) < n, "padding-doc id leaked"
        rvals, rids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cids, 10)
        recalls[slots] = _recall(np.asarray(rids), ref_ids)
    assert recalls[2] >= 0.9, recalls
    # doubling candidate slots never hurts candidate coverage
    assert recalls[2] >= recalls[1], recalls


def test_turbo_kernels_clamp_k_beyond_candidate_capacity():
    """k beyond the candidate capacity (128*slots per super) must serve —
    clamped to capacity with (0.0, -1)-padded columns — not crash with an
    AssertionError (review finding: reachable through MCP search_corpus at
    legal k on few-super corpora)."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast,
        dense_topk_fast_i8,
        quantize_int8,
    )

    n, d, b = 600, 32, 3  # one 16,384-col super: cap 128 (f32) / 256 (i8x2)
    emb = synthetic_embeddings(n, dim=d, seed=40)
    q, _ = synthetic_query_embeddings(emb, b, seed=41)

    vals, ids = dense_topk_fast(
        jnp.asarray(emb.T), jnp.asarray(q), k=300, block_c=4096,
        interpret=True,
    )
    ids = np.asarray(ids)
    assert ids.shape == (b, 300)
    assert (ids[:, 128:] == -1).all()  # beyond capacity: padded
    real = ids[0][ids[0] >= 0]
    assert len(real) == len(set(real)) and real.max() < n

    vals8, ids8 = dense_topk_fast_i8(
        jnp.asarray(quantize_int8(emb.T)), jnp.asarray(quantize_int8(q)),
        k=300, block_c=4096, n_docs=n, interpret=True,
    )
    ids8 = np.asarray(ids8)
    assert ids8.shape == (b, 300)
    assert (ids8[:, 256:] == -1).all()
    real8 = ids8[0][ids8[0] >= 0]
    assert len(real8) == len(set(real8)) and real8.max() < n


def test_hybrid_int8_serves_k_beyond_capacity():
    """The served surface end-to-end: an int8 HybridRetriever on a
    few-super corpus must answer k/candidates_per_arm beyond the turbo
    slot capacity (the pre-fix crash repro)."""
    from openintel_tpu.models.retrievers import HybridRetriever

    texts = [f"alpha beta doc{i} gamma{i % 7}" for i in range(600)]
    r = HybridRetriever.build(texts, kernel="int8", dim=64)
    res = r.search(["alpha gamma3"], k=150, candidates_per_arm=300)
    assert res.ids.shape == (1, 150)
    real = res.ids[0][res.ids[0] >= 0]
    assert len(real) == len(set(real))
    assert (real < 600).all()


# --------------------------- int4 nibble-packed kernel ---------------------


def _i4_setup(n, d, b, seed=50):
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        pack_corpus_t_i4,
        quantize_int4,
        quantize_int8,
    )

    emb = synthetic_embeddings(n, dim=d, seed=seed)
    q, _ = synthetic_query_embeddings(emb, b, seed=seed + 1)
    packed = jnp.asarray(pack_corpus_t_i4(quantize_int4(emb).T))
    q8 = jnp.asarray(quantize_int8(q))
    return emb, q, packed, q8


def test_int4_pack_roundtrip():
    """Nibble packing: low nibble = even doc, high nibble = odd doc,
    sign-extension exact for all 16 values."""
    from openintel_tpu.ops.pallas.dense_topk import (
        _TURBO_UNIT,
        pack_corpus_t_i4,
    )

    x = np.arange(-8, 8, dtype=np.int8).reshape(1, 16)  # every int4 value
    packed = np.asarray(pack_corpus_t_i4(x))
    assert packed.shape == (1, _TURBO_UNIT // 2)  # padded to the turbo unit
    u = packed.view(np.uint8).astype(np.int32)
    lo = ((u & 15) ^ 8) - 8  # sign-extend
    hi = ((u >> 4) ^ 8) - 8
    got = np.stack([lo[0, :8], hi[0, :8]], axis=1).reshape(-1)
    np.testing.assert_array_equal(got, x[0])
    # padding nibbles are zero
    assert (u[0, 8:] == 0).all()


def test_int4_decode_matches_quantized_reference():
    """Kernel ids/vals vs a NumPy emulation of the SAME int4 x int8 scoring:
    the candidate ordering and decoded cosines must match exactly — this
    pins the id decode (pos = 2*sub_tile + parity) and the key packing."""
    import jax.numpy as jnp  # noqa: F401

    from openintel_tpu.ops.pallas.dense_topk import (
        _I4_SCALE_DEFAULT,
        dense_topk_fast_i4,
        quantize_int4,
        quantize_int8,
    )

    n, d, b, k = 3000, 64, 5, 16
    emb, q, packed, q8 = _i4_setup(n, d, b)
    vals, ids = dense_topk_fast_i4(
        packed, q8, k=k, block_c=512, n_docs=n, interpret=True, slots=1
    )
    # NumPy emulation: int dot, one candidate slot per (super, lane);
    # here n < 16,384 -> one super, lane = id mod 128 after the pairing
    # layout (id = b*256 + 2*lane + parity -> lane = (id % 256) // 2).
    s = quantize_int4(emb).astype(np.int32) @ quantize_int8(q).astype(np.int32).T
    got_v, got_i = np.asarray(vals), np.asarray(ids)
    for j in range(b):
        # per-lane max with tie -> higher pos (higher doc id in a lane)
        lane_best = {}
        for doc in range(n):
            lane = (doc % 256) // 2
            cur = lane_best.get(lane)
            if cur is None or s[doc, j] >= s[cur, j]:
                lane_best[lane] = doc
        cand = sorted(
            lane_best.values(), key=lambda doc: (-s[doc, j], -doc)
        )[:k]
        np.testing.assert_array_equal(got_i[j], cand)
        np.testing.assert_allclose(
            got_v[j],
            s[cand, j] / (127.0 * _I4_SCALE_DEFAULT),
            rtol=1e-6,
        )


def test_int4_candidates_plus_exact_rescore_recall():
    """Production pairing: int4 candidates at the documented wider width +
    exact f32 rescore recovers the exact top-10 at high recall."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i4,
        exact_rescore,
    )

    n, d, b = 5000, 64, 9
    emb, q, packed, q8 = _i4_setup(n, d, b, seed=52)
    _, cids = dense_topk_fast_i4(
        packed, q8, k=128, block_c=512, n_docs=n, interpret=True
    )
    cand = np.asarray(cids)
    for row in cand:
        real = [int(x) for x in row if x >= 0]
        assert len(real) == len(set(real)), "duplicate candidates"
        assert max(real) < n, "padding-doc id leaked"
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    rvals, rids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cids, 10)
    assert _recall(np.asarray(rids), ref_ids) >= 0.95
    # rescored scores are exact f32 cosines where ids match
    match = np.asarray(rids) == ref_ids
    np.testing.assert_allclose(
        np.asarray(rvals)[match], ref_vals[match], rtol=1e-5, atol=1e-6
    )


def test_int4_multi_super_slots_and_clamp():
    """Multi-super corpus: slots=2 disjoint-set merge, capacity clamp, and
    no padding leakage — the int8 multi-super contract on the int4 path."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i4,
        exact_rescore,
    )

    n, d, b = 40_000, 64, 4  # pads to 49,152 docs = 3 supers
    emb, q, packed, q8 = _i4_setup(n, d, b, seed=54)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    recalls = {}
    for slots in (1, 2):
        _, cids = dense_topk_fast_i4(
            packed, q8, k=256, block_c=4096, n_docs=n, interpret=True,
            slots=slots,
        )
        cand = np.asarray(cids)
        for row in cand:
            real = [int(x) for x in row if x >= 0]
            assert len(real) == len(set(real))
            assert max(real) < n
        _, rids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cids, 10)
        recalls[slots] = _recall(np.asarray(rids), ref_ids)
    assert recalls[2] >= 0.9, recalls
    assert recalls[2] >= recalls[1], recalls

    # k beyond candidate capacity (3 supers x 256 slots): clamp + pad
    vals, ids = dense_topk_fast_i4(
        packed, q8, k=1000, block_c=4096, n_docs=n, interpret=True
    )
    ids = np.asarray(ids)
    assert ids.shape == (b, 1000)
    assert (ids[:, 768:] == -1).all()


def test_grouped_kernel_matches_per_super_and_oracle():
    """dense_topk_fast_i8_grouped: candidate pass + rescore recovers the
    exact top-k at every group size, including a tail group (n_super not
    divisible by group), and the super-index tracking decodes ids
    correctly across supers."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8_grouped,
        exact_rescore,
        pad_corpus_t_i8,
        quantize_int8,
    )

    n = 40_000  # pads to 3 supers: group=2 exercises the short tail group
    emb = synthetic_embeddings(n, dim=64, seed=21)
    q, _ = synthetic_query_embeddings(emb, 7, seed=22)
    emb_i8 = pad_corpus_t_i8(jnp.asarray(quantize_int8(emb.T)))
    q_i8 = jnp.asarray(quantize_int8(q))
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    for group in (1, 2, 4):
        _, cids = dense_topk_fast_i8_grouped(
            emb_i8, q_i8, k=32, block_c=4096, n_docs=n, interpret=True,
            group=group,
        )
        got = np.asarray(cids)
        assert got.max() < n and np.all((got >= 0) | (got == -1))
        rvals, rids = exact_rescore(jnp.asarray(emb), jnp.asarray(q), cids, 10)
        rec = np.mean(np.asarray(rids) == ref_ids)
        assert rec >= 0.99, (group, rec)


def test_grouped_kernel_clamps_k_beyond_capacity():
    """k beyond 2*ceil(n_super/group)*128 clamps and -1-pads like the
    per-super kernel."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8_grouped,
        pad_corpus_t_i8,
        quantize_int8,
    )

    n = 20_000  # 2 supers; group=2 -> ng=1 -> capacity 256
    emb = synthetic_embeddings(n, dim=32, seed=23)
    q, _ = synthetic_query_embeddings(emb, 3, seed=24)
    emb_i8 = pad_corpus_t_i8(jnp.asarray(quantize_int8(emb.T)))
    q_i8 = jnp.asarray(quantize_int8(q))
    vals, ids = dense_topk_fast_i8_grouped(
        emb_i8, q_i8, k=300, block_c=4096, n_docs=n, interpret=True, group=2,
    )
    assert ids.shape == (3, 300)
    got = np.asarray(ids)
    assert np.all(got[:, 256:] == -1)  # capacity 2*1*128
    real = got[:, :256]
    assert np.all((real == -1) | ((real >= 0) & (real < n)))
