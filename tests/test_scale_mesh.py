"""Scale evidence on the virtual mesh (SURVEY §7 step 6 / round-3 verdict
item 6): one ≥100k-doc corpus through the full sharded stack — awkward
shard padding (100,003 % 8 != 0), grouped per-query filters, live
add/delete/compact, and the compacted-updatable handoff — each stage
asserted equal to the single-chip surface over the same state. The suite's
other mesh tests stop at ~1k docs; this one exercises the bucketing,
plan-splitting, and padding arithmetic at serving scale (~8s total)."""

import jax
import numpy as np
import pytest

from openintel_tpu.index.build import build_postings_index
from openintel_tpu.index.schema import DenseIndex
from openintel_tpu.index.synthetic import (
    synthetic_embeddings,
    synthetic_queries_from_docs,
    synthetic_token_corpus,
)
from openintel_tpu.models.embedding import HashingEmbedder
from openintel_tpu.models.updatable import UpdatableHybridRetriever
from openintel_tpu.parallel.retriever import ShardedHybridRetriever
from openintel_tpu.parallel.updatable import ShardedUpdatableHybridRetriever

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

N, D = 100_003, 64  # prime-ish: every shard-padding branch is exercised


@pytest.fixture(scope="module")
def big_corpus():
    docs = synthetic_token_corpus(N, vocab_size=5000, seed=31)
    postings = build_postings_index(docs)
    dense = DenseIndex.from_embeddings(
        synthetic_embeddings(N, dim=D, seed=32)
    )
    return docs, postings, dense, HashingEmbedder(dim=D)


def _same(got, want, atol=1e-6):
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=atol)


def test_100k_sharded_lifecycle_matches_single_chip(big_corpus):
    docs, postings, dense, embedder = big_corpus
    sharded = ShardedUpdatableHybridRetriever(
        postings, dense, embedder, data=2, corpus=4, kernel="xla",
    )
    single = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    queries = synthetic_queries_from_docs(docs, 5, seed=33)  # 5 % 2 != 0

    # 1. cold fused path at scale
    _same(
        sharded.search(queries, k=10, candidates_per_arm=20),
        single.search(queries, k=10, candidates_per_arm=20),
    )

    # 2. grouped per-query filters at scale (two tenants, ~50% / sparse)
    rng = np.random.default_rng(34)
    masks = np.zeros((2, N), bool)
    masks[0, rng.choice(N, N // 2, replace=False)] = True
    masks[1, rng.choice(N, 300, replace=False)] = True  # starvation-prone
    groups = np.array([0, 1, 0, 1, 0], np.int32)
    got = sharded.search(
        queries, k=10, candidates_per_arm=20,
        filter_mask=masks, filter_group=groups,
    )
    _same(
        got,
        single.search(
            queries, k=10, candidates_per_arm=20,
            filter_mask=masks, filter_group=groups,
        ),
    )
    for row, g in zip(got.ids, groups):
        assert masks[g, row[row >= 0]].all()

    # 3. live updates: adds (new vocab) + deletes spanning main and delta
    extra = [
        d + f" scaleterm{i % 3}"
        for i, d in enumerate(
            synthetic_token_corpus(50, vocab_size=5000, seed=35)
        )
    ]
    np.testing.assert_array_equal(
        sharded.add_documents(extra), single.add_documents(extra)
    )
    dead = [7, N - 1, N + 3]
    sharded.delete_ids(dead)
    single.delete_ids(dead)
    q2 = queries[:3] + ["scaleterm1 scaleterm2"]
    got = sharded.search(q2, k=10, candidates_per_arm=20)
    _same(got, single.search(q2, k=10, candidates_per_arm=20))
    assert (got.ids >= N).any() and not np.isin(got.ids, dead).any()

    # 4. compact at scale, then keep serving on the same mesh
    mesh = sharded.mesh
    np.testing.assert_array_equal(
        sharded.compact_in_place(), single.compact_in_place()
    )
    assert sharded.mesh is mesh
    _same(
        sharded.search(q2, k=10, candidates_per_arm=20),
        single.search(q2, k=10, candidates_per_arm=20),
    )

    # 5. compacted handoff: the folded segments serve bit-identically
    # through a FRESH plain sharded component (the documented
    # live-to-sharded handoff, now at scale)
    # fusion="rrf" matches the live component being handed off from (the
    # updatable path pins rank fusion); this asserts the segment FOLD is
    # bit-exact, not the fusion default
    handoff = ShardedHybridRetriever(
        sharded.main_postings, sharded.main_dense, embedder,
        data=2, corpus=4, kernel="xla", fusion="rrf",
    )
    _same(
        handoff.search(q2, k=10, candidates_per_arm=20),
        sharded.search(q2, k=10, candidates_per_arm=20),
    )
