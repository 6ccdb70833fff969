"""Swap-tolerant ranking comparison.

Device BM25 sums segment weights in f32 sorted order; the NumPy oracle sums in
f64. Near-ties (score gap below float tolerance) may legitimately swap ranks.
This helper asserts scores match everywhere and ids match exactly *except*
inside clusters of near-tied scores, where only the id sets must agree.
"""

import numpy as np


def assert_ranking_close(vals, ids, ref_vals, ref_ids, *, rtol=1e-5, atol=1e-6):
    vals, ids = np.asarray(vals), np.asarray(ids)
    ref_vals, ref_ids = np.asarray(ref_vals), np.asarray(ref_ids)
    np.testing.assert_allclose(vals, ref_vals, rtol=rtol, atol=atol)
    if vals.ndim == 1:
        vals, ids = vals[None], ids[None]
        ref_vals, ref_ids = ref_vals[None], ref_ids[None]
    for b in range(vals.shape[0]):
        k = vals.shape[1]
        i = 0
        while i < k:
            # cluster of positions whose reference scores are near-tied
            j = i + 1
            while j < k:
                tol = atol + rtol * abs(ref_vals[b, j - 1])
                if abs(ref_vals[b, j] - ref_vals[b, j - 1]) > tol:
                    break
                j += 1
            got = sorted(ids[b, i:j].tolist())
            want = sorted(ref_ids[b, i:j].tolist())
            assert got == want, (
                f"row {b} positions {i}:{j}: ids {got} != reference {want}"
            )
            i = j
