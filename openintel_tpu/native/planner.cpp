// Query-plan builder: the host-side hot path of pruned BM25 retrieval.
//
// Per query (term ids + query term frequencies):
//   1. walk the terms' sorted postings lists in one k-way merge, computing
//      the TRUE score of every doc matching >= 2 terms; keep the top
//      `multi_budget` by (score desc, doc asc) in a bounded min-heap
//      (exactness: a true top-k multi-term doc is within the top-k
//      multi-term docs by score — see ops/bm25.py);
//   2. per term, emit the union of its top-`max_m` postings by impact
//      (via the prebuilt impact_order permutation, ties doc-ascending)
//      and its postings for the selected multi docs;
//   3. sort the row by doc id (the device's segmented scan wants sorted
//      runs) and write (doc_ids, weights).
//
// Mirrors openintel_tpu/ops/bm25.py::build_query_plan exactly, including
// tie-breaking, so the two paths produce identical candidate sets.
// Single-threaded per call; callers parallelise over query batches.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct MultiDoc {
  double score;
  int32_t doc;
};

// min-heap comparator: "worst" = lowest score, then HIGHEST doc id, so that
// replacement keeps the top-B by (score desc, doc asc), matching
// np.lexsort((docs, -scores))[:B].
struct WorstFirst {
  bool operator()(const MultiDoc& a, const MultiDoc& b) const {
    if (a.score != b.score) return a.score > b.score;  // lower score = worse
    return a.doc < b.doc;                              // higher doc = worse
  }
};

}  // namespace

namespace {

// First index in ascending a[lo, hi) with a[idx] >= t, galloping from lo.
// The planner's doc walks emit ascending targets, so a forward cursor +
// exponential search makes each lookup ~O(log gap) of mostly-sequential
// reads instead of a full-range binary search of random cache misses.
inline int64_t gallop_lower_bound(const int32_t* a, int64_t lo, int64_t hi,
                                  int32_t t) {
  if (lo >= hi || a[lo] >= t) return lo;
  int64_t step = 1, prev = lo;
  while (lo + step < hi && a[lo + step] < t) {
    prev = lo + step;
    step <<= 1;
  }
  const int64_t end = std::min(lo + step + 1, hi);
  return std::lower_bound(a + prev + 1, a + end, t) - a;
}

// Builds plans for queries [b_lo, b_hi); returns max width or -(needed).
// `doc_mask` (nullable, n_docs bytes, 1 = eligible) builds the FILTERED
// plan with the NumPy reference's semantics (ops/bm25.py::build_query_plan
// doc_mask): masked docs never enter the plan; the prune flag still uses
// the RAW df; per-term pruning keeps the top-M *unmasked* impacts (the
// impact-descending walk under the mask, identical tie-breaking); the
// multi-term merge considers unmasked docs only. Masking is per-doc, so
// an unmasked doc's postings are exactly its raw postings — matched
// counts and scores need no further adjustment.
int64_t plan_build_range(const int64_t* term_offsets, const int32_t* doc_ids,
                         const float* impact, const int64_t* impact_order,
                         const float* idf, int64_t n_terms_vocab,
                         const int32_t* q_terms, int64_t b_lo, int64_t b_hi,
                         int64_t T, int64_t max_m, int64_t multi_budget,
                         const uint8_t* doc_mask,
                         int32_t* out_ids, float* out_w, int64_t cap,
                         int64_t* out_widths) {
  std::vector<int32_t> terms;
  std::vector<int32_t> qtf;
  std::vector<int64_t> cursor;
  std::vector<std::pair<int32_t, float>> row;
  std::vector<std::pair<int32_t, float>> seg;
  std::vector<int32_t> multi_sorted;
  int64_t max_width = 0;

  for (int64_t b = b_lo; b < b_hi; ++b) {
    const int32_t* qt = q_terms + b * T;
    terms.clear();
    qtf.clear();
    for (int64_t i = 0; i < T; ++i) {
      int32_t t = qt[i];
      if (t <= 0 || t >= n_terms_vocab) continue;
      bool found = false;
      for (size_t j = 0; j < terms.size(); ++j) {
        if (terms[j] == t) {
          qtf[j]++;
          found = true;
          break;
        }
      }
      if (!found) {
        terms.push_back(t);
        qtf.push_back(1);
      }
    }
    const size_t nt = terms.size();
    row.clear();
    multi_sorted.clear();

    // Per-query prune flag, matching the NumPy reference exactly: any term
    // whose df exceeds max_m trips pruning for the whole query. max_m == 0
    // is a LEGAL budget (each term contributes only forced multi-term
    // docs), not a disable switch — the native path is only taken when
    // pruning is requested (ops/bm25.py routes None elsewhere).
    bool prune = false;
    for (size_t j = 0; j < nt; ++j) {
      int64_t df = term_offsets[terms[j] + 1] - term_offsets[terms[j]];
      if (df > max_m) prune = true;
    }

    if (prune && nt > 1 && multi_budget > 0) {
      // Exact scores of multi-term docs. Every multi-term doc appears in at
      // least one NON-largest list, so it suffices to k-way merge the
      // smaller nt-1 lists and binary-search each union doc in the largest —
      // O(sum small dfs * (T + log df_max)) instead of O(df_max * T), a big
      // win on the common skewed query (one stop-wordy term + rare terms).
      size_t big = 0;
      for (size_t j = 1; j < nt; ++j) {
        if (term_offsets[terms[j] + 1] - term_offsets[terms[j]] >
            term_offsets[terms[big] + 1] - term_offsets[terms[big]])
          big = j;
      }
      const int64_t big_lo = term_offsets[terms[big]];
      const int64_t big_hi = term_offsets[terms[big] + 1];
      const double big_w =
          static_cast<double>(idf[terms[big]]) * qtf[big];

      cursor.assign(nt, 0);
      int64_t big_cur = big_lo;
      std::priority_queue<MultiDoc, std::vector<MultiDoc>, WorstFirst> heap;
      for (;;) {
        int32_t m = INT32_MAX;
        for (size_t j = 0; j < nt; ++j) {
          if (j == big) continue;
          int64_t lo = term_offsets[terms[j]] + cursor[j];
          if (lo < term_offsets[terms[j] + 1]) m = std::min(m, doc_ids[lo]);
        }
        if (m == INT32_MAX) break;
        // a masked doc can never enter the plan: advance the cursors but
        // skip the score accumulation and the big-list binary search
        const bool eligible = doc_mask == nullptr || doc_mask[m];
        int matched = 0;
        double score = 0.0;
        for (size_t j = 0; j < nt; ++j) {
          if (j == big) continue;
          int64_t lo = term_offsets[terms[j]] + cursor[j];
          if (lo < term_offsets[terms[j] + 1] && doc_ids[lo] == m) {
            if (eligible)
              score += static_cast<double>(impact[lo]) *
                       static_cast<double>(idf[terms[j]]) * qtf[j];
            cursor[j]++;
            matched++;
          }
        }
        if (!eligible) continue;
        // membership in the largest list: union docs m arrive ascending,
        // so a galloping forward cursor replaces the from-scratch binary
        // search (the skewed-df hot path — docs/operations.md)
        big_cur = gallop_lower_bound(doc_ids, big_cur, big_hi, m);
        if (big_cur < big_hi && doc_ids[big_cur] == m) {
          score += static_cast<double>(impact[big_cur]) * big_w;
          matched++;
        }
        if (matched >= 2) {
          MultiDoc cand{score, m};
          if (static_cast<int64_t>(heap.size()) < multi_budget) {
            heap.push(cand);
          } else {
            const MultiDoc& worst = heap.top();
            if (cand.score > worst.score ||
                (cand.score == worst.score && cand.doc < worst.doc)) {
              heap.pop();
              heap.push(cand);
            }
          }
        }
      }
      multi_sorted.reserve(heap.size());
      while (!heap.empty()) {
        multi_sorted.push_back(heap.top().doc);
        heap.pop();
      }
      std::sort(multi_sorted.begin(), multi_sorted.end());
    }

    for (size_t j = 0; j < nt; ++j) {
      const int32_t t = terms[j];
      const int64_t lo = term_offsets[t], hi = term_offsets[t + 1];
      const float w = idf[t] * static_cast<float>(qtf[j]);
      const int64_t df = hi - lo;
      if (!prune || df <= max_m) {
        for (int64_t p = lo; p < hi; ++p)
          if (doc_mask == nullptr || doc_mask[doc_ids[p]])
            row.emplace_back(doc_ids[p], impact[p] * w);
        continue;
      }
      // top-M by impact (order array is (-impact, doc)-sorted per segment,
      // and its values are GLOBAL posting indices) — emit (doc, impact)
      // DIRECTLY from the order walk, never touching the other df - M
      // postings. The old merged walk over the full segment was O(df) per
      // pruned term, which made stop-wordy terms (df in the 100k s) the
      // planner's dominant cost; this is O(M log M + |multi| log df).
      // Under a mask: the first M UNMASKED entries of the impact walk.
      seg.clear();
      if (doc_mask == nullptr) {
        for (int64_t p = 0; p < max_m; ++p) {
          const int64_t idx = impact_order[lo + p];
          seg.emplace_back(doc_ids[idx], impact[idx]);
        }
      } else {
        for (int64_t p = 0;
             p < df && static_cast<int64_t>(seg.size()) < max_m; ++p) {
          const int64_t idx = impact_order[lo + p];
          if (doc_mask[doc_ids[idx]]) seg.emplace_back(doc_ids[idx], impact[idx]);
        }
      }
      std::sort(seg.begin(), seg.end(),
                [](const std::pair<int32_t, float>& x,
                   const std::pair<int32_t, float>& y) {
                  return x.first < y.first;
                });
      // union in the forced multi docs this term also matches: both lists
      // ascending -> one walk; docs already in the top-M are skipped
      // (same one-entry-per-(term, doc) multiset as the old merged walk),
      // absent docs gallop past. multi_sorted is already mask-filtered.
      size_t a = 0;
      int64_t pcur = lo;
      for (size_t c = 0; c < multi_sorted.size(); ++c) {
        const int32_t d = multi_sorted[c];
        while (a < seg.size() && seg[a].first < d) ++a;
        if (a < seg.size() && seg[a].first == d) continue;  // in top-M
        pcur = gallop_lower_bound(doc_ids, pcur, hi, d);
        if (pcur < hi && doc_ids[pcur] == d)
          row.emplace_back(d, impact[pcur] * w);
      }
      for (const auto& e : seg) row.emplace_back(e.first, e.second * w);
    }

    std::sort(row.begin(), row.end(),
              [](const std::pair<int32_t, float>& x,
                 const std::pair<int32_t, float>& y) { return x.first < y.first; });

    const int64_t width = static_cast<int64_t>(row.size());
    if (width > cap) return -width;
    max_width = std::max(max_width, width);
    out_widths[b] = width;
    int32_t* oi = out_ids + b * cap;
    float* ow = out_w + b * cap;
    for (int64_t i = 0; i < width; ++i) {
      oi[i] = row[i].first;
      ow[i] = row[i].second;
    }
  }
  return max_width;
}

}  // namespace

extern "C" {

// Returns the max row width written, or -(needed_width) if any row exceeds
// `cap` (caller re-allocates and retries). All outputs caller-allocated:
// out_ids/out_w are (B, cap) row-major, out_widths is (B,). Parallel over
// queries with `n_threads` (0 = hardware concurrency); rows are disjoint so
// workers share nothing but read-only index arrays. `doc_mask` (nullable,
// n_docs bytes) builds the filtered plan — see plan_build_range.
int64_t plan_build_masked(const int64_t* term_offsets, const int32_t* doc_ids,
                          const float* impact, const int64_t* impact_order,
                          const float* idf, int64_t n_terms_vocab,
                          const int32_t* q_terms, int64_t B, int64_t T,
                          int64_t max_m, int64_t multi_budget,
                          const uint8_t* doc_mask,
                          int32_t* out_ids, float* out_w, int64_t cap,
                          int64_t* out_widths, int64_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, std::max<int64_t>(B, 1));
  if (n_threads == 1) {
    return plan_build_range(term_offsets, doc_ids, impact, impact_order, idf,
                            n_terms_vocab, q_terms, 0, B, T, max_m,
                            multi_budget, doc_mask, out_ids, out_w, cap,
                            out_widths);
  }
  std::vector<int64_t> results(n_threads, 0);
  std::vector<std::thread> workers;
  const int64_t chunk = (B + n_threads - 1) / n_threads;
  for (int64_t w = 0; w < n_threads; ++w) {
    const int64_t lo = w * chunk, hi = std::min(B, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=, &results]() {
      results[w] = plan_build_range(term_offsets, doc_ids, impact,
                                    impact_order, idf, n_terms_vocab, q_terms,
                                    lo, hi, T, max_m, multi_budget, doc_mask,
                                    out_ids, out_w, cap, out_widths);
    });
  }
  for (auto& t : workers) t.join();
  int64_t max_width = 0;
  for (int64_t r : results) {
    if (r < 0) return r;  // some row overflowed cap
    max_width = std::max(max_width, r);
  }
  return max_width;
}

// Unfiltered entry (kept for .so compatibility with older bindings).
int64_t plan_build(const int64_t* term_offsets, const int32_t* doc_ids,
                   const float* impact, const int64_t* impact_order,
                   const float* idf, int64_t n_terms_vocab,
                   const int32_t* q_terms, int64_t B, int64_t T,
                   int64_t max_m, int64_t multi_budget,
                   int32_t* out_ids, float* out_w, int64_t cap,
                   int64_t* out_widths, int64_t n_threads) {
  return plan_build_masked(term_offsets, doc_ids, impact, impact_order, idf,
                           n_terms_vocab, q_terms, B, T, max_m, multi_budget,
                           nullptr, out_ids, out_w, cap, out_widths,
                           n_threads);
}

// Source-hash stamp: build() passes -DOPENINTEL_SRC_HASH="<sha256 of the
// .cpp sources>"; the Python loader compares it against a fresh hash of
// the on-disk sources and degrades to the Python path on mismatch, so a
// stale .so can never silently serve older planner semantics.
const char* openintel_src_hash() {
#ifdef OPENINTEL_SRC_HASH
  return OPENINTEL_SRC_HASH;
#else
  return "";
#endif
}

}  // extern "C"
