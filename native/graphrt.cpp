// Native graph runtime: CSR build + lane-packed MS-BFS family + whole-graph
// algorithms, exposed as a C ABI for the Python engine (ctypes).
//
// This is the native counterpart of the reference's scalar-kernel layer
// (reference src/core/functions/scalar/*: iterativelength.cpp 512-lane
// bitset MS-BFS, shortest_path.cpp parent tracking, cheapest_path_length.cpp
// multi-source Bellman-Ford, pagerank.cpp, weakly_connected_component.cpp
// union-find, local_clustering_coefficient.cpp) — used by this framework for
// host-resident graphs below the device-dispatch threshold, while the
// JAX/Pallas kernels own large graphs on TPU.
//
// Semantics are kept bit-identical to the Python host mirrors in
// duckpgq_tpu/ops/{msbfs.py,algorithms.py} (which are themselves parity-
// checked against the reference's sqllogictests); tests cross-check native
// vs Python on random graphs.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>
#include <thread>

namespace {

constexpr int kLaneWords = 8;   // 512 lanes / 64 bits (reference LANE_LIMIT)

// Chunked parallel-for over [0, n): F(begin, end) per chunk. Thread count
// bounded by hardware_concurrency (the engine is the only tenant of these
// calls; chunks are >= grain so small inputs stay single-threaded).
template <typename F>
void parallel_chunks(int64_t n, int64_t grain, F f) {
  size_t hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::max<size_t>(hw, 1),
                                        std::max<int64_t>(n / grain, 1));
  if (n_threads <= 1) {
    f(0, n);
    return;
  }
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    workers.emplace_back([=] { f(b, e); });
  }
  for (auto& w : workers) w.join();
}

inline bool row_any(const uint64_t* row) {
  uint64_t acc = 0;
  for (int w = 0; w < kLaneWords; ++w) acc |= row[w];
  return acc != 0;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// CSR build: stable counting sort of edges by source.
// offsets: [vcount+1], e_out/pos_out: [ecount]; pos_out[i] = original index
// of the edge placed at CSR slot i (for edge_ids / weights alignment).
// ---------------------------------------------------------------------------
void gr_csr_build(int64_t vcount, int64_t ecount, const int64_t* src,
                  const int64_t* dst, int64_t* offsets, int64_t* e_out,
                  int64_t* pos_out) {
  std::memset(offsets, 0, sizeof(int64_t) * (vcount + 1));
  for (int64_t i = 0; i < ecount; ++i) offsets[src[i] + 1]++;
  for (int64_t v = 0; v < vcount; ++v) offsets[v + 1] += offsets[v];
  std::vector<int64_t> cursor(offsets, offsets + vcount);
  for (int64_t i = 0; i < ecount; ++i) {
    int64_t slot = cursor[src[i]]++;
    e_out[slot] = dst[i];
    pos_out[slot] = i;
  }
}

// ---------------------------------------------------------------------------
// MS-BFS lengths: 512 bitset lanes, push-style frontier expansion over the
// forward CSR (reference iterativelength.cpp:12-32). qs/qd are lane queries;
// out[q] = hops, or -1 when unreached. src == dst lanes resolve to 0.
// ---------------------------------------------------------------------------
namespace {

// One 512-lane batch of the MS-BFS (independent of other batches; the
// reference gets the same concurrency from its host engine's pipeline
// threads running the scalar kernel on separate chunks).
void msbfs_batch(int64_t vcount, const int64_t* offsets, const int64_t* adj,
                 const int64_t* qs, const int64_t* qd, int64_t* out,
                 const int64_t* pending, size_t start, size_t L,
                 std::vector<uint64_t>& visit, std::vector<uint64_t>& next,
                 std::vector<uint64_t>& seen);

}  // namespace

void gr_msbfs_lengths(int64_t vcount, const int64_t* offsets,
                      const int64_t* adj, int64_t nq, const int64_t* qs,
                      const int64_t* qd, int64_t* out) {
  std::vector<int64_t> pending;
  pending.reserve(nq);
  for (int64_t q = 0; q < nq; ++q) {
    if (qs[q] == qd[q]) {
      out[q] = 0;
    } else {
      out[q] = -1;
      pending.push_back(q);
    }
  }
  size_t n_batches = (pending.size() + 511) / 512;
  size_t hw = std::thread::hardware_concurrency();
  size_t n_threads = std::min<size_t>(std::max<size_t>(hw, 1),
                                      std::min<size_t>(n_batches, 8));
  if (n_threads > 1 && n_batches > 1) {
    std::vector<std::thread> workers;
    for (size_t t = 0; t < n_threads; ++t) {
      workers.emplace_back([&, t]() {
        std::vector<uint64_t> visit(vcount * kLaneWords);
        std::vector<uint64_t> next(vcount * kLaneWords);
        std::vector<uint64_t> seen(vcount * kLaneWords);
        for (size_t b = t; b < n_batches; b += n_threads) {
          size_t start = b * 512;
          size_t L = std::min<size_t>(512, pending.size() - start);
          msbfs_batch(vcount, offsets, adj, qs, qd, out, pending.data(),
                      start, L, visit, next, seen);
        }
      });
    }
    for (auto& w : workers) w.join();
    return;
  }
  const size_t row_words = kLaneWords;
  std::vector<uint64_t> visit(vcount * row_words);
  std::vector<uint64_t> next(vcount * row_words);
  std::vector<uint64_t> seen(vcount * row_words);

  for (size_t start = 0; start < pending.size(); start += 512) {
    size_t L = std::min<size_t>(512, pending.size() - start);
    msbfs_batch(vcount, offsets, adj, qs, qd, out, pending.data(), start, L,
                visit, next, seen);
  }
}

namespace {

// Adaptive frontier strategy mirroring the reference's reachability modes
// (reference reachability.cpp:13,154-163 / duckpgq_utils.hpp:11
// VISIT_SIZE_DIVISOR=2):
//   ARRAY        — frontier vertex list known and small: iterate the list,
//                  collect the next list (sparse top-down);
//   INTERMEDIATE — dense scan, but collect the next list (frontier shrank
//                  back under the limit);
//   NO_ARRAY     — dense scan, no list bookkeeping (frontier above V/2).
void msbfs_batch(int64_t vcount, const int64_t* offsets, const int64_t* adj,
                 const int64_t* qs, const int64_t* qd, int64_t* out,
                 const int64_t* pending, size_t start, size_t L,
                 std::vector<uint64_t>& visit, std::vector<uint64_t>& next,
                 std::vector<uint64_t>& seen) {
  const size_t row_words = kLaneWords;
  const int64_t visit_limit = vcount / 2;  // VISIT_SIZE_DIVISOR = 2
  {
    std::fill(visit.begin(), visit.end(), 0);
    std::fill(next.begin(), next.end(), 0);
    std::fill(seen.begin(), seen.end(), 0);
    std::vector<int64_t> flist, nlist;
    std::vector<uint8_t> touched(vcount, 0);
    flist.reserve(L);
    for (size_t l = 0; l < L; ++l) {
      int64_t q = pending[start + l];
      uint64_t* row = &visit[qs[q] * row_words];
      if (!row_any(row)) flist.push_back(qs[q]);
      row[l / 64] |= 1ULL << (l % 64);
    }
    bool list_valid = true;                // flist holds the frontier
    uint64_t active[kLaneWords];
    std::memset(active, 0, sizeof(active));
    for (size_t l = 0; l < L; ++l) active[l / 64] |= 1ULL << (l % 64);

    for (int64_t it = 1; it <= vcount + 1; ++it) {
      bool use_array = list_valid &&
                       static_cast<int64_t>(flist.size()) < visit_limit;
      // collect the next list unless the frontier is already dense
      // (NO_ARRAY: the per-edge bookkeeping costs more than it saves)
      bool collect = !list_valid ||
                     static_cast<int64_t>(flist.size()) < visit_limit;
      nlist.clear();
      auto expand = [&](int64_t v) {
        const uint64_t* row = &visit[v * row_words];
        if (!row_any(row)) return;
        for (int64_t j = offsets[v]; j < offsets[v + 1]; ++j) {
          int64_t u = adj[j];
          uint64_t* nrow = &next[u * row_words];
          if (collect && !touched[u]) {
            touched[u] = 1;
            nlist.push_back(u);
          }
          for (int w = 0; w < kLaneWords; ++w) nrow[w] |= row[w];
        }
      };
      if (use_array) {
        for (int64_t v : flist) expand(v);
      } else {
        for (int64_t v = 0; v < vcount; ++v) expand(v);
      }
      bool changed = false;
      auto settle = [&](int64_t v) {
        uint64_t* nrow = &next[v * row_words];
        uint64_t* srow = &seen[v * row_words];
        for (int w = 0; w < kLaneWords; ++w) {
          nrow[w] &= ~srow[w] & active[w];
          srow[w] |= nrow[w];
          changed |= (nrow[w] != 0);
        }
      };
      if (collect) {
        for (int64_t u : nlist) {
          settle(u);
          touched[u] = 0;
        }
      } else {
        for (int64_t v = 0; v < vcount; ++v) settle(v);
      }
      if (!changed) break;
      for (size_t l = 0; l < L; ++l) {
        if (!(active[l / 64] >> (l % 64) & 1)) continue;
        int64_t q = pending[start + l];
        if (seen[qd[q] * row_words + l / 64] >> (l % 64) & 1) {
          out[q] = it;
          active[l / 64] &= ~(1ULL << (l % 64));
        }
      }
      std::swap(visit, next);   // next now holds the OLD frontier rows
      if (list_valid) {
        // old frontier enumerated by flist: clear just those rows
        for (int64_t u : flist) {
          std::memset(&next[u * row_words], 0,
                      sizeof(uint64_t) * row_words);
        }
      } else {
        std::fill(next.begin(), next.end(), 0);
      }
      flist.swap(nlist);
      list_valid = collect;
      bool any_active = false;
      for (int w = 0; w < kLaneWords; ++w) any_active |= (active[w] != 0);
      if (!any_active) break;
    }
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// Shortest path (BFS + parent tracking; reference shortest_path.cpp:12-41).
// Parent tie-break: lowest CSR position wins (ascending (v, slot) iteration
// sets parents first-touch). Caller protocol: run gr_msbfs_lengths first,
// size path_buf as sum(2*len[q]+1), pass per-query output offsets.
// pos_out from gr_csr_build maps CSR slot -> original edge index; paths are
// [v0, edge_id(e0), v1, ..., vk] with edge_id = eid[pos].
// ---------------------------------------------------------------------------
void gr_msbfs_paths(int64_t vcount, const int64_t* offsets, const int64_t* adj,
                    const int64_t* eid_of_slot, const int64_t* src_of_slot,
                    int64_t nq, const int64_t* qs,
                    const int64_t* qd, const int64_t* lengths,
                    const int64_t* path_offsets, int64_t* path_buf) {
  std::vector<int64_t> pending;
  pending.reserve(nq);
  for (int64_t q = 0; q < nq; ++q) {
    if (lengths[q] < 0) continue;
    if (qs[q] == qd[q]) {
      path_buf[path_offsets[q]] = qs[q];
    } else {
      pending.push_back(q);
    }
  }
  const size_t row_words = kLaneWords;
  std::vector<uint64_t> visit(vcount * row_words);
  std::vector<uint64_t> next(vcount * row_words);
  std::vector<uint64_t> seen(vcount * row_words);
  // per-lane parent CSR slot (-1 unset): [vcount][512] laid out lane-major
  // per vertex; 512 lanes keeps reference batching, caller bounds V.
  std::vector<int32_t> parent;

  for (size_t start = 0; start < pending.size(); start += 512) {
    size_t L = std::min<size_t>(512, pending.size() - start);
    std::fill(visit.begin(), visit.end(), 0);
    std::fill(next.begin(), next.end(), 0);
    std::fill(seen.begin(), seen.end(), 0);
    parent.assign(vcount * L, -1);
    for (size_t l = 0; l < L; ++l) {
      int64_t q = pending[start + l];
      visit[qs[q] * row_words + l / 64] |= 1ULL << (l % 64);
    }
    uint64_t active[kLaneWords];
    std::memset(active, 0, sizeof(active));
    for (size_t l = 0; l < L; ++l) active[l / 64] |= 1ULL << (l % 64);

    for (int64_t it = 1; it <= vcount + 1; ++it) {
      for (int64_t v = 0; v < vcount; ++v) {
        const uint64_t* row = &visit[v * row_words];
        if (!row_any(row)) continue;
        for (int64_t j = offsets[v]; j < offsets[v + 1]; ++j) {
          int64_t u = adj[j];
          uint64_t* nrow = &next[u * row_words];
          const uint64_t* srow = &seen[u * row_words];
          for (int w = 0; w < kLaneWords; ++w) {
            uint64_t fresh = row[w] & ~srow[w] & ~nrow[w] & active[w];
            if (!fresh) continue;
            nrow[w] |= fresh;
            while (fresh) {
              int b = __builtin_ctzll(fresh);
              fresh &= fresh - 1;
              size_t lane = w * 64 + b;
              if (parent[u * L + lane] < 0)
                parent[u * L + lane] = static_cast<int32_t>(j);
            }
          }
        }
      }
      bool changed = false;
      for (int64_t v = 0; v < vcount; ++v) {
        uint64_t* nrow = &next[v * row_words];
        uint64_t* srow = &seen[v * row_words];
        for (int w = 0; w < kLaneWords; ++w) {
          srow[w] |= nrow[w];
          changed |= (nrow[w] != 0);
        }
      }
      if (!changed) break;
      for (size_t l = 0; l < L; ++l) {
        if (!(active[l / 64] >> (l % 64) & 1)) continue;
        int64_t q = pending[start + l];
        if (seen[qd[q] * row_words + l / 64] >> (l % 64) & 1) {
          // reconstruct backwards dst -> src
          int64_t len = lengths[q];
          int64_t* outp = &path_buf[path_offsets[q]];
          int64_t cur = qd[q];
          int64_t slot = 2 * len;
          outp[slot] = cur;
          while (cur != qs[q] && slot > 0) {
            int32_t p = parent[cur * L + l];
            outp[slot - 1] = eid_of_slot[p];
            cur = src_of_slot[p];
            outp[slot - 2] = cur;
            slot -= 2;
          }
          active[l / 64] &= ~(1ULL << (l % 64));
        }
      }
      std::swap(visit, next);
      std::fill(next.begin(), next.end(), 0);
      bool any_active = false;
      for (int w = 0; w < kLaneWords; ++w) any_active |= (active[w] != 0);
      if (!any_active) break;
    }
  }
}

// ---------------------------------------------------------------------------
// Multi-source Bellman-Ford (reference cheapest_path_length.cpp): relax all
// CSR edges until fixpoint, batched over queries. Double variant; the int64
// variant mirrors it. dist buffer is caller-provided scratch of vcount*L.
// ---------------------------------------------------------------------------
void gr_bellman_ford_f64(int64_t vcount, const int64_t* offsets,
                         const int64_t* adj, const double* w, int64_t nq,
                         const int64_t* qs, const int64_t* qd, double* out,
                         uint8_t* reached) {
  const double INF = HUGE_VAL;
  constexpr int64_t kChunk = 256;
  std::vector<double> dist;
  for (int64_t start = 0; start < nq; start += kChunk) {
    int64_t L = std::min(kChunk, nq - start);
    dist.assign(vcount * L, INF);
    for (int64_t l = 0; l < L; ++l) dist[qs[start + l] * L + l] = 0.0;
    for (int64_t round = 0; round <= vcount; ++round) {
      bool changed = false;
      for (int64_t v = 0; v < vcount; ++v) {
        const double* dv = &dist[v * L];
        for (int64_t j = offsets[v]; j < offsets[v + 1]; ++j) {
          double* du = &dist[adj[j] * L];
          double wj = w[j];
          for (int64_t l = 0; l < L; ++l) {
            if (dv[l] != INF && dv[l] + wj < du[l]) {
              du[l] = dv[l] + wj;
              changed = true;
            }
          }
        }
      }
      if (!changed) break;
    }
    for (int64_t l = 0; l < L; ++l) {
      double d = dist[qd[start + l] * L + l];
      reached[start + l] = (d != INF);
      out[start + l] = (d != INF) ? d : 0.0;
    }
  }
}

void gr_bellman_ford_i64(int64_t vcount, const int64_t* offsets,
                         const int64_t* adj, const int64_t* w, int64_t nq,
                         const int64_t* qs, const int64_t* qd, int64_t* out,
                         uint8_t* reached) {
  const int64_t INF = INT64_MAX / 2;
  constexpr int64_t kChunk = 256;
  std::vector<int64_t> dist;
  for (int64_t start = 0; start < nq; start += kChunk) {
    int64_t L = std::min(kChunk, nq - start);
    dist.assign(vcount * L, INF);
    for (int64_t l = 0; l < L; ++l) dist[qs[start + l] * L + l] = 0;
    for (int64_t round = 0; round <= vcount; ++round) {
      bool changed = false;
      for (int64_t v = 0; v < vcount; ++v) {
        const int64_t* dv = &dist[v * L];
        for (int64_t j = offsets[v]; j < offsets[v + 1]; ++j) {
          int64_t* du = &dist[adj[j] * L];
          int64_t wj = w[j];
          for (int64_t l = 0; l < L; ++l) {
            if (dv[l] < INF && dv[l] + wj < du[l]) {
              du[l] = dv[l] + wj;
              changed = true;
            }
          }
        }
      }
      if (!changed) break;
    }
    for (int64_t l = 0; l < L; ++l) {
      int64_t d = dist[qd[start + l] * L + l];
      reached[start + l] = (d < INF);
      out[start + l] = (d < INF) ? d : 0;
    }
  }
}

// ---------------------------------------------------------------------------
// PageRank over N = vsize = V+2 entries (reference pagerank.cpp:31-78 — the
// padded array leaks into the denominator; phantom vertices are dangling).
// ---------------------------------------------------------------------------
void gr_pagerank(int64_t vcount, int64_t n, const int64_t* offsets,
                 const int64_t* adj, double damping, double threshold,
                 double* rank) {
  std::vector<double> temp(n);
  for (int64_t i = 0; i < n; ++i) rank[i] = 1.0 / n;
  while (true) {
    std::fill(temp.begin(), temp.end(), 0.0);
    double dangling = 0.0;
    for (int64_t v = 0; v < n; ++v) {
      int64_t deg = (v < vcount) ? offsets[v + 1] - offsets[v] : 0;
      if (deg == 0) {
        dangling += rank[v];
        continue;
      }
      double contrib = rank[v] / deg;
      for (int64_t j = offsets[v]; j < offsets[v + 1]; ++j)
        temp[adj[j]] += contrib;
    }
    double correction = dangling / n;
    double max_delta = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      double nv = (1.0 - damping) / n + damping * (temp[i] + correction);
      max_delta = std::max(max_delta, std::fabs(nv - rank[i]));
      rank[i] = nv;
    }
    if (max_delta < threshold) return;
  }
}

// ---------------------------------------------------------------------------
// WCC: the reference's exact union-find linking order (forest[rootA]=rootB
// per CSR edge in order; weakly_connected_component.cpp:14-34,66-91).
// out: [n] component root per vertex, n = vsize-1.
// ---------------------------------------------------------------------------
void gr_wcc(int64_t vcount, int64_t n, const int64_t* offsets,
            const int64_t* adj, int64_t* out) {
  std::vector<int64_t> forest(n);
  for (int64_t i = 0; i < n; ++i) forest[i] = i;
  auto find = [&](int64_t node) {
    while (true) {
      int64_t parent = forest[node];
      if (parent == node) return node;
      forest[node] = forest[parent];
      node = parent;
    }
  };
  int64_t vmax = std::min(vcount, n);
  for (int64_t i = 0; i < vmax; ++i) {
    for (int64_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      int64_t ra = find(i);
      int64_t rb = find(adj[j]);
      if (ra != rb) forest[ra] = rb;
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = find(i);
}

// ---------------------------------------------------------------------------
// Local clustering coefficient over a deduplicated symmetric CSR
// (reference local_clustering_coefficient.cpp:11-72). out: float [vcount].
// ---------------------------------------------------------------------------
void gr_lcc(int64_t vcount, const int64_t* offsets, const int64_t* adj,
            float* out) {
  std::vector<uint8_t> mark(vcount + 2, 0);
  for (int64_t u = 0; u < vcount; ++u) {
    int64_t d = offsets[u + 1] - offsets[u];
    if (d < 2) {
      out[u] = 0.0f;
      continue;
    }
    for (int64_t j = offsets[u]; j < offsets[u + 1]; ++j) mark[adj[j]] = 1;
    int64_t count = 0;
    for (int64_t j = offsets[u]; j < offsets[u + 1]; ++j) {
      int64_t x = adj[j];
      for (int64_t k = offsets[x]; k < offsets[x + 1]; ++k)
        count += mark[adj[k]];
    }
    for (int64_t j = offsets[u]; j < offsets[u + 1]; ++j) mark[adj[j]] = 0;
    out[u] = static_cast<float>(count) /
             (static_cast<float>(d) * static_cast<float>(d - 1));
  }
}

// ---------------------------------------------------------------------------
// Reachability with source-dedup (reference reachability.cpp lane_map):
// same as lengths but only reachability is reported.
// ---------------------------------------------------------------------------
void gr_msbfs_reachability(int64_t vcount, const int64_t* offsets,
                           const int64_t* adj, int64_t nq, const int64_t* qs,
                           const int64_t* qd, uint8_t* out) {
  std::vector<int64_t> lengths(nq);
  gr_msbfs_lengths(vcount, offsets, adj, nq, qs, qd, lengths.data());
  for (int64_t q = 0; q < nq; ++q) out[q] = (lengths[q] >= 0);
}

// ---------------------------------------------------------------------------
// Relational equi-join over dense int64 key ranges (the MATCH-binding hot
// path: SURVEY.md §3.3 — the reference delegates these joins to DuckDB's
// hash join; here a direct lookup table over [lo, lo+span) replaces the
// sort+searchsorted pair construction the Python executor otherwise does).
// Bucket layout mirrors a counting sort: offsets[span+1] + order[rn_valid],
// so duplicate build keys list their rows in build order (stable).
// ---------------------------------------------------------------------------

void gr_lut_bucket_build(const int64_t* rcode, int64_t rn,
                         const uint8_t* rvalid, int64_t lo, int64_t span,
                         int64_t* offsets, int64_t* order) {
  std::memset(offsets, 0, sizeof(int64_t) * (span + 1));
  for (int64_t r = 0; r < rn; ++r) {
    if (rvalid && !rvalid[r]) continue;
    offsets[rcode[r] - lo + 1]++;
  }
  for (int64_t k = 0; k < span; ++k) offsets[k + 1] += offsets[k];
  std::vector<int64_t> cursor(offsets, offsets + span);
  for (int64_t r = 0; r < rn; ++r) {
    if (rvalid && !rvalid[r]) continue;
    order[cursor[rcode[r] - lo]++] = r;
  }
}

int64_t gr_lut_join_total(const int64_t* lcode, int64_t ln,
                          const uint8_t* lvalid, const int64_t* offsets,
                          int64_t lo, int64_t span) {
  std::vector<int64_t> partial;
  int64_t total = 0;
  // two-level: parallel partial sums over fixed chunks
  int64_t chunk = 1 << 20;
  int64_t n_chunks = (ln + chunk - 1) / chunk;
  partial.assign(std::max<int64_t>(n_chunks, 1), 0);
  parallel_chunks(n_chunks, 1, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      int64_t b = c * chunk, e = std::min(ln, b + chunk), t = 0;
      for (int64_t l = b; l < e; ++l) {
        if (lvalid && !lvalid[l]) continue;
        int64_t k = lcode[l] - lo;
        if (k < 0 || k >= span) continue;
        t += offsets[k + 1] - offsets[k];
      }
      partial[c] = t;
    }
  });
  for (int64_t c = 0; c < n_chunks; ++c) total += partial[c];
  return total;
}

void gr_lut_join_fill(const int64_t* lcode, int64_t ln, const uint8_t* lvalid,
                      const int64_t* offsets, const int64_t* order,
                      int64_t lo, int64_t span, int64_t* li, int64_t* ri) {
  // deterministic parallel fill: per-chunk output counts, exclusive prefix,
  // then each chunk writes its own range (probe order preserved)
  int64_t chunk = 1 << 20;
  int64_t n_chunks = (ln + chunk - 1) / chunk;
  std::vector<int64_t> starts(n_chunks + 1, 0);
  parallel_chunks(n_chunks, 1, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      int64_t b = c * chunk, e = std::min(ln, b + chunk), t = 0;
      for (int64_t l = b; l < e; ++l) {
        if (lvalid && !lvalid[l]) continue;
        int64_t k = lcode[l] - lo;
        if (k < 0 || k >= span) continue;
        t += offsets[k + 1] - offsets[k];
      }
      starts[c + 1] = t;
    }
  });
  for (int64_t c = 0; c < n_chunks; ++c) starts[c + 1] += starts[c];
  parallel_chunks(n_chunks, 1, [&](int64_t cb, int64_t ce) {
    for (int64_t c = cb; c < ce; ++c) {
      int64_t b = c * chunk, e = std::min(ln, b + chunk);
      int64_t n = starts[c];
      for (int64_t l = b; l < e; ++l) {
        if (lvalid && !lvalid[l]) continue;
        int64_t k = lcode[l] - lo;
        if (k < 0 || k >= span) continue;
        for (int64_t p = offsets[k]; p < offsets[k + 1]; ++p) {
          li[n] = l;
          ri[n] = order[p];
          ++n;
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// Parallel gather (late-materialization hot path: LazyVector/SelChain
// resolve + materialize do out[i] = base[idx[i]] over up-to-~100M rows —
// memory-bandwidth bound, so threads scale it near-linearly).
// elem: element size in bytes (8 for int64/float64, 4, 2, 1 for bool/u8).
// ---------------------------------------------------------------------------
void gr_gather_bytes(const char* base, int64_t elem, const int64_t* idx,
                     int64_t n, char* out) {
  parallel_chunks(n, 1 << 18, [&](int64_t b, int64_t e) {
    switch (elem) {
      case 8: {
        const int64_t* s = reinterpret_cast<const int64_t*>(base);
        int64_t* d = reinterpret_cast<int64_t*>(out);
        for (int64_t i = b; i < e; ++i) d[i] = s[idx[i]];
        break;
      }
      case 4: {
        const int32_t* s = reinterpret_cast<const int32_t*>(base);
        int32_t* d = reinterpret_cast<int32_t*>(out);
        for (int64_t i = b; i < e; ++i) d[i] = s[idx[i]];
        break;
      }
      case 2: {
        const int16_t* s = reinterpret_cast<const int16_t*>(base);
        int16_t* d = reinterpret_cast<int16_t*>(out);
        for (int64_t i = b; i < e; ++i) d[i] = s[idx[i]];
        break;
      }
      case 1: {
        for (int64_t i = b; i < e; ++i) out[i] = base[idx[i]];
        break;
      }
      default: {
        for (int64_t i = b; i < e; ++i)
          std::memcpy(out + i * elem, base + idx[i] * elem, elem);
      }
    }
  });
}

int64_t gr_version() { return 3; }

}  // extern "C"
